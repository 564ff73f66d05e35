package graft.streaming

import org.apache.spark.sql.SparkSession
import graft.text.DedupIndex

/** [[CompactionScheduler]] wired onto a VERSIONED
  * [[graft.text.DedupIndex]] root — the index-side sibling of
  * [[CompactionDriver]] (which compacts the streamed-in SINK; this
  * compacts the signature INDEX the ingest loop probes). The ingest
  * loop ([[DocStream.ingestBatchVersioned]]) calls [[maybeCompact]]
  * once per epoch; the driver probes the live version's row count
  * (sigs/ only — the compact ≤k-longs-per-doc table, never the text),
  * asks the scheduler whether the adaptive period has elapsed at that
  * size, and if so runs [[DedupIndex.compactCurrent]] + a retention
  * sweep, recording the measured wall back into the scheduler — the
  * same W/P feedback loop as the sink driver.
  *
  * What compaction buys HERE: crashed epochs whose index append
  * committed but whose marker write was lost leave duplicate rows that
  * every later probe re-scans (DedupIndex.compact scaladoc); the
  * scheduler turns that from an unbounded tax into a bounded one. With
  * zero crashes the compaction is a no-op rewrite, which is why the
  * cadence is utilization-bounded rather than per-epoch.
  *
  * One compaction at a time per driver (`maybeCompact` synchronized);
  * `nanoTime` injectable for deterministic cadence under test — both
  * contracts inherited from [[CompactionDriver]]. */
final class DedupIndexMaintenance(
    spark: SparkSession,
    indexRoot: String,
    val scheduler: CompactionScheduler = new CompactionScheduler(),
    nanoTime: () => Long = () => System.nanoTime(),
    keepVersions: Int = 2) {

  /** (indexedDocs, wallSec, nextPeriodSec) per completed compaction. */
  @volatile private var done = Vector.empty[(Long, Double, Double)]
  private var lastCompactNanos = nanoTime()

  def compactions: Seq[(Long, Double, Double)] = done

  /** Compact now iff the scheduler's adaptive period has elapsed for
    * the live version's current size. Returns the new version dir when
    * a compaction ran. A rootless/unpublished index is a no-op (first
    * epoch hasn't initialized it yet). */
  def maybeCompact(): Option[String] = synchronized {
    DedupIndex.resolveCurrent(spark, indexRoot).flatMap { live =>
      val sigsPath = s"$indexRoot/$live/sigs"
      val fs = new org.apache.hadoop.fs.Path(sigsPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(new org.apache.hadoop.fs.Path(sigsPath))) None
      else {
        val rows = spark.read.parquet(sigsPath).count()
        val elapsed = (nanoTime() - lastCompactNanos) / 1e9
        if (rows > 0L && scheduler.shouldCompact(elapsed, rows))
          Some(compactNow(rows))
        else None
      }
    }
  }

  private def compactNow(rows: Long): String = {
    val t0 = nanoTime()
    val (next, _) = DedupIndex.compactCurrent(spark, indexRoot)
    DedupIndex.sweepVersions(spark, indexRoot, keepVersions)
    val wall = (nanoTime() - t0) / 1e9
    scheduler.record(rows, wall)
    done = done :+ ((rows, wall, scheduler.nextPeriodSec(rows)))
    lastCompactNanos = nanoTime()
    next
  }
}
