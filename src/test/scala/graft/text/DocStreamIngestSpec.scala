package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.TrainingData
import graft.streaming.DocStream

/** The incremental-ingest loop: DedupIndex-backed streaming near-dup
  * dedup with an unbounded horizon (DocStream.ingestBatch /
  * ingestWithNearDupIndex). */
class DocStreamIngestSpec extends SparkSpec {
  import spark.implicits._

  // long unique-token texts: the near-dup differs in ONE word of 40,
  // so 3 of 41 union shingles change -> jaccard ~0.85 and the 32-slot
  // estimate clears 0.5 with no realistic sampling risk (a repeated-
  // phrase fixture sat at J~0.65, within noise of the threshold)
  private val tA = (0 until 40).map(i => s"alpha$i").mkString(" ")
  private val tAdup = tA.replace("alpha39", "changed")
  private val tB = (0 until 40).map(i => s"beta$i").mkString(" ")
  private val tC = (0 until 40).map(i => s"gamma$i").mkString(" ")

  private val cfg = TrainingData.CurationConfig(
    minQuality = 0.0, langs = Set("en", "und"), minTokens = 3,
    nearDupJaccard = 0.5)

  private def dirs() = {
    val root = Files.createTempDirectory("ingest").toString
    (s"$root/idx", s"$root/sink", s"$root/ckpt")
  }

  test("cross-epoch near-dups are dropped beyond any watermark horizon") {
    val (idx, sink, _) = dirs()
    val b0 = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    val b1 = Seq((11L, tAdup), (12L, tC)).toDF("doc_id", "text") // 11 near-dups epoch-0's 1
    assert(DocStream.ingestBatch(b0, 0L, "doc_id", "text", idx, sink, cfg, 0.5) == 2L)
    assert(DocStream.ingestBatch(b1, 1L, "doc_id", "text", idx, sink, cfg, 0.5) == 1L)
    val kept = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 12L), kept.toString)
  }

  test("a replayed epoch is a no-op (marker commit)") {
    val (idx, sink, _) = dirs()
    val b0 = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    assert(DocStream.ingestBatch(b0, 0L, "doc_id", "text", idx, sink, cfg, 0.5) == 2L)
    assert(DocStream.ingestBatch(b0, 0L, "doc_id", "text", idx, sink, cfg, 0.5) == -1L)
    assert(spark.read.parquet(sink).count() == 2L)
  }

  test("replay after a committed append but lost marker emits the same survivors") {
    // simulate the crash window: epoch ran fully, then the marker is
    // deleted — the replay re-probes an index that already contains
    // the batch, and the self-match exclusion must keep output stable
    val (idx, sink, _) = dirs()
    val b0 = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    DocStream.ingestBatch(b0, 0L, "doc_id", "text", idx, sink, cfg, 0.5)
    new java.io.File(idx, "_last_batch").delete()
    assert(DocStream.ingestBatch(b0, 0L, "doc_id", "text", idx, sink, cfg, 0.5) == 2L)
    // per-epoch dir overwrite: no duplicates in the sink
    assert(spark.read.parquet(sink).count() == 2L)
    assert(spark.read.parquet(sink).select("doc_id").distinct().count() == 2L)
  }

  test("a torn epoch marker reads as 'replay', not a poisoned stream") {
    // the marker write is tmp+rename (atomic), but an index produced
    // by an OLDER build — or a manually truncated file — can still
    // present an empty/garbage marker; every later epoch must treat it
    // as -1 (replay, idempotent) instead of dying on toLong forever
    val (idx, sink, _) = dirs()
    val b0 = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    assert(DocStream.ingestBatch(b0, 0L, "doc_id", "text", idx, sink, cfg, 0.5) == 2L)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idx, "_last_batch"), Array.emptyByteArray)
    // replay of epoch 0 under the torn marker: same survivors, and the
    // marker is re-committed so the NEXT replay is a -1 no-op again
    assert(DocStream.ingestBatch(b0, 0L, "doc_id", "text", idx, sink, cfg, 0.5) == 2L)
    assert(DocStream.ingestBatch(b0, 0L, "doc_id", "text", idx, sink, cfg, 0.5) == -1L)
    assert(spark.read.parquet(sink).select("doc_id").distinct().count() == 2L)
  }

  test("versioned ingest: maintenance driver compacts on schedule, dedup and replay survive the swap") {
    val (root, sink, _) = dirs()
    var now = 0L
    // each read advances 1 ms so a compaction's measured wall is > 0
    // (a zero wall is ignored by scheduler.record and would pin the
    // scheduler in bootstrap-compact-always mode)
    val clock = () => { now += 1000000L; now }
    val maint = new graft.streaming.DedupIndexMaintenance(
      spark, root,
      scheduler = new graft.streaming.CompactionScheduler(
        targetUtilization = 0.5, minPeriodSec = 1000.0),
      nanoTime = clock)
    val b0 = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    // epoch 0 initializes v1; bootstrap (no history) compacts at once
    assert(DocStream.ingestBatchVersioned(
      b0, 0L, "doc_id", "text", root, sink, cfg, 0.5, Some(maint)) == 2L)
    assert(maint.compactions.size == 1)
    assert(graft.text.DedupIndex.resolveCurrent(spark, root).contains("v2"))
    // epoch 1 under the COMPACTED version: cross-epoch near-dup still
    // dropped (the swap kept the corpus signatures)
    val b1 = Seq((11L, tAdup), (12L, tC)).toDF("doc_id", "text")
    now += 1L * 1000 * 1000 * 1000 // 1 s << minPeriodSec: no compaction
    assert(DocStream.ingestBatchVersioned(
      b1, 1L, "doc_id", "text", root, sink, cfg, 0.5, Some(maint)) == 1L)
    assert(maint.compactions.size == 1)
    // replay of epoch 1 is a marker no-op — the marker lives at the
    // ROOT and survived the version swap
    assert(DocStream.ingestBatchVersioned(
      b1, 1L, "doc_id", "text", root, sink, cfg, 0.5, Some(maint)) == -1L)
    // crash-window replay: marker lost AFTER the index append — the
    // replayed epoch self-matches in the LIVE version and re-emits the
    // same survivors; then force the period to elapse and compact the
    // replay-duplicated rows away
    new java.io.File(root, "_last_batch").delete()
    assert(DocStream.ingestBatchVersioned(
      b1, 1L, "doc_id", "text", root, sink, cfg, 0.5, Some(maint)) == 1L)
    val live0 = graft.text.DedupIndex.resolveCurrent(spark, root).get
    val dupRows = spark.read.parquet(s"$root/$live0/sigs").count()
    assert(dupRows == 4L) // 1,2,12 + 12's replay duplicate
    now += 1000L * 1000 * 1000 * 1000 // >> any predicted period
    assert(maint.maybeCompact().isDefined)
    val live1 = graft.text.DedupIndex.resolveCurrent(spark, root).get
    assert(spark.read.parquet(s"$root/$live1/sigs").count() == 3L)
    // retention: keep=2 leaves at most the two highest versions
    val dirsLeft = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirsLeft.size <= 2, dirsLeft.toString)
    // sink is the full survivor set
    val kept = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 12L), kept.toString)
  }

  test("the streaming wrapper drives the same loop end-to-end") {
    val (idx, sink, ckpt) = dirs()
    val srcDir = Files.createTempDirectory("ingest_src").toString
    Seq((1L, tA), (2L, tB), (21L, tAdup)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val q = DocStream.ingestWithNearDupIndex(
      stream, "doc_id", "text", idx, sink, ckpt, cfg, threshold = 0.5)
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // 21 near-dups 1 WITHIN the first micro-batch -> within-batch
    // near-dup stage (curateFull) keeps the lowest id
    assert(kept == Set(1L, 2L), kept.toString)
    // the index holds exactly the survivors
    val indexed = spark.read.parquet(s"$idx/sigs").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L))
  }
}
