package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.TrainingData
import graft.text.DedupIndex

/** Streaming face of the training-data curation pipeline (green-field,
  * SURVEY §2.11 — mirrors the batch `TrainingData.curate` stages that
  * lift onto a stream unchanged).
  *
  * The row-local stages — annotation expressions, quality/language/
  * token gates — are pure projections and run identically on a
  * `readStream` frame. Exact dedup becomes
  * `dropDuplicatesWithinWatermark` on the content fingerprint:
  * bounded state (the watermark horizon), unlike an unbounded
  * dropDuplicates.
  *
  * The minhash near-dup stage is deliberately NOT in the streaming
  * path: LSH banding is a self-join across the corpus, which append
  * streaming cannot express with bounded state. At scale it runs as a
  * periodic batch compaction over the streamed-in table (the standard
  * streaming-ingest + batch-dedup split; `TrainingData.curateFull` is
  * that batch job). [[CompactionDriver]] is the production trigger
  * for that job: the ingest loop calls its `maybeCompact()` hook and
  * the [[CompactionScheduler]] inside it adapts the cadence to the
  * MEASURED compaction walls.
  */
object DocStream {

  /** Gate + exact-dedup a document stream. `docs` must carry an
    * event-time column `tsCol` (TimestampType) for the watermark. */
  def curateStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      cfg: TrainingData.CurationConfig = TrainingData.CurationConfig(),
      watermark: String = "1 hour"): DataFrame =
    TrainingData.annotateKeeping(docs, textCol)
      .filter(
        col("quality") >= cfg.minQuality &&
        col("lang_pred").isin(cfg.langs.toSeq: _*) &&
        col("n_tokens") >= cfg.minTokens)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("fingerprint"))

  /** UNBOUNDED-horizon streaming near-dup dedup — the stage the
    * scaladoc above excludes from watermark streaming, made
    * incremental by the persisted [[graft.text.DedupIndex]]. Per
    * micro-batch: (1) gates + exact dedup + within-batch near-dup
    * ([[TrainingData.curateFull]] on the batch ALONE — micro-batch
    * sized, never the corpus), (2) cross-corpus probe against the
    * index (the corpus is neither rescanned as text nor reshuffled —
    * one scan of its compact signature tables), (3) survivors appended
    * to the index and written to the sink. Dedup state lives in the
    * parquet index: O(corpus) on DISK, ZERO state-store rows — where
    * `dropDuplicatesWithinWatermark` only covers the watermark horizon
    * and the [[CompactionDriver]] batch cycle re-reads the whole sink
    * per compaction.
    *
    * Replay idempotence (foreachBatch re-runs a failed epoch): the
    * `_last_batch` marker commits an epoch — a replayed id ≤ marker is
    * a no-op. A crash BETWEEN the index append and the marker leaves
    * the batch's rows in the index; the replay still emits the same
    * survivors because probe self-matches are excluded
    * ([[DedupIndex.newDocs]]) and signatures are deterministic (the
    * duplicate index rows are benign: candidate sets are distinct'd).
    * The sink write is per-epoch directory overwrite
    * (`sink/batch=<id>`), so a replayed epoch replaces rather than
    * duplicates its output. */
  def ingestWithNearDupIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      sinkPath: String,
      checkpointDir: String,
      cfg: TrainingData.CurationConfig = TrainingData.CurationConfig(),
      threshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, idCol, textCol, indexPath, sinkPath, cfg, threshold)
        ()
      }
      .start()

  /** One epoch of [[ingestWithNearDupIndex]] — factored out so specs
    * and batch backfills drive it directly. Returns the number of
    * survivors written (−1 for a skipped replay). All filesystem
    * probes go through the Hadoop FileSystem of the session conf (the
    * sink/index may be hdfs:// or s3a:// — java.io.File would silently
    * see nothing there). */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      indexPath: String,
      sinkPath: String,
      cfg: TrainingData.CurationConfig = TrainingData.CurationConfig(),
      threshold: Double = 0.8,
      markerPath: Option[String] = None): Long = {
    val spark = batch.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val idxRoot = new org.apache.hadoop.fs.Path(indexPath)
    val fs = idxRoot.getFileSystem(hconf)
    // under a VERSIONED root the marker lives at the root (markerPath),
    // not inside the version dir — epoch-commit state must survive a
    // compaction's version swap
    val marker = markerPath
      .map(p => new org.apache.hadoop.fs.Path(p, "_last_batch"))
      .getOrElse(new org.apache.hadoop.fs.Path(idxRoot, "_last_batch"))
    val last =
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val body =
          try scala.io.Source.fromInputStream(in).mkString.trim
          finally in.close()
        // a torn/empty marker (crash mid-write on a pre-atomic-rename
        // index, manual truncation) must not poison every later epoch
        // with NumberFormatException — treat it as "no epoch committed"
        // and replay, which ingestBatch is idempotent under by design
        try body.toLong catch { case _: NumberFormatException => -1L }
      } else -1L
    if (batchId <= last) return -1L

    val curated = TrainingData.curateFull(batch, idCol, textCol, cfg).kept
      .persist(graft.ops.Caches.memoLevel(spark))
    try {
      val hasIndex = fs.exists(
        new org.apache.hadoop.fs.Path(idxRoot, "bands/_SUCCESS"))
      val fresh = (if (hasIndex)
        DedupIndex.newDocs(
          spark, indexPath, curated, idCol, textCol, threshold,
          cfg.minHashes, cfg.bands, cfg.maxBucketRows)
      else curated)
        // two consumers below (index write + sink write); unpinned,
        // each would re-run the gate + LSH + probe chain
        .persist(graft.ops.Caches.memoLevel(spark))
      try {
        val n = fresh.count()
        if (hasIndex)
          DedupIndex.append(fresh, idCol, textCol, indexPath, cfg.minHashes, cfg.bands)
        else
          DedupIndex.write(fresh, idCol, textCol, indexPath, cfg.minHashes, cfg.bands)
        fresh.write.mode("overwrite").parquet(s"$sinkPath/batch=$batchId")
        writeMarker(fs, marker, batchId)
        n
      } finally { fresh.unpersist(); () }
    } finally { curated.unpersist(); () }
  }

  /** [[ingestBatch]] under [[graft.text.DedupIndex]]'s versioned-root
    * convention, with index compaction wired into the loop: resolve
    * the live version (initializing `v1`), ingest against it, then let
    * `maintenance` decide whether the adaptive period has elapsed for
    * the current index size — if so it compacts into `v<N+1>`,
    * repoints, and sweeps superseded versions. The compaction removes
    * the replay-duplicated rows that crashed epochs leave behind
    * (benign for correctness, a forever-scan-tax otherwise).
    * In-flight probes are unaffected: they hold a resolved version
    * protected by the retention window (reader-during-compact spec in
    * DedupIndexSpec). */
  def ingestBatchVersioned(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      indexRoot: String,
      sinkPath: String,
      cfg: TrainingData.CurationConfig = TrainingData.CurationConfig(),
      threshold: Double = 0.8,
      maintenance: Option[DedupIndexMaintenance] = None): Long = {
    val spark = batch.sparkSession
    val live = DedupIndex.resolveOrInit(spark, indexRoot)
    val n = ingestBatch(
      batch, batchId, idCol, textCol, s"$indexRoot/$live", sinkPath, cfg,
      threshold, markerPath = Some(indexRoot))
    maintenance.foreach(_.maybeCompact(): Unit)
    n
  }

  /** Epoch-commit marker write: tmp + rename, so a crash mid-write can
    * never leave a truncated marker in place (create+write+close is
    * not atomic on HDFS-like filesystems — the reader would otherwise
    * see a half-written body). Same tmp-rename protocol as
    * [[graft.sim.AnnIndex.publishCurrent]]; HDFS refuses rename-onto,
    * so the existing marker is deleted first — a crash in THAT window
    * leaves no marker, which reads as -1 → replay, proven idempotent
    * by DocStreamIngestSpec. */
  private def writeMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path,
      batchId: Long): Unit = {
    val tmp = marker.suffix(".tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, marker)) {
      fs.delete(marker, false)
      require(fs.rename(tmp, marker), s"could not commit epoch marker at $marker")
    }
  }
}
