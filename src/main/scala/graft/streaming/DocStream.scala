package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.TrainingData

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
}
