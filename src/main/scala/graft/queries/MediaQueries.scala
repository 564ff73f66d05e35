package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries: binary payload plumbing over the
  * documents table (text bytes stand in for media blobs; the decode
  * step is a deterministic stub — see graft.multimodal).
  */
object MediaQueries extends QueryProvider {

  // binary metadata extraction: byte length + content fingerprint
  private val qMeta = Q(
    "q_multimodal_meta",
    (s, d) => Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      .select(
        col("media_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("content_md5"),
        col("mime_type")),
    Some("""
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             md5(text) AS content_md5,
             'application/octet-stream' AS mime_type
      FROM documents"""))

  // frame sampling: deterministic explode arithmetic
  private val qFrames = Q(
    "q_frame_sample",
    (s, d) => Multimodal.sampleFrames(
        Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text"))
      .select(col("media_id"), col("frame_idx"), col("frame_offset")),
    Some("""
      WITH m AS (
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               GREATEST(CAST(FLOOR(octet_length(CAST(text AS BLOB)) / 64) AS INT), 1) AS n_frames
        FROM documents)
      SELECT media_id, CAST(unnest(generate_series(0, n_frames - 1)) AS INT) AS frame_idx,
             CAST(unnest(generate_series(0, n_frames - 1)) * 64 AS INT) AS frame_offset
      FROM m"""))

  // stubbed decode → feature vectors (rows-only: stub hash not in SQL).
  // The driver's checker sorts every output column, so the feature
  // vector is emitted as fixed-width SCALAR columns f0..f7 (rounded
  // 9dp) — an array column is unhashable/unsortable on the pandas side.
  private val qDecode = Q(
    "q_multimodal_decode",
    (s, d) => {
      val decoded = Multimodal.decodeFeatures(s,
        Multimodal.repartitionBySize(
          Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text"), 8)).toDF()
      val featCols = (0 until 8).map(i =>
        round(col("features").getItem(i), 9).as(s"f$i"))
      decoded.select(
        (Seq(col("media_id"), col("n_bytes"), col("content_hash")) ++ featCols): _*)
    },
    None)

  def all: Seq[Q] = Seq(qMeta, qFrames, qDecode)
}
