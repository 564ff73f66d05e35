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

  // stubbed decode → feature vectors, ORACLED: the stub is a pure
  // function of the payload bytes (integer byte-sums per slot; a
  // Java Arrays.hashCode fold), and DuckDB reaches the same bytes via
  // hex(encode(text)) pairs — features replay through unordered
  // integer SUMs, the content hash through a list_reduce of the
  // 31-polynomial mod 2^32. The driver's checker sorts every output
  // column, so the feature vector is emitted as fixed-width SCALAR
  // columns f0..f7 (rounded 9dp) — an array column is
  // unhashable/unsortable on the pandas side.
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
    Some {
      val sums = (0 until 8)
        .map(j => s"SUM(CASE WHEN (i - 1) % 8 = $j THEN ub END) AS s$j")
        .mkString(", ")
      val fCols = (0 until 8).map(j =>
        s"CASE WHEN COALESCE(t.nb, 0) = 0 THEN 0.0 ELSE ROUND(CAST(COALESCE(t.s$j, 0) AS DOUBLE) / 255.0 / t.nb * 8, 9) END AS f$j")
        .mkString(",\n        ")
      s"""
      WITH b AS (SELECT doc_id, encode(text) AS blob FROM documents),
      hx AS (SELECT doc_id, hex(blob) AS hs, octet_length(blob) AS nb FROM b),
      pos AS (SELECT doc_id, nb, hs, UNNEST(generate_series(1, nb)) AS i FROM hx),
      byt AS (SELECT doc_id, nb, i,
          CAST(CONCAT('0x', SUBSTR(hs, 2 * i - 1, 2)) AS BIGINT) AS ub FROM pos),
      fs AS (SELECT doc_id, ANY_VALUE(nb) AS nb, $sums FROM byt GROUP BY doc_id),
      ch AS (SELECT doc_id,
          list_reduce(
            list_prepend(CAST(1 AS BIGINT),
              list_transform(generate_series(1, octet_length(blob)),
                i -> CAST(CONCAT('0x', SUBSTR(hex(blob), 2 * i - 1, 2)) AS BIGINT))),
            (acc, u) -> ((acc * 31 + CASE WHEN u > 127 THEN u - 256 ELSE u END) % 4294967296 + 4294967296) % 4294967296) AS h
        FROM b)
      SELECT d.doc_id AS media_id, CAST(COALESCE(t.nb, 0) AS BIGINT) AS n_bytes,
        CAST(CASE WHEN c.h >= 2147483648 THEN c.h - 4294967296 ELSE c.h END AS BIGINT) AS content_hash,
        $fCols
      FROM documents d
      LEFT JOIN fs t ON t.doc_id = d.doc_id
      JOIN ch c ON c.doc_id = d.doc_id"""
    })

  // REAL decode: pack each doc's bytes into a genuine binary PPM (P6)
  // blob — header + raster — and run the dependency-free parser
  // (MediaDecode.decodePpm) over it. The parser reads width/height/
  // maxval from the HEADER BYTES (it knows nothing of the packing);
  // the oracle replays the packing arithmetic (fixed width 16, height
  // ⌈bytes/48⌉, channel j = byte position mod 3) over the hex image of
  // the same payload. Means are exact integer channel sums divided
  // once — portable double division.
  private val qReal = Q(
    "q_multimodal_real",
    (s, d) => {
      val packed = Multimodal.packPpm(Tables.documents(s, d), "doc_id", "text")
      val nPix = (col("width").cast("long") * col("height").cast("long"))
      Multimodal.decodeImages(s, packed).toDF()
        .select(
          col("media_id"), col("format"), col("width"), col("height"),
          nPix.as("n_pixels"),
          (col("r_sum").cast("double") / nPix.cast("double")).as("r_mean"),
          (col("g_sum").cast("double") / nPix.cast("double")).as("g_mean"),
          (col("b_sum").cast("double") / nPix.cast("double")).as("b_mean"))
    },
    Some("""
      WITH b AS (SELECT doc_id, encode(text) AS blob FROM documents),
      hx AS (SELECT doc_id, hex(blob) AS hs, octet_length(blob) AS nb FROM b),
      pos AS (SELECT doc_id, nb, hs, UNNEST(generate_series(1, nb)) AS i FROM hx),
      byt AS (SELECT doc_id, i,
          CAST(CONCAT('0x', SUBSTR(hs, 2 * i - 1, 2)) AS BIGINT) AS ub FROM pos),
      cs AS (SELECT doc_id,
          SUM(CASE WHEN (i - 1) % 3 = 0 THEN ub END) AS s0,
          SUM(CASE WHEN (i - 1) % 3 = 1 THEN ub END) AS s1,
          SUM(CASE WHEN (i - 1) % 3 = 2 THEN ub END) AS s2
        FROM byt GROUP BY doc_id),
      dims AS (SELECT doc_id,
          GREATEST(CAST(FLOOR((CAST(nb AS DOUBLE) + 47.0) / 48.0) AS BIGINT), 1) AS h
        FROM hx)
      SELECT d.doc_id AS media_id, 'ppm' AS format,
        CAST(16 AS INT) AS width, CAST(dims.h AS INT) AS height,
        CAST(16 * dims.h AS BIGINT) AS n_pixels,
        CAST(COALESCE(cs.s0, 0) AS DOUBLE) / CAST(16 * dims.h AS DOUBLE) AS r_mean,
        CAST(COALESCE(cs.s1, 0) AS DOUBLE) / CAST(16 * dims.h AS DOUBLE) AS g_mean,
        CAST(COALESCE(cs.s2, 0) AS DOUBLE) / CAST(16 * dims.h AS DOUBLE) AS b_mean
      FROM documents d
      JOIN dims ON dims.doc_id = d.doc_id
      LEFT JOIN cs ON cs.doc_id = d.doc_id"""))

  def all: Seq[Q] = Seq(qMeta, qFrames, qDecode, qReal)
}
