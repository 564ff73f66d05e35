package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star surface): image/audio/video
  * as opaque `binary` columns with typed metadata.
  *
  * The decode step is STUBBED (no media libraries in this
  * environment — see the builder contract): `DecodeStub` produces
  * deterministic fake features from the bytes. Everything around it —
  * schema, batched partition processing, size-aware repartitioning,
  * frame-sample explode — is real Spark plumbing, tested in
  * MultimodalSpec.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      media: Array[Byte],
      mime_type: String,
      meta_width: Int,
      meta_height: Int)

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      content_hash: Long,
      // stub "embedding": deterministic bytes-derived features, stands
      // in for a real decoder's output vector
      features: Array[Double])

  /** Attach a binary media column from any source column (here: text
    * bytes as a stand-in payload) plus metadata columns. */
  def attachBinary(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      lit("application/octet-stream").as("mime_type"),
      lit(0).as("meta_width"),
      lit(0).as("meta_height"))

  /** Size-aware repartition before decode: media blobs are large and
    * skewed; balance partitions by cumulative payload size rather than
    * row count (at scale: repartitionByRange on a size-bucket key). */
  def repartitionBySize(df: DataFrame, targetPartitions: Int): DataFrame =
    df.withColumn("_sz_bucket",
        (xxhash64(col("media_id")) % targetPartitions).cast("int"))
      .repartition(targetPartitions, col("_sz_bucket"))
      .drop("_sz_bucket")

  /** Batched "decode": mapPartitions over typed rows — the Scala
    * analogue of mapInPandas batch processing. The real decoder would
    * go where DecodeStub.decode is called; its signature (bytes →
    * fixed-width feature vector) is the production contract. */
  def decodeFeatures(spark: SparkSession, df: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val feats = DecodeStub.decode(r.media, dim)
        MediaFeatures(r.media_id, r.media.length.toLong,
          DecodeStub.contentHash(r.media), feats)
      }
    }
  }

  /** Video-style frame sampling: one row per sampled "frame" (explode
    * of a deterministic frame index list — the real impl would slice
    * the container at keyframes). */
  def sampleFrames(df: DataFrame, everyNBytes: Int = 64): DataFrame =
    df.withColumn("n_frames",
        greatest(floor(length(col("media")) / everyNBytes).cast("int"), lit(1)))
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .withColumn("frame_offset", col("frame_idx") * everyNBytes)
      .drop("n_frames")
}

/** Deterministic fake decoder — replace with a real media library in
  * production. Pure function of the bytes: stable across runs,
  * engines, partitionings. */
object DecodeStub {
  def contentHash(bytes: Array[Byte]): Long =
    java.util.Arrays.hashCode(bytes).toLong

  /** Fake feature vector: byte-histogram moments folded to `dim`.
    * Accumulates INTEGER byte sums per slot and divides once — exact
    * in any summation order, so the result is reproducible by an
    * external engine's unordered SUM (a per-byte double accumulation
    * would drift by ulps under reordering). */
  def decode(bytes: Array[Byte], dim: Int): Array[Double] = {
    val sums = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      sums(i % dim) += (bytes(i) & 0xff)
      i += 1
    }
    val n = bytes.length
    sums.map(s => if (n == 0) 0.0 else s / 255.0 / n * dim)
  }
}
