package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star surface): image/audio/video
  * as opaque `binary` columns with typed metadata.
  *
  * Decode is dispatched on the declared mime type ([[MediaDecode]]):
  * binary PPM images and PCM WAV audio are REALLY parsed
  * (dependency-free header + sample decoding, exact integer moments);
  * anything else — including corrupt blobs of a declared format —
  * falls back to the deterministic [[DecodeStub]] so a bad blob
  * degrades instead of failing the stage. Everything around the
  * decoders — schema, batched partition processing, size-aware
  * repartitioning, frame-sample explode — is ordinary Spark plumbing.
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
    * heavy-tailed, so hash-by-id balances row COUNTS but not bytes —
    * one partition catching two 4 GB videos stalls the decode stage.
    *
    * Exact byte slicing: rows are laid on a deterministic global byte
    * axis — (hash-bucket, media_id) order, cumulative `length(media)`
    * offsets from the two-level bucketed stitch (per-bucket running
    * sums + broadcast bucket offsets; hash buckets are uniform, so no
    * window skew) — and the axis is cut into `targetPartitions` equal
    * byte slices. Each slice holds `totalBytes/target ± maxRowBytes`
    * (a row belongs wholly to the slice its start offset falls in).
    *
    * The physical placement is an identity partitioner over the slice
    * id via one RDD hop: this is the one operator here Catalyst cannot
    * express — both hash and range exchanges balance row counts, and a
    * byte-WEIGHTED exchange needs a custom Partitioner (SURVEY §4.2
    * rule (d): mapPartitions/RDD only where the declarative API
    * genuinely cannot). The hop costs one row (de)serialization pass,
    * noise next to the decode stage it protects. */
  def repartitionBySize(
      df: DataFrame, targetPartitions: Int, numBuckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL blobs cost 0 bytes (they land in whatever slice their offset
    // falls in) — without the coalesce a partially-null media column
    // yields NULL _slot and the RDD hop's getInt throws
    val sized = df.withColumn("_bytes",
      coalesce(length(col("media")).cast("long"), lit(0L)))
    val totalRow = sized.agg(sum(col("_bytes"))).head()
    if (totalRow.isNullAt(0)) return df.repartition(targetPartitions)
    val slice = math.max(1L, totalRow.getLong(0) / targetPartitions + 1L)
    val bucketed = sized.withColumn("_sb",
      pmod(xxhash64(col("media_id")), lit(numBuckets)).cast("int"))
    val wB = Window.partitionBy(col("_sb")).orderBy(col("media_id"))
    val local = bucketed.withColumn("_cum",
      sum(col("_bytes")).over(wB.rowsBetween(Window.unboundedPreceding, 0)))
    // ≤ numBuckets summary rows: bucket byte-offsets via the bounded
    // self-join (Stitch) — no unpartitioned window
    val offs = graft.ops.Stitch.cumulativeBefore(
        local.groupBy(col("_sb")).agg(sum(col("_bytes")).as("_bb")),
        "_sb", "_bb", "_off")
      .select(col("_sb"), col("_off"))
    val slotted = local.join(broadcast(offs), Seq("_sb"))
      .withColumn("_slot", least(
        floor((col("_off") + col("_cum") - col("_bytes")) / slice),
        lit(targetPartitions - 1)).cast("int"))
      .select((col("_slot") +: df.columns.map(col)).toIndexedSeq: _*)
    val spark = df.sparkSession
    val rdd = slotted.rdd
      .map(r => (r.getInt(0), org.apache.spark.sql.Row.fromSeq(r.toSeq.tail)))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = targetPartitions
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    spark.createDataFrame(rdd, df.schema)
  }

  /** Batched decode: mapPartitions over typed rows — the Scala
    * analogue of mapInPandas batch processing. Dispatches on mime_type
    * ([[MediaDecode.features]]): PPM/WAV payloads are really parsed;
    * opaque octet-streams (and unparseable blobs) take the
    * deterministic stub path. */
  def decodeFeatures(spark: SparkSession, df: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        // null blob ≡ empty blob: same contract as repartitionBySize's
        // 0-byte accounting — the row flows through with the stub's
        // n==0 zero features instead of NPEing the decode stage
        val bytes = if (r.media == null) Array.emptyByteArray else r.media
        val feats = MediaDecode.features(bytes, r.mime_type, dim)
        MediaFeatures(r.media_id, bytes.length.toLong,
          DecodeStub.contentHash(bytes), feats)
      }
    }
  }

  final case class ImageRow(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      r_sum: Long,
      g_sum: Long,
      b_sum: Long)

  /** Typed raster decode: REALLY parses each blob's PPM header +
    * pixel area ([[MediaDecode.decodePpm]] — the parser knows nothing
    * about how the blob was built) and emits exact per-channel byte
    * sums. Unparseable blobs are dropped (flatMap) — the strict form
    * for pipelines that route corrupt media to a dead-letter side. */
  def decodeImages(spark: SparkSession, df: DataFrame): Dataset[ImageRow] = {
    import spark.implicits._
    df.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        MediaDecode.decodePpm(r.media).map(img =>
          ImageRow(r.media_id, "ppm", img.width, img.height,
            img.rSum, img.gSum, img.bSum))
      }
    }
  }

  /** Test-harness ingest: pack a payload column into a REAL binary PPM
    * (P6) blob — fixed width 16, height ⌈bytes/48⌉, payload bytes as
    * the raster row-major with zero padding. Real pipelines read actual
    * image bytes from storage; this gives the decoder genuine headers
    * to parse from the text-only testdata. The construction is exactly
    * replayable in SQL (hex + rpad), which is what lets
    * q_multimodal_real oracle the REAL parse. */
  def packPpm(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val nb = length(col(payloadCol).cast("binary")).cast("long")
    val h = greatest(floor((nb + lit(47L)) / lit(48.0)).cast("long"), lit(1L))
    val hexPix = rpad(hex(col(payloadCol).cast("binary")), (h * lit(96L)).cast("int"), lit("00"))
    df.select(
      col(idCol).cast("long").as("media_id"),
      concat(
        lit("P6\n16 ").cast("binary"),
        h.cast("string").cast("binary"),
        lit("\n255\n").cast("binary"),
        unhex(hexPix)).as("media"),
      lit("image/x-portable-pixmap").as("mime_type"),
      lit(16).as("meta_width"),
      h.cast("int").as("meta_height"))
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
