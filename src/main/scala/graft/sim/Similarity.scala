package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) —
  * north-star extension surface.
  *
  * Baseline: brute-force cosine top-k (one narrow scan + a top-k
  * aggregation — no shuffle of the embedding table beyond the final
  * k rows). Scale path: sign-LSH bucketing (random-hyperplane) that
  * prunes the scan to matching buckets before scoring.
  */
object Similarity {

  /** Sequential-order dot product of two double arrays (zip_with +
    * aggregate): left-to-right accumulation — deterministic and
    * identical to any single-node oracle that folds in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Brute-force cosine top-k against a single query vector (driver
    * constant → literal array; no join at all — the scan stays
    * narrow and whole-stage codegen'd). The query norm is folded
    * driver-side with the SAME left-to-right accumulation as the
    * Column fold, so results stay bitwise oracle-parity while saving
    * one 64-element fold per row. Deterministic tie-break on id. */
  def bruteForceTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val qNorm = math.sqrt(query.foldLeft(0.0)((acc, x) => acc + x * x))
    val v = asDouble(col(vecCol))
    embeddings
      .select(col(idCol), (dot(v, q) / (norm(v) * lit(qNorm))).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Sign-LSH bucket id: pack the signs of `numPlanes` pseudo-random
    * hyperplane projections into a long. Hyperplane h_p[i] derives from
    * xxhash64(p, i) scaled to [-0.5, 0.5] — deterministic, no stored
    * model. */
  def signLshBucket(vec: Column, dim: Int, numPlanes: Int = 12): Column = {
    val planes = (0 until numPlanes).map { p =>
      val proj = (0 until dim).map { i =>
        vec.getItem(i).cast("double") *
          ((xxhash64(lit(p), lit(i)) % 1000L).cast("double") / 1000.0)
      }.reduce(_ + _)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    planes.reduce(_ + _)
  }

  /** LSH-pruned cosine top-k: score only vectors whose bucket matches
    * the query's bucket in at least one of `numTables` independent
    * tables (union of bucket probes). Recall/probe tradeoff via
    * numPlanes/numTables. The scan prunes to matching buckets —
    * with table-partitioning by bucket this becomes partition pruning
    * at 100 TB. */
  def lshTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, dim: Int,
      numPlanes: Int = 8, numTables: Int = 4): DataFrame = {
    val qCol = array(query.map(lit): _*)
    val tables = (0 until numTables).map { t =>
      // per-table plane seed offset keeps tables independent
      val bucket = signLshTableBucket(asDouble(col(vecCol)), dim, numPlanes, t)
      val qBucketExpr = signLshTableBucket(qCol, dim, numPlanes, t)
      bucket === qBucketExpr
    }
    embeddings
      .filter(tables.reduce(_ || _))
      .select(col(idCol), cosine(asDouble(col(vecCol)), qCol).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  private def signLshTableBucket(vec: Column, dim: Int, numPlanes: Int, table: Int): Column = {
    val planes = (0 until numPlanes).map { p =>
      val proj = (0 until dim).map { i =>
        vec.getItem(i) *
          ((xxhash64(lit(table * 1000 + p), lit(i)) % 1000L).cast("double") / 1000.0)
      }.reduce(_ + _)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    planes.reduce(_ + _)
  }

  /** All-pairs near-neighbor join within LSH buckets (for near-dup
    * detection over embeddings): bucket both sides, equi-join on
    * bucket, verify with exact cosine ≥ threshold. Shuffles only
    * (bucket, id, vec) — never the cross product. */
  def cosineNearDupPairs(
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, numPlanes: Int = 10): DataFrame = {
    // Pre-normalize each vector ONCE before the join: cosine of two
    // unit vectors is just the dot product, so the per-pair work drops
    // from three array folds to one (~3× fewer flops where the time
    // actually goes — the O(pairs) verify stage).
    val v = asDouble(col(vecCol))
    val unit = embeddings
      .select(col(idCol), v.as("_v"), norm(v).as("_n"),
        signLshBucket(v, dim, numPlanes).as("_bucket"))
      .select(col(idCol), col("_bucket"),
        transform(col("_v"), x => x / col("_n")).as("_unit"))
    val l = unit.select(col("_bucket"), col(idCol).as("id_a"), col("_unit").as("_va"))
    val r = unit.select(col("_bucket"), col(idCol).as("id_b"), col("_unit").as("_vb"))
    l.join(r, Seq("_bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
