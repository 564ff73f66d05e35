package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for 100 TB-scale shuffles: salting for hot
  * keys and bucketed writes for co-located (shuffle-free) joins.
  * These complement AQE's runtime skew-join splitting: AQE fixes
  * skewed JOIN partitions; salting fixes skewed AGGREGATION keys,
  * which AQE does not rebalance.
  */
object Skew {

  /** Two-stage salted aggregation: groupBy(keys..., salt) partials,
    * then groupBy(keys) to merge. Decomposable aggregates only —
    * the caller supplies both the partial aggs and the merge aggs
    * (e.g. partial `sum(v) as s` + merge `sum(s)`, or count→sum).
    *
    * A hot key that would pin one reducer is spread over `saltBuckets`
    * partitions in stage one; stage two merges `saltBuckets` rows per
    * key — negligible. */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int)(
      partialAggs: Seq[Column],
      mergeAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted count: the common case, packaged. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 64): DataFrame =
    saltedAgg(df, keys, saltBuckets)(
      Seq(count(lit(1)).as("_pc")),
      Seq(sum(col("_pc")).as("n")))

  /** Replicated-broadcast skew join: for a join where a FEW keys of the
    * big side are hot and the small side fits memory per key-subset,
    * salt the big side and explode the small side across all salt
    * values, then equi-join on (key, salt). Classic salting pattern —
    * spreads each hot key over `saltBuckets` tasks. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val smallExploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigSalted.join(smallExploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Bucketed write: persists a table pre-hash-partitioned AND sorted
    * by the join/agg key so later equi-joins and groupBys on that key
    * skip the shuffle entirely (Spark reads bucket metadata from the
    * catalog). The standard co-location tool for repeatedly-joined
    * 100 TB fact tables. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
}
