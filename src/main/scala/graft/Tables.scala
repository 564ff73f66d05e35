package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Columns are pruned at call sites via `select` so Catalyst pushes
  * projection into the parquet scan (`ReadSchema`); filters written
  * against these frames push down as `PushedFilters`.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events` with `ts` normalized to nanos-since-epoch long. The
    * driver's testdata has shipped two physical types for `ts`:
    * TIMESTAMP(NANOS) (read as long via nanosAsLong=true) and plain µs
    * TIMESTAMP/TIMESTAMP_NTZ (current). Downstream queries keep one
    * contract — ts is a nanos long — and the conversion here is a
    * row-local projection over the scan (column pruning and filter
    * pushdown on the other columns are unaffected). NTZ wall-clock is
    * interpreted in the session timezone (UTC everywhere in this repo),
    * matching DuckDB's epoch_ns/epoch_us of the same naive timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.withColumn("ts", tsToNanos(col("ts"), df.schema("ts").dataType))
  }

  /** nanos-since-epoch long from whichever type `ts` was read as. */
  def tsToNanos(ts: Column, dt: DataType): Column = dt match {
    case LongType => ts
    case TimestampType | TimestampNTZType => unix_micros(ts.cast(TimestampType)) * 1000L
    case other => throw new IllegalArgumentException(s"unsupported events.ts type: $other")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
