package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Registry
import graft.stats.Volcano

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY §7.3): the volcano pipeline — long-form
    * observations, group annotation, per-feature two-sample t-test with
    * log2 ratio and SAM s0 significance classification — expressed on
    * the sf0.001 lineitem table (features = part keys, groups =
    * return-flag, values = log2 price). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val long = Tables.lineitem(spark, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(
        col("l_partkey").as("id"),
        col("l_returnflag").as("group"),
        log2(col("l_extendedprice")).as("value"))
    Volcano.twoSample(long, Seq("id"), "group", "value",
      control = "A", comparison = "R", minValidN = 2,
      s0 = 0.1, minRatio = 0.1, minP = 0.5)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
