package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout operators for the 100 TB path: partitioned writes so
  * sample/date predicates become PARTITION PRUNING (directories never
  * opened), complementing Skew.writeBucketed (shuffle-free joins).
  */
object Storage {

  /** Write partitioned by low-cardinality filter columns (sample,
    * group, date). A reader's `filter($"sample" === x)` then prunes at
    * the file-listing level — visible as PartitionFilters in explain. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Read back a partitioned dataset. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
