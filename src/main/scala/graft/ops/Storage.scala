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

  /** Range-clustered write for high-cardinality ordering keys
    * (timestamps) where directory partitioning is infeasible:
    * repartitionByRange + sortWithinPartitions makes every output file
    * cover a disjoint key range, so parquet row-group min/max
    * statistics let a `key BETWEEN ...` scan skip whole files. The
    * complement of `writePartitioned` (low-cardinality dirs) and
    * `Skew.writeBucketed` (join co-location). */
  def writeRangeSorted(
      df: DataFrame, path: String, rangeCol: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(rangeCol))
      .sortWithinPartitions(col(rangeCol))
      .write.mode("overwrite").parquet(path)
}
