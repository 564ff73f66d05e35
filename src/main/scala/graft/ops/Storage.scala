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

  /** Z-order (Morton-curve) clustered write for MULTI-dimensional
    * predicate pruning — the missing case between `writePartitioned`
    * (one low-cardinality dim) and `writeRangeSorted` (one
    * high-cardinality dim): queries filter sometimes on `ts`,
    * sometimes on `user_id`, and a single-column sort leaves the other
    * column's per-file min/max spanning the whole domain (zero
    * skipping). Interleaving the bits of the range-bucketed dims and
    * range-partitioning on the interleaved key tiles the space, so
    * EVERY dim's per-file range shrinks to ≈ span/files^(1/ndims) and
    * footer stats prune files for predicates on ANY clustered dim.
    *
    * All column work is built-in shift/and/or expressions (whole-stage
    * codegen); the only driver action is one min/max agg. Nulls map to
    * the dim's minimum bucket. bitsPerDim·ndims must fit a long. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dims: Seq[String],
      numFiles: Int,
      bitsPerDim: Int = 16): Unit = {
    val nd = dims.size
    require(nd >= 1 && nd * bitsPerDim <= 63,
      s"z-order needs 1..63/bitsPerDim dims, got $nd x $bitsPerDim bits")
    val statCols = dims.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(statCols.head, statCols.tail: _*).head()
    if ((0 until 2 * nd).forall(stats.isNullAt)) {
      // empty input (or every dim all-null): nothing to cluster on
      df.write.mode("overwrite").parquet(path); return
    }
    val side = 1L << bitsPerDim
    val buckets = dims.zipWithIndex.map { case (c, i) =>
      // an ALL-NULL dim has null min/max: every row lands in bucket 0
      // for that dim (consistent with "nulls map to the minimum
      // bucket") instead of NPE-ing the stat read mid-write
      val mn = if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i)
      val mx = if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1)
      val span = if (mx > mn) mx - mn else 1.0
      // clamp BEFORE floor (mirrors Quantiles.groupRanked /
      // DistributedRank): under ANSI mode floor of ±Inf overflows the
      // LONG cast and floor of NaN fails; least/greatest treat NaN as
      // the largest double, so -Inf→bucket 0, NaN/+Inf→last bucket
      floor(least(greatest(
          (coalesce(col(c).cast("double"), lit(mn)) - mn) / span * side,
          lit(0.0)),
        lit((side - 1).toDouble))).cast("long")
    }
    // bit j of dim i lands at position j*nd + i
    val z = (0 until bitsPerDim).flatMap { j =>
      buckets.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * nd + i)
      }
    }.reduce(_ bitwiseOR _)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
