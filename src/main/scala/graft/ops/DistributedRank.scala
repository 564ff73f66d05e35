package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global row numbering WITHOUT a single-partition window.
  *
  * `Window.orderBy(x)` with no partition key collapses all data into
  * one task — the classic 100 TB killer. Instead: range-bucket the
  * order key (min/max from one cheap agg), number rows within each
  * bucket in parallel, and add per-bucket offsets computed from a tiny
  * (numBuckets-row) summary. Same pattern as QValues; exposed as a
  * reusable operator (ref rankintensity, visualize.py:1111-1135, and
  * every `sort_values` site).
  */
object DistributedRank {

  /** Append `outCol` = global 1-based row number ordered by
    * (valueCol [asc|desc], tieCols...). valueCol must be numeric;
    * rows with a null order key are excluded (they have no rank). */
  def rowNumber(
      df: DataFrame,
      valueCol: String,
      ascending: Boolean,
      tieCols: Seq[String],
      outCol: String = "rank",
      numBuckets: Int = 1024): DataFrame =
    rowNumberCounted(df, valueCol, ascending, tieCols, outCol, numBuckets)._1

  /** rowNumber plus the ranked (non-null) row count, read from the SAME
    * min/max aggregation job — callers that need n (ntile) get it
    * without a second pass over the input. */
  def rowNumberCounted(
      df: DataFrame,
      valueCol: String,
      ascending: Boolean,
      tieCols: Seq[String],
      outCol: String = "rank",
      numBuckets: Int = 1024): (DataFrame, Long) = {
    val data = df.filter(col(valueCol).isNotNull)
    val mm = data.agg(
      min(col(valueCol)).cast("double").as("mn"),
      max(col(valueCol)).cast("double").as("mx"),
      count(lit(1)).as("n")).head()
    if (mm.isNullAt(0)) // empty input: rank column, no rows
      return (data.withColumn(outCol, lit(null).cast("long")).limit(0), 0L)
    val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
    val span = if (mx > mn) mx - mn else 1.0
    // clamp BEFORE floor/cast: under ANSI mode floor of ±Inf overflows
    // LONG and NaN fails the int cast; least/greatest treat NaN as the
    // largest double, so -Inf→bucket 0, NaN/+Inf→last bucket — exactly
    // where the sort order puts them
    val raw = floor(least(greatest(
        (col(valueCol).cast("double") - mn) / span * numBuckets, lit(0.0)),
      lit((numBuckets - 1).toDouble))).cast("int")
    val bucket = if (ascending) raw else lit(numBuckets - 1) - raw

    val ordered: Seq[Column] = {
      val v = if (ascending) col(valueCol).asc else col(valueCol).desc
      v +: tieCols.map(col(_).asc)
    }
    val wBkt = Window.partitionBy(col("_rb")).orderBy(ordered: _*)
    val local = data.withColumn("_rb", bucket)
      .withColumn("_lrn", row_number().over(wBkt))
    // ≤ numBuckets summary rows: running offsets via the bounded
    // self-join (Stitch) — no unpartitioned WindowExec anywhere, so a
    // real global-window regression cannot hide in the logs
    val offsets = Stitch.cumulativeBefore(
        local.groupBy(col("_rb")).agg(count(lit(1)).as("_bn")), "_rb", "_bn", "_off")
      .select(col("_rb"), col("_off"))
    (local.join(broadcast(offsets), Seq("_rb"))
      .withColumn(outCol, col("_off") + col("_lrn"))
      .drop("_rb", "_lrn", "_off"), mm.getLong(2))
  }

  /** Append `outCol` = INCLUSIVE global running sum of `sumCol` in
    * `orderCol` order, without a single-partition window: the same
    * two-level shape as [[rowNumberCounted]] — range-bucket the order
    * key, window-sum WITHIN each bucket in parallel, add per-bucket
    * byte offsets from the ≤numBuckets-row Stitch summary. Exact for
    * integer `sumCol` (long sums throughout). `orderCol` must be
    * unique-ish numeric (ties break arbitrarily WITHIN the running
    * order — callers needing determinism pass a unique key); null
    * order keys are excluded. */
  def cumulativeSum(
      df: DataFrame,
      orderCol: String,
      sumCol: String,
      outCol: String = "cumsum",
      numBuckets: Int = 1024): DataFrame = {
    val data = df.filter(col(orderCol).isNotNull)
    val mm = data.agg(
      min(col(orderCol)).cast("double").as("mn"),
      max(col(orderCol)).cast("double").as("mx")).head()
    if (mm.isNullAt(0))
      return data.withColumn(outCol, lit(null).cast("long")).limit(0)
    val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
    val span = if (mx > mn) mx - mn else 1.0
    val bucket = floor(least(greatest(
        (col(orderCol).cast("double") - mn) / span * numBuckets, lit(0.0)),
      lit((numBuckets - 1).toDouble))).cast("int")
    val wBkt = Window.partitionBy(col("_rb")).orderBy(col(orderCol).asc)
    val local = data.withColumn("_rb", bucket)
      .withColumn("_lcs",
        sum(col(sumCol)).over(wBkt.rowsBetween(Window.unboundedPreceding, 0)))
    val offsets = Stitch.cumulativeBefore(
        local.groupBy(col("_rb")).agg(sum(col(sumCol)).as("_bb")), "_rb", "_bb", "_off")
      .select(col("_rb"), col("_off"))
    local.join(broadcast(offsets), Seq("_rb"))
      .withColumn(outCol, (col("_off") + col("_lcs")).cast("long"))
      .drop("_rb", "_lcs", "_off")
  }

  /** Per-key top-k: row_number over a window PARTITIONED by the key
    * (scales — state per task is one key-group, unlike a global
    * orderBy) then filter rank <= k. The grouped complement of the
    * global `orderBy.limit` top-k. */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      ascending: Boolean,
      tieCols: Seq[String],
      k: Int,
      outCol: String = "rn"): DataFrame = {
    val ordered: Seq[Column] = {
      val v = if (ascending) col(orderCol).asc else col(orderCol).desc
      v +: tieCols.map(col(_).asc)
    }
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordered: _*)
    df.withColumn(outCol, row_number().over(w).cast("long"))
      .filter(col(outCol) <= k)
  }

  /** Exact SQL `NTILE(num)` semantics without a single-partition
    * window: global rank via the bucketed pattern above, then the
    * closed-form rank→bucket map (first `n mod num` buckets carry the
    * extra row, matching NTILE). Ref `chunks`, utils.py:259-279.
    *
    * Like rowNumber (and unlike a plain NTILE window, which ranks
    * nulls first), rows with a null `valueCol` are DROPPED — they have
    * no rank, so they belong to no chunk. Oracled columns are non-null;
    * callers with nullable order keys must filter or fill first.
    */
  def ntile(
      df: DataFrame,
      valueCol: String,
      tieCols: Seq[String],
      num: Int,
      outCol: String = "chunk",
      numBuckets: Int = 1024): DataFrame = {
    // n comes from rowNumberCounted's own aggregation — ntile is two
    // jobs total (summary agg + main), not three (no separate count()).
    val (ranked, n) = rowNumberCounted(df, valueCol, ascending = true, tieCols, "_ntr", numBuckets)
    val q = n / num // min bucket size
    val r = n % num // first r buckets have q+1 rows
    val bucket =
      if (q == 0L) col("_ntr") // fewer rows than buckets: one row each
      else when(col("_ntr") <= lit(r * (q + 1)),
          floor((col("_ntr") - 1) / lit((q + 1).toDouble)) + 1)
        .otherwise(lit(r) +
          floor((col("_ntr") - 1 - lit(r * (q + 1))) / lit(q.toDouble)) + 1)
    ranked.withColumn(outCol, bucket.cast("int")).drop("_ntr")
  }
}
