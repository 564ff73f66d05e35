package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storey–Tibshirani q-values (ref `padua/utils.py:8-105`):
  * sort p ascending, raw_i = pi0 * m * p_i / rank_i, then backward
  * running minimum, restore original order.
  *
  * Scale design (SURVEY §7.4): a naive global window
  * (`Window.orderBy(p)` with no partition key) collapses to ONE
  * partition — a non-starter for 10⁸+ features. Instead p∈[0,1] is
  * range-bucketed; ranks and backward cummins are computed per bucket
  * in parallel, then stitched with a tiny (numBuckets-row) bucket
  * summary: global_rank = earlier-bucket row count + local rank,
  * global suffix-min = min(local suffix-min, later-bucket min). The
  * bucket summary is the only single-partition window and it is
  * O(numBuckets).
  *
  * Determinism: raw uses only (p, integer rank) with IEEE *,/ — and
  * tied p-values provably receive identical q regardless of tie
  * order — so results hash-match a single-node oracle.
  */
object QValues {

  /** Append `qCol` q-values for `pCol`. pi0=1 gives Benjamini–Hochberg;
    * pass `storeyPi0(df, pCol)` for the reference's spline estimate. */
  def qvalues(
      df: DataFrame,
      pCol: String,
      qCol: String = "q",
      pi0: Double = 1.0,
      numBuckets: Int = 1024): DataFrame = {
    val p = col(pCol)
    val bucketed = df
      .filter(p.isNotNull)
      .withColumn("_bkt", least(floor(p * numBuckets).cast("int"), lit(numBuckets - 1)))

    // Tiny per-bucket summary: row count and min raw candidate needs
    // ranks first, so do it in two layers over the bucketed frame.
    val wBkt = Window.partitionBy(col("_bkt")).orderBy(p)
    val local = bucketed
      .withColumn("_lrank", row_number().over(wBkt))

    val counts = local.groupBy(col("_bkt")).agg(count(lit(1)).as("_bn"))
    // ≤ numBuckets summary rows: running offsets + total via the
    // bounded self-join/crossJoin (graft.ops.Stitch) — no
    // unpartitioned WindowExec anywhere, so a real global-window
    // regression cannot hide in the logs. m (total tests) = sum of
    // bucket counts, from the summary the plan already computes —
    // never a separate count() pass over the data.
    val total = counts.agg(sum(col("_bn")).as("_m"))
    val offsets = graft.ops.Stitch
      .cumulativeBefore(counts, "_bkt", "_bn", "_offset")
      .crossJoin(broadcast(total))
      .select(col("_bkt"), col("_offset"), col("_m"))

    val ranked = local
      .join(broadcast(offsets), Seq("_bkt"))
      .withColumn("_rank", col("_offset") + col("_lrank"))
      .withColumn("_raw", lit(pi0) * col("_m").cast("double") * p / col("_rank").cast("double"))

    // Backward running min within bucket…
    val withLocalMin = ranked.withColumn(
      "_lmin", min(col("_raw")).over(wBkt.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    // …stitched with the min over strictly-later buckets (bounded
    // self-join, same no-window rationale as the offsets above).
    val bucketMins = graft.ops.Stitch
      .minAfter(withLocalMin.groupBy(col("_bkt")).agg(min(col("_raw")).as("_bmin")),
        "_bkt", "_bmin", "_laterMin")
      .select(col("_bkt"), col("_laterMin"))
    withLocalMin
      .join(broadcast(bucketMins), Seq("_bkt"))
      .withColumn(qCol, least(least(col("_lmin"), col("_laterMin")), lit(1.0)))
      .drop("_bkt", "_lrank", "_offset", "_m", "_rank", "_raw", "_lmin", "_laterMin")
  }

  /** Storey pi0 estimate (ref utils.py:42-72): over λ grid 0,0.01,…,0.89,
    * pi0(λ) = #\{p > λ\} / (m(1-λ)); cubic-spline through the grid,
    * evaluated at max λ; clamped to (0,1]. The grid counts are ONE
    * conditional aggregation over the data; the 90-point spline is
    * driver-side (not data-plane). */
  def storeyPi0(df: DataFrame, pCol: String): Double = {
    val lambdas = (0 until 90).map(_ / 100.0)
    val aggs = lambdas.zipWithIndex.map { case (l, i) =>
      sum(when(col(pCol) > l, 1L).otherwise(0L)).as(s"_c$i")
    }
    val row = df.filter(col(pCol).isNotNull)
      .agg(count(lit(1)).as("_m"), aggs: _*)
      .head()
    val m = row.getLong(0).toDouble
    if (m < 100) return 1.0 // ref utils.py:44-45: few tests → pi0 = 1
    val pi0s = lambdas.zipWithIndex.map { case (l, i) => row.getLong(i + 1) / (m * (1.0 - l)) }
    val fitted = NaturalCubicSpline.interpolate(lambdas.toArray, pi0s.toArray, lambdas.last)
    math.min(math.max(fitted, 1e-8), 1.0)
  }
}

/** Natural cubic spline (driver-side, 90 knots) — public textbook
  * algorithm; stands in for scipy's UnivariateSpline in the pi0
  * estimate. */
object NaturalCubicSpline {
  def interpolate(xs: Array[Double], ys: Array[Double], at: Double): Double = {
    val sp = new org.apache.commons.math3.analysis.interpolation.SplineInterpolator()
      .interpolate(xs, ys)
    val clamped = math.min(math.max(at, xs.head), xs.last)
    sp.value(clamped)
  }
}
