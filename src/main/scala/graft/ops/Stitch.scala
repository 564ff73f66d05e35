package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-statistics over BOUNDED summary frames (the ≤numBuckets-row
  * side of the two-level rank/offset stitch) without any window.
  *
  * A `Window.orderBy` over such a frame is correct and bounded, but it
  * plans as a single-partition WindowExec — indistinguishable in plans
  * and logs from a real global-window regression (and
  * `partitionBy(lit(0))` does not help: Catalyst constant-folds the
  * literal out of the partition spec). These helpers express the same
  * running aggregates as a bounded self-join (B² pairs, B ≤ ~1024 —
  * trivial, broadcast by AQE), so the data-plane invariant "no
  * unpartitioned windows anywhere" holds STRUCTURALLY and
  * `PlanAudit --scan-windows` / PlanSpec can assert it at zero. */
object Stitch {

  /** Exclusive running sum: for each row, the sum of `sumCol` over rows
    * with a strictly smaller `keyCol` (0 for the first). Input must
    * have one row per key. Output: input columns + `outCol`. */
  def cumulativeBefore(
      summary: DataFrame, keyCol: String, sumCol: String, outCol: String): DataFrame = {
    val b = summary.select(col(keyCol).as("_sk2"), col(sumCol).as("_sv2"))
    summary.join(broadcast(b), col("_sk2") < col(keyCol), "left")
      .groupBy(summary.columns.map(col).toIndexedSeq: _*)
      .agg(coalesce(sum(col("_sv2")), lit(0L)).as(outCol))
  }

  /** Min of `valCol` over rows with a strictly LARGER `keyCol` (null
    * for the last row — matching a window min over an empty frame).
    * Input must have one row per key. */
  def minAfter(
      summary: DataFrame, keyCol: String, valCol: String, outCol: String): DataFrame = {
    val b = summary.select(col(keyCol).as("_sk2"), col(valCol).as("_sv2"))
    summary.join(broadcast(b), col("_sk2") > col(keyCol), "left")
      .groupBy(summary.columns.map(col).toIndexedSeq: _*)
      .agg(min(col("_sv2")).as(outCol))
  }
}
