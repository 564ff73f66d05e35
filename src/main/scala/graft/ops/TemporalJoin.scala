package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference lacks but a large-scale event pipeline
  * needs (extended surface; the reference's only time axis is the
  * `Timepoint` design level, process.py:61-64).
  *
  * Both operators avoid the naive formulations that die at 100 TB:
  *
  *  - `asOf` is NOT a per-row subquery or a time-range cross join: the
  *    two sides are unioned, hash-partitioned by the join key, and
  *    resolved in ONE window pass (`last(_, ignoreNulls)` over the
  *    interleaved timeline). One shuffle, no broadcast of either fact
  *    side, no rejoin.
  *  - `countInPrecedingRange` keeps the equi key in the join so Spark
  *    plans a shuffled join with the range condition as a secondary
  *    predicate — never a broadcast-nested-loop.
  */
object TemporalJoin {

  /** As-of join: for each `left` row, attach the columns of the most
    * recent `right` row with the same `key` and `right.time <=
    * left.time` (DuckDB/kdb ASOF semantics). Right rows should be
    * unique per (key, time) — pre-aggregate if not, or ties resolve
    * arbitrarily.
    *
    * Output: all `left` columns, plus `asof_<time>` and
    * `asof_<name>` for each requested right column — null when no
    * prior right row exists (left-join semantics).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == time).toSeq
    val rCarried = (time +: rightVals).map(col)
    val rvType = right.select(struct(rCarried: _*).as("_rv")).schema("_rv").dataType

    // side 0 sorts before side 1 at equal time => a right row at
    // exactly left.time is matched (<=, not <). Right rows with a null
    // time can never be "most recent" — dropped; left rows with a null
    // time sort NULLS FIRST, before every right row, so they get a
    // null match (kept, left-join semantics).
    val r = right.filter(col(time).isNotNull).select(
      col(key), col(time), lit(0).as("_side"), struct(rCarried: _*).as("_rv"))
    val l0 = left.select(
      col(key), col(time), lit(1).as("_side"), lit(null).cast(rvType).as("_rv"))
    val (l, rr) =
      if (leftCols.isEmpty) (l0, r)
      else {
        val lvType = left
          .select(struct(leftCols.map(col): _*).as("_lv")).schema("_lv").dataType
        (left.select(col(key), col(time), lit(1).as("_side"),
           lit(null).cast(rvType).as("_rv"),
           struct(leftCols.map(col): _*).as("_lv")),
         r.withColumn("_lv", lit(null).cast(lvType)))
      }

    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val resolved = rr.unionByName(l)
      .withColumn("_match", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val outLeft = Seq(col(key), col(time)) ++ leftCols.map(c => col(s"_lv.$c").as(c))
    val outAsOf = (time +: rightVals).map(n => col(s"_match.$n").as(s"asof_$n"))
    resolved.select(outLeft ++ outAsOf: _*)
  }

  /** For each `left` row, count `right` rows with the same `key` and
    * `time` in `[left.time - range, left.time)` — e.g. "clicks by this
    * user in the hour before each purchase". Equi+range shuffled join,
    * left-join so zero-count rows survive. `left` rows must be unique
    * (they become the group-by key).
    */
  def countInPrecedingRange(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      range: Long,
      outCol: String): DataFrame = {
    val r = right.select(col(key).as("_rk"), col(time).as("_rt"))
    left.join(
        r,
        col(key) === col("_rk") &&
          col("_rt") >= col(time) - lit(range) && col("_rt") < col(time),
        "left")
      .groupBy(left.columns.toIndexedSeq.map(col): _*)
      .agg(count(col("_rt")).as(outCol))
  }
}
