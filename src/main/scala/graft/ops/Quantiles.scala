package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles — the percentile-gate primitive a corpus
  * curation pipeline runs constantly ("drop documents below the p5
  * quality score of their language", "cap at p99 token count").
  *
  * Scale design: one window PARTITIONED BY the group key (shuffles
  * once on the group — never a global single-partition window,
  * invariant 6) ranks values with a DETERMINISTIC tie-break on the
  * caller's unique key columns; the quantile is then the row at rank
  * ceil(q·n) (1-indexed, the discrete lower-nearest definition), so
  * results are exact and bitwise-reproducible — approx_percentile's
  * sketch is neither, and an external engine can replay the same rank
  * selection verbatim.
  */
object Quantiles {

  /** One row per group with a column per requested quantile
    * (`p50`, `p95`, … named from `(q*100).round`). `tieCols` must make
    * (group, value, tieCols) unique for reproducible ranks. */
  def exactGroupQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[Double],
      tieCols: Seq[String]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), "qs in (0, 1]")
    val w = Window.partitionBy(col(groupCol))
      .orderBy((col(valueCol) +: tieCols.map(col)): _*)
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val aggs = qs.map { q =>
      val name = s"p${math.round(q * 100)}"
      max(when(col("_rn") === ceil(lit(q) * col("_n")), col(valueCol))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** The matching DuckDB SQL (same rank selection, same tie-break) —
    * kept adjacent so the trees stay structurally identical. */
  def oracleSql(
      table: String, groupCol: String, valueCol: String,
      qs: Seq[Double], tieCols: Seq[String]): String = {
    val order = (valueCol +: tieCols).mkString(", ")
    val aggs = qs.map { q =>
      val name = s"p${math.round(q * 100)}"
      // CAST('..' AS DOUBLE) on BOTH factors: a bare 0.95 is DECIMAL in
      // DuckDB and 0.95·n then differs from Spark's double product at
      // exact-integer boundaries (double 0.95·20 = 19.0000…04 → CEIL
      // 20, decimal → 19). Identical IEEE trees or nothing.
      s"MAX(CASE WHEN rn = CEIL(CAST('$q' AS DOUBLE) * CAST(n AS DOUBLE)) THEN $valueCol END) AS $name"
    }.mkString(",\n        ")
    s"""
      WITH r AS (
        SELECT $groupCol, $valueCol,
          ROW_NUMBER() OVER (PARTITION BY $groupCol ORDER BY $order) AS rn,
          COUNT(*) OVER (PARTITION BY $groupCol) AS n
        FROM $table WHERE $valueCol IS NOT NULL)
      SELECT $groupCol,
        $aggs
      FROM r GROUP BY $groupCol"""
  }
}
