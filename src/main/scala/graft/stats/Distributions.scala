package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, when}

/** p-value CDFs over commons-math3 (already on Spark's classpath —
  * SURVEY §4.2), exposed as Column functions backed by native Catalyst
  * expressions with doGenCode (DistExpressions): the CDF call stays
  * inside whole-stage codegen as a static method invocation. Invalid
  * dof (<= 0) yields null, matching the prior UDF contract. */
object Distributions {

  /** Two-sided Student-t p-value: 2 * (1 - CDF(|t|, df)).
    * Matches scipy.stats.ttest_ind / mstats (ref analysis.py:467-498). */
  def tPValueTwoSided(t: Column, df: Column): Column = {
    val p = DistExpressions.tPValueTwoSided(t, df)
    when(df <= 0 || p.isNaN, lit(null)).otherwise(p)
  }

  /** Upper-tail F p-value: 1 - CDF(F; d1, d2) (ref analysis.py:387-432
    * one-way ANOVA). */
  def fPValueUpper(f: Column, d1: Column, d2: Column): Column = {
    val p = DistExpressions.fPValueUpper(f, d1, d2)
    when(d1 <= 0 || d2 <= 0 || p.isNaN, lit(null)).otherwise(p)
  }
}
