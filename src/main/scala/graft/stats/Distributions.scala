package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** p-value CDFs over commons-math3 (already on Spark's classpath —
  * SURVEY §4.2). Exposed as Column functions; these run on
  * per-feature AGGREGATED rows (orders of magnitude smaller than the
  * fact table), so a deterministic scalar UDF here is off the hot
  * path — the 100 TB-scale work (the moment aggregation) stays in
  * whole-stage codegen.
  */
object Distributions {

  /** Two-sided Student-t p-value: 2 * (1 - CDF(|t|, df)).
    * Matches scipy.stats.ttest_ind / mstats (ref analysis.py:467-498). */
  private val tTwoSided = udf { (t: java.lang.Double, df: java.lang.Double) =>
    if (t == null || df == null || df <= 0 || t.isNaN) null
    else {
      val d = new org.apache.commons.math3.distribution.TDistribution(df)
      java.lang.Double.valueOf(2.0 * d.cumulativeProbability(-math.abs(t)))
    }
  }

  /** Upper-tail F p-value: 1 - CDF(F; d1, d2) (ref analysis.py:387-432
    * one-way ANOVA). */
  private val fUpper = udf { (f: java.lang.Double, d1: java.lang.Double, d2: java.lang.Double) =>
    if (f == null || d1 == null || d2 == null || d1 <= 0 || d2 <= 0 || f.isNaN) null
    else {
      val dist = new org.apache.commons.math3.distribution.FDistribution(d1, d2)
      java.lang.Double.valueOf(1.0 - dist.cumulativeProbability(f))
    }
  }

  def tPValueTwoSided(t: Column, df: Column): Column = tTwoSided(t, df)
  def fPValueUpper(f: Column, d1: Column, d2: Column): Column = fUpper(f, d1, d2)
}
