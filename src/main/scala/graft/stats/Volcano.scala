package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ScalarFuncs

/** Volcano table — the engine's flagship composed query (ref
  * visualize.py:521-676; SURVEY §2.10, §7.3): per-feature group
  * log-ratio + t-test + SAM s0 significance classification. The plot
  * itself is a client concern; this produces its data contract
  * (id..., ratio, t, p, significant).
  */
object Volcano {

  /** Two-sample volcano on log2-scale values: ratio = mean(b) - mean(a)
    * (difference of means on log2 data = log2 fold change), equal-var
    * t-test, s0 classification. `minValidN` gates features lacking
    * enough observations per group (ref visualize.py:545-552). */
  def twoSample(
      df: DataFrame,
      idCols: Seq[String],
      groupCol: String,
      valueCol: String,
      control: String,
      comparison: String,
      minValidN: Int = 3,
      s0: Double = 0.5,
      minRatio: Double = 1.0,
      minP: Double = 0.05): DataFrame = {
    val t = StatTests.tTestInd(df, idCols, groupCol, valueCol, control, comparison)
      .filter(col("n_a") >= minValidN && col("n_b") >= minValidN)
      .withColumn("ratio", col("mean_b") - col("mean_a"))
    t.withColumn("significant",
        ScalarFuncs.s0Significant(col("p"), abs(col("ratio")), s0, minRatio, minP))
  }

  /** One-sample volcano (SILAC ratios, ref visualize.py:557 + File S-2):
    * values are already log2 ratios; ratio = mean, t-test vs 0. */
  def oneSample(
      df: DataFrame,
      idCols: Seq[String],
      valueCol: String,
      minValidN: Int = 2,
      s0: Double = 0.5,
      minRatio: Double = 1.0,
      minP: Double = 0.05): DataFrame = {
    val t = StatTests.tTest1Samp(df, idCols, valueCol)
      .filter(col("n") >= minValidN)
      .withColumn("ratio", col("mean"))
    t.withColumn("significant",
        ScalarFuncs.s0Significant(col("p"), abs(col("ratio")), s0, minRatio, minP))
  }

  /** Up/down significant counts (ref visualize.py:650-660). */
  def upDownCounts(volcano: DataFrame): DataFrame =
    volcano.filter(col("significant"))
      .groupBy(when(col("ratio") > 0, "up").otherwise("down").as("direction"))
      .agg(count(lit(1)).as("n"))
}
