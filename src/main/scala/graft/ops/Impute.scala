package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Missing-value imputation (ref `padua/imputation.py`). */
object Impute {

  /** Gaussian downshift imputation (ref imputation.py:14-63
    * `gaussian`, Perseus-style): per sample, observed μ and σ; fill
    * nulls with draws from N(μ + downshift·σ, (width·σ)²).
    *
    * Differences from the reference, by design: `randn(seed)` is
    * SEEDED (the reference uses unseeded np.random.normal,
    * imputation.py:58 — non-reproducible; SURVEY §4.1 flags it), and
    * the per-sample moments are a broadcast-joined aggregation instead
    * of a per-column Python loop. Also emits `was_imputed` (the
    * reference returns a parallel mask frame). */
  def gaussian(
      df: DataFrame,
      sampleCol: String = "sample",
      valueCol: String = "value",
      width: Double = 0.3,
      downshift: Double = -1.8,
      seed: Long = 42L): DataFrame = {
    val stats = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(sampleCol))
      .agg(avg(col(valueCol)).as("_mu"), stddev_samp(col(valueCol)).as("_sd"))
    df.join(broadcast(stats), Seq(sampleCol), "left")
      .withColumn("was_imputed", col(valueCol).isNull)
      .withColumn(valueCol,
        when(col(valueCol).isNotNull, col(valueCol))
          .otherwise(randn(seed) * (lit(width) * col("_sd")) +
            (col("_mu") + lit(downshift) * col("_sd"))))
      .drop("_mu", "_sd")
  }
}
