package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Summary/enrichment aggregations from `padua/analysis.py` tail +
  * the covariance-ellipse helper from `visualize.py`. */
object Summaries {

  /** `enrichment_from_msp` (ref analysis.py:263-287): zero → missing,
    * per-(sample, modified-flag) intensity sums, modified/total ratio
    * per sample. One pass: conditional sums after the flag projection. */
  def enrichmentFromMsp(
      df: DataFrame,
      modificationsCol: String,
      sampleCol: String,
      valueCol: String,
      modification: String): DataFrame = {
    val isMod = coalesce(col(modificationsCol).contains(modification), lit(false))
    val v = when(col(valueCol) =!= 0, col(valueCol)) // 0 == not quantified
    df.groupBy(col(sampleCol))
      .agg(
        sum(when(isMod, v)).as("modified"),
        sum(v).as("total"))
      .withColumn("enrichment", try_divide(col("modified"), col("total")))
  }

  /** `_non_zero_sum` (ref analysis.py:221-229): per-key sum of
    * positive values only. */
  def nonZeroSum(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.filter(col(valueCol) > 0)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(valueCol)).as("sum_value"))

  /** Technical-replicate collapse (S-1 notebook:
    * `df.median(axis=1, level=[0,1,2])`): exact median per
    * (feature, kept sample attributes). */
  def collapseTechnicalReplicates(
      df: DataFrame, idCols: Seq[String], keepAttrs: Seq[String], valueCol: String): DataFrame =
    df.groupBy((idCols ++ keepAttrs).map(col): _*)
      .agg(median(col(valueCol)).as(valueCol))

  /** `sitespeptidesproteins` (ref analysis.py:291-309): Class-I site
    * count, distinct peptide windows, distinct leading proteins. */
  def sitesPeptidesProteins(
      df: DataFrame,
      probCol: String = "Localization prob",
      seqCol: String = "Sequence window",
      proteinsCol: String = "Proteins",
      threshold: Double = 0.75): DataFrame = {
    val classI = df.filter(col(probCol) > threshold)
    classI.agg(
      count(lit(1)).as("sites"),
      countDistinct(col(seqCol)).as("peptides"),
      countDistinct(split(col(proteinsCol), ";").getItem(0)).as("proteins"))
  }

  /** Approximate summary for the 100 TB path: exact countDistinct
    * shuffles every distinct value; HyperLogLog++ sketches (±~2.3%
    * at the default rsd 0.05) partial-aggregate instead. */
  def sitesPeptidesProteinsApprox(
      df: DataFrame,
      probCol: String = "Localization prob",
      seqCol: String = "Sequence window",
      proteinsCol: String = "Proteins",
      threshold: Double = 0.75,
      rsd: Double = 0.05): DataFrame = {
    val classI = df.filter(col(probCol) > threshold)
    classI.agg(
      count(lit(1)).as("sites"),
      approx_count_distinct(col(seqCol), rsd).as("peptides"),
      approx_count_distinct(split(col(proteinsCol), ";").getItem(0), rsd).as("proteins"))
  }

  /** `plot_point_cov`/`plot_cov_ellipse` data (ref visualize.py:60-113):
    * 2×2 covariance of an (x, y) cloud + eigen decomposition →
    * (center, width, height, angle) of the nσ ellipse. Covariance is
    * one distributed aggregation; the 2×2 eigen is closed-form. */
  final case class Ellipse(cx: Double, cy: Double, width: Double, height: Double, angleDeg: Double)

  def covarianceEllipse(df: DataFrame, xCol: String, yCol: String, nstd: Double = 2.0): Ellipse = {
    val r = df.agg(
      avg(col(xCol)).as("mx"), avg(col(yCol)).as("my"),
      covar_samp(col(xCol), col(xCol)).as("cxx"),
      covar_samp(col(xCol), col(yCol)).as("cxy"),
      covar_samp(col(yCol), col(yCol)).as("cyy")).head()
    val (mx, my) = (r.getDouble(0), r.getDouble(1))
    val (cxx, cxy, cyy) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    // closed-form 2×2 symmetric eigen
    val tr = cxx + cyy
    val det = cxx * cyy - cxy * cxy
    val disc = math.sqrt(math.max(tr * tr / 4 - det, 0.0))
    val l1 = tr / 2 + disc
    val l2 = tr / 2 - disc
    val angle =
      if (cxy == 0.0) { if (cxx >= cyy) 0.0 else 90.0 }
      else math.toDegrees(math.atan2(l1 - cxx, cxy))
    Ellipse(mx, my, 2 * nstd * math.sqrt(math.max(l1, 0)), 2 * nstd * math.sqrt(math.max(l2, 0)), angle)
  }
}
