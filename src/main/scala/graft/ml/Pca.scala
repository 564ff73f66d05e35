package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.commons.math3.linear.{Array2DRowRealMatrix, EigenDecomposition}
import graft.stats.StatTests

/** PCA on samples (ref analysis.py:51-93 `pca`): the reference fits
  * sklearn PCA on `df.values.T` (rows = samples, columns = features,
  * NaN→0).
  *
  * Scale design: n_samples is small (≤10³) but n_features is
  * table-scale, so the only distributed-heavy object is the feature
  * axis. We compute the s×s sample Gram/covariance matrix with ONE
  * aggregation over the long form (s² tiny accumulators), eigen-solve
  * driver-side (commons-math3), then emit:
  *   - scores per sample (tiny),
  *   - weights per feature (distributed: one groupBy(feature) matvec).
  * No n_features×n_features object ever materializes — this survives
  * 100 TB where sklearn's SVD cannot.
  */
object Pca {

  final case class PcaModel(
      sampleOrder: Seq[String],
      mean: Array[Double], // per-sample mean over features
      components: Array[Array[Double]], // [comp][sample] — eigenvectors of the sample Gram
      eigenvalues: Array[Double], // λ_c = σ_c² of the centered matrix
      explainedVarianceRatio: Array[Double])

  /** Fit on long form (idCol, sampleCol, valueCol); nulls→0 like the
    * reference. Centering is per sample (the reference's
    * `mean_center` over features). */
  def fit(
      df: DataFrame,
      idCol: String,
      sampleCol: String,
      valueCol: String,
      nComponents: Int = 2): PcaModel = {
    val v = coalesce(col(valueCol), lit(0.0))
    // n_features = distinct ids; per-sample sums (one pass)
    val nFeatures = df.select(col(idCol)).distinct().count().toDouble
    val samples = df.select(col(sampleCol)).distinct()
      .collect().map(_.get(0).toString).sorted
    val sIdx = samples.zipWithIndex.toMap

    val sums = df.groupBy(col(sampleCol)).agg(graft.stats.Moments.sumExactFine(v).as("s")).collect()
      .map(r => r.get(0).toString -> r.getDouble(1)).toMap
    val mean = samples.map(s => sums.getOrElse(s, 0.0) / nFeatures).toArray

    // Gram matrix of centered data: G[a,b] = Σ_f (x_fa-μa)(x_fb-μb)
    //   = Σ_f x_fa x_fb - n μa μb (expanding; Σ_f x_fa = n μa).
    // Cross-products via one groupBy(feature) + in-row pair expansion
    // (zero-filled cells contribute 0 to every product, so skipping
    // nulls is exact). Upper triangle mirrored driver-side.
    // exact-decimal cross sums: the model (and every score downstream)
    // is partition-order-independent, so oracle literals recorded from
    // one run stay valid for any partitioning
    val cross = StatTests.pairObservations(df, Seq(idCol), sampleCol, valueCol)
      .groupBy(col("s1"), col("s2"))
      .agg(graft.stats.Moments.sumProdExact(col("x"), col("y")).as("sxy"))
      .collect()
    val s = samples.length
    val g = Array.ofDim[Double](s, s)
    cross.foreach { row =>
      val a = sIdx(row.get(0).toString); val b = sIdx(row.get(1).toString)
      val centered = row.getDouble(2) - nFeatures * mean(a) * mean(b)
      g(a)(b) = centered
      g(b)(a) = centered // pairObservations emits the upper triangle
    }

    val eig = new EigenDecomposition(new Array2DRowRealMatrix(g))
    val order = eig.getRealEigenvalues.zipWithIndex.sortBy(-_._1).take(nComponents)
    val totalVar = eig.getRealEigenvalues.filter(_ > 0).sum
    val comps = order.map { case (_, i) =>
      val vct = eig.getEigenvector(i).toArray
      // deterministic sign: largest-|coord| entry positive (sklearn-like svd_flip)
      val m = vct.indices.maxBy(j => math.abs(vct(j)))
      if (vct(m) < 0) vct.map(-_) else vct
    }
    PcaModel(samples.toSeq, mean, comps,
      order.map(_._1), order.map(_._1 / totalVar))
  }

  /** Scores per sample (sklearn convention: V·Σ — the projection of
    * each centered sample row onto the unit feature components).
    * Xᶜᵀ·w_c = V·Σ² on the Gram eigenbasis, so dividing by σ_c =
    * √λ_c recovers V·Σ. One distributed matvec + tiny output. */
  def sampleScores(
      spark: SparkSession, df: DataFrame, model: PcaModel,
      idCol: String, sampleCol: String, valueCol: String): DataFrame = {
    val weights = featureWeights(df, model, idCol, sampleCol, valueCol)
    val v = coalesce(col(valueCol), lit(0.0))
    val meanMap = map(model.sampleOrder.zip(model.mean)
      .flatMap { case (sm, mu) => Seq(lit(sm), lit(mu)) }: _*)
    val centered = df.withColumn("_c", v - element_at(meanMap, col(sampleCol)))
    val aggs = model.eigenvalues.zipWithIndex.map { case (lam, c) =>
      (graft.stats.Moments.sumProdExact(col("_c"), col(s"w_$c")) / math.sqrt(lam)).as(s"pc_$c")
    }.toIndexedSeq
    centered.join(weights, idCol)
      .groupBy(col(sampleCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Feature weights (loadings direction in feature space): for each
    * feature f and component c, w[f,c] = Σ_s centered(f,s)·v_c[s],
    * normalized by sqrt(eigenvalue) — distributed groupBy(feature). */
  def featureWeights(
      df: DataFrame, model: PcaModel,
      idCol: String, sampleCol: String, valueCol: String): DataFrame = {
    val v = coalesce(col(valueCol), lit(0.0))
    val meanMap = map(model.sampleOrder.zip(model.mean)
      .flatMap { case (sm, mu) => Seq(lit(sm), lit(mu)) }: _*)
    val centered = df.withColumn("_c", v - element_at(meanMap, col(sampleCol)))
    val aggs = model.components.zipWithIndex.map { case (comp, c) =>
      val compMap = map(model.sampleOrder.zip(comp)
        .flatMap { case (sm, w) => Seq(lit(sm), lit(w)) }: _*)
      graft.stats.Moments.sumProdExact(col("_c"), element_at(compMap, col(sampleCol))).as(s"w_$c")
    }
    centered.groupBy(col(idCol)).agg(aggs.head, aggs.toIndexedSeq.tail: _*)
  }
}
