package graft.ml

import graft.SparkSpec
import graft.ops.Impute
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {
  import spark.implicits._

  /** 4 features × 3 samples golden (numpy, sklearn-equivalent:
    * per-FEATURE centering, V·Σ scores, svd_flip signs). */
  private def pcaLong = {
    val x = Map(
      ("f1", "s1") -> 1.0, ("f1", "s2") -> 2.0, ("f1", "s3") -> 3.0,
      ("f2", "s1") -> 2.0, ("f2", "s2") -> 4.0, ("f2", "s3") -> 6.1,
      ("f3", "s1") -> 0.5, ("f3", "s2") -> 1.0, ("f3", "s3") -> 1.4,
      ("f4", "s1") -> 3.0, ("f4", "s2") -> 5.9, ("f4", "s3") -> 9.0)
    x.toSeq.map { case ((f, s), v) => (f, s, v) }.toDF("id", "sample", "value")
  }

  test("Pca matches numpy golden (explained variance + scores)") {
    val model = Pca.fit(pcaLong, "id", "sample", "value", nComponents = 2)
    assert(approx(model.explainedVarianceRatio(0), 0.9998849283, 1e-8))
    assert(approx(model.eigenvalues(0), 28.8166836341, 1e-6))
    val scores = Pca.sampleScores(spark, pcaLong, model, "id", "sample", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx(scores("s1")._1, -3.7620142465, 1e-6))
    assert(approx(scores("s2")._1, -0.0667552913, 1e-6))
    assert(approx(scores("s3")._1, 3.8287695379, 1e-6))
    assert(approx(scores("s1")._2, -0.0241276248, 1e-6))
  }

  test("Pca on a SPARSE long frame equals the explicitly zero-filled frame") {
    // missing (feature, sample) rows ARE zero cells (the reference
    // NaN→0-fills df.values.T): fit, scores and weights must all be
    // bitwise identical whether the zeros are implicit or explicit.
    // The absent-cell mass reaches scores/weights through the K_c /
    // μ_f·S_c constants — dropping it (summing centered PRESENT rows
    // only) diverges from sklearn on any sparse frame.
    val sparse = pcaLong.filter(!(col("id") === "f2" && col("sample") === "s3") &&
      !(col("id") === "f4" && col("sample") === "s1"))
    val dense = sparse.unionByName(
      Seq(("f2", "s3", 0.0), ("f4", "s1", 0.0)).toDF("id", "sample", "value"))
    val mS = Pca.fit(sparse, "id", "sample", "value", nComponents = 2)
    val mD = Pca.fit(dense, "id", "sample", "value", nComponents = 2)
    assert(mS.eigenvalues.toSeq == mD.eigenvalues.toSeq)
    assert(mS.components.map(_.toSeq).toSeq == mD.components.map(_.toSeq).toSeq)
    def scoresOf(df: org.apache.spark.sql.DataFrame, m: Pca.PcaModel) =
      Pca.sampleScores(spark, df, m, "id", "sample", "value")
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(scoresOf(sparse, mS) == scoresOf(dense, mD))
    def weightsOf(df: org.apache.spark.sql.DataFrame, m: Pca.PcaModel) =
      Pca.featureWeights(df, m, "id", "sample", "value")
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(weightsOf(sparse, mS) == weightsOf(dense, mD))
  }

  test("Ward clusters obvious 2-cluster structure") {
    // samples s0,s1 near origin; s2,s3 near (10,10) — features are coords
    val long = Seq(
      ("fx", "s0", 0.0), ("fy", "s0", 0.0),
      ("fx", "s1", 0.0), ("fy", "s1", 1.0),
      ("fx", "s2", 10.0), ("fy", "s2", 10.0),
      ("fx", "s3", 10.0), ("fy", "s3", 11.0)
    ).toDF("id", "sample", "value")
    val out = Ward.clusterSamples(spark, long, "id", "sample", "value", k = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out("s0") == out("s1"))
    assert(out("s2") == out("s3"))
    assert(out("s0") != out("s2"))
  }

  test("Ward rejects a sample axis over MaxLinkageSamples with the remediation spelled out") {
    // the driver-side linkage is O(s²) memory / O(s³) time by design —
    // past the cap the failure without this guard is an OOM/stall deep
    // inside a job, so the reject must be early and actionable
    val wide = (0 until Ward.MaxLinkageSamples + 1)
      .map(s => ("f0", s"s$s", s.toDouble)).toDF("id", "sample", "value")
    val e = intercept[IllegalArgumentException] {
      Ward.clusterSamples(spark, wide, "id", "sample", "value", k = 2)
    }
    assert(e.getMessage.contains("feature axis") &&
      e.getMessage.contains("BisectingKMeans"), e.getMessage)
  }

  test("Ward linkage matches hand-computed merge order and heights") {
    val sq = Array(
      Array(0.0, 1.0, 200.0, 221.0),
      Array(1.0, 0.0, 181.0, 200.0),
      Array(200.0, 181.0, 0.0, 1.0),
      Array(221.0, 200.0, 1.0, 0.0))
    val merges = Ward.linkage(sq)
    assert(merges.head.dist == 1.0) // first merges are the unit pairs
    assert(merges(1).dist == 1.0)
    assert(merges(2).size == 4)
  }

  test("Pls separates a signal feature (PLS-DA shape)") {
    // feature fsig tracks y; fnoise is constant-ish
    val long = Seq(
      ("fsig", "s1", 1.0), ("fsig", "s2", 1.1), ("fsig", "s3", 5.0), ("fsig", "s4", 5.2),
      ("fnoise", "s1", 3.0), ("fnoise", "s2", 3.0), ("fnoise", "s3", 3.0), ("fnoise", "s4", 3.0)
    ).toDF("id", "sample", "value")
    val y = Map("s1" -> 0.0, "s2" -> 0.0, "s3" -> 1.0, "s4" -> 1.0)
    val model = Pls.fit(spark, long, y, "id", "sample", "value", nComponents = 1)
    val scores = Pls.scores(spark, model).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // class 0 scores clearly below class 1 scores on LV1
    assert(math.max(scores("s1"), scores("s2")) < math.min(scores("s3"), scores("s4")))
    // weights: fsig dominates
    val w = model.components.head.w.collect()
      .map(r => r.getString(0) -> math.abs(r.getDouble(1))).toMap
    assert(w("fsig") > w("fnoise"))
    // predictions recover the class structure (plsr surface)
    val pred = Pls.predict(spark, model).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pred("s1") < 0.5 && pred("s2") < 0.5)
    assert(pred("s3") > 0.5 && pred("s4") > 0.5)
  }

  test("Pls projects unlabeled samples into the fitted space (golden)") {
    // ref analysis.py:133-137: the model is fit on groups a/b but
    // transform() projects EVERY sample. Golden from a NIPALS hand
    // computation (fit on s1-s4, s5 held out).
    val long = Seq(
      ("f1", "s1", 1.0), ("f1", "s2", 1.1), ("f1", "s3", 5.0), ("f1", "s4", 5.2), ("f1", "s5", 3.0),
      ("f2", "s1", 3.0), ("f2", "s2", 2.9), ("f2", "s3", 1.0), ("f2", "s4", 0.8), ("f2", "s5", 2.0)
    ).toDF("id", "sample", "value")
    val y = Map("s1" -> 0.0, "s2" -> 0.0, "s3" -> 1.0, "s4" -> 1.0)
    val model = Pls.fit(spark, long, y, "id", "sample", "value", nComponents = 2)
    val scores = Pls.scores(spark, model).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val golden = Map(
      "s1" -> (-2.336827909988815, 0.020354897388264077),
      "s2" -> (-2.2024451595675867, -0.023608693878526554),
      "s3" -> (2.1352537843569723, 0.045590489511921614),
      "s4" -> (2.404019285199429, -0.042336693021659336),
      "s5" -> (-0.1007870628159212, 0.03297269345009284))
    assert(scores.keySet == golden.keySet) // all five samples scored
    // 1e-7, not 1e-9: fit aggregates through exact-decimal product
    // sums (decProd rounds each product at 1e-10 so the model is
    // partition-order-independent and oracle-checkable); the rounding
    // accumulates through two deflations to ~1e-8 vs the pure-double
    // NIPALS golden.
    golden.foreach { case (s, (g1, g2)) =>
      assert(math.abs(scores(s)._1 - g1) < 1e-7, s"$s lv1")
      assert(math.abs(scores(s)._2 - g2) < 1e-7, s"$s lv2")
    }
  }

  test("Pls imputation: kernel solve matches the primal NIPALS golden") {
    // 4 complete features over 4 samples; g1 missing at s3. Golden
    // imputed value from a primal NIPALS hand computation (the kernel
    // formulation is algebraically identical: t = K yc / sqrt(ycᵀK yc))
    val complete = for {
      (f, vs) <- Seq(
        "f1" -> Seq(1.0, 2.0, 3.0, 4.0),
        "f2" -> Seq(2.0, 1.0, 4.0, 3.0),
        "f3" -> Seq(0.5, 1.5, 2.5, 3.5),
        "f4" -> Seq(4.0, 3.0, 2.0, 1.0))
      (v, i) <- vs.zipWithIndex
    } yield (f, s"s${i + 1}", Option(v))
    val rows = complete ++ Seq(
      ("g1", "s1", Some(10.0)), ("g1", "s2", Some(20.0)),
      ("g1", "s3", None), ("g1", "s4", Some(40.0)))
    val out = graft.ops.Impute.pls(spark,
        rows.toDF("id", "sample", "value"), "id", "sample", "value")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (Option(r.getAs[java.lang.Double]("value")).map(_.toDouble), r.getBoolean(3))).toMap
    // observed slots untouched, not flagged
    assert(out(("g1", "s1")) == (Some(10.0), false))
    assert(out(("f1", "s2")) == (Some(2.0), false))
    // the missing slot gets the in-sample PLS prediction
    val (imp, flag) = out(("g1", "s3"))
    assert(flag && math.abs(imp.get - 22.5) < 1e-9, s"imputed $imp")
    // a feature with zero observations stays null
    val rows2 = complete ++ Seq(("h1", "s1", Option.empty[Double]))
    val h = graft.ops.Impute.pls(spark, rows2.toDF("id", "sample", "value"))
      .collect().filter(_.getString(0) == "h1")
    assert(h.length == 1 && h.head.isNullAt(2) && !h.head.getBoolean(3))
  }

  test("gaussian imputation: observed preserved, imputed deterministic + downshifted") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 400).map { i =>
      val v = if (i % 4 == 0) None else Some(20.0 + rng.nextGaussian())
      (i, "s1", v)
    }
    val df = rows.toDF("id", "sample", "value")
    val out1 = Impute.gaussian(df, "sample", "value", seed = 42L)
      .select("id", "value", "was_imputed").as[(Int, Double, Boolean)].collect()
    val out2 = Impute.gaussian(df, "sample", "value", seed = 42L)
      .select("id", "value", "was_imputed").as[(Int, Double, Boolean)].collect()
    // determinism under a fixed seed
    assert(out1.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
    val byId = out1.map(r => r._1 -> r).toMap
    rows.foreach {
      case (i, _, Some(v)) => assert(byId(i)._2 == v && !byId(i)._3)
      case (i, _, None) => assert(byId(i)._3)
    }
    // imputed mean ≈ μ - 1.8σ (σ≈1, μ≈20) → around 18.2, and below observed mean
    val imputed = out1.filter(_._3).map(_._2)
    val mImp = imputed.sum / imputed.length
    assert(mImp < 19.5 && mImp > 16.5)
  }
}
