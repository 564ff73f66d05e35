package graft

import graft.ops.{Filters, Impute, Normalize, TemporalJoin}
import graft.stats.{QValues, StatTests, Volcano}
import graft.text.Dedup
import graft.pipeline.TrainingData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior: empty frames, all-null values, absent
  * groups, single observations. Operators must return empty/null
  * results, not throw. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyLong = Seq.empty[(String, String, Option[Double])]
    .toDF("id", "sample", "value")

  test("qvalues on empty and all-null input") {
    assert(QValues.qvalues(Seq.empty[(Int, Double)].toDF("id", "p"), "p").count() == 0)
    val allNull = Seq((1, Option.empty[Double]), (2, None)).toDF("id", "p")
    assert(QValues.qvalues(allNull, "p").count() == 0) // null p rows are not tests
  }

  test("tTestInd with an absent group yields null t, not an error") {
    val df = Seq(("f", "A", 1.0), ("f", "A", 2.0)).toDF("id", "group", "value")
    val r = StatTests.tTestInd(df, Seq("id"), "group", "value", "A", "B").head()
    assert(r.getAs[Long]("n_b") == 0L)
    assert(r.isNullAt(r.fieldIndex("t")) || r.getAs[Double]("t").isNaN)
  }

  test("tTest1Samp single observation: df=0 -> null p") {
    val df = Seq(("f", 1.5)).toDF("id", "value")
    val r = StatTests.tTest1Samp(df, Seq("id"), "value").head()
    assert(r.getAs[Double]("df") == 0.0)
    assert(r.isNullAt(r.fieldIndex("p")))
  }

  test("volcano on empty input returns empty") {
    assert(Volcano.twoSample(emptyLong, Seq("id"), "sample", "value", "A", "B").count() == 0)
  }

  test("correlationMatrix with one shared observation: r is NaN/null, not a crash") {
    val df = Seq((1, "x", 1.0), (1, "y", 2.0)).toDF("id", "sample", "value")
    val rows = StatTests.correlationMatrix(df, Seq("id"), "sample", "value").collect()
    assert(rows.nonEmpty) // n=1 pairs exist; r = 0/0 = NaN
    rows.foreach { r =>
      val v = r.getAs[Any]("r")
      assert(v == null || v.asInstanceOf[Double].isNaN || !v.asInstanceOf[Double].isInfinite)
    }
  }

  test("median centering and imputation on empty frames") {
    assert(Normalize.subtractColumnMedian(emptyLong, "sample", "value").count() == 0)
    assert(Impute.gaussian(emptyLong, "sample", "value").count() == 0)
  }

  test("imputation with a sample that has zero observed values keeps nulls") {
    val df = Seq(("a", "s1", Option.empty[Double]), ("b", "s1", None))
      .toDF("id", "sample", "value")
    val out = Impute.gaussian(df, "sample", "value").collect()
    // no μ/σ to draw from → value stays null, flagged imputed
    out.foreach { r => assert(r.isNullAt(r.fieldIndex("value"))) }
  }

  test("minimumValidValuesInAnyGroup empty and n=0") {
    assert(Filters.minimumValidValuesInAnyGroup(
      emptyLong, Seq("id"), Seq("sample"), "value", 1L).count() == 0)
    val df = Seq(("f", "g", Option.empty[Double])).toDF("id", "group", "value")
    // n=0: every feature passes (0 >= 0)
    assert(Filters.minimumValidValuesInAnyGroup(
      df, Seq("id"), Seq("group"), "value", 0L).count() == 1)
  }

  test("minhash/simhash on empty text does not throw") {
    val docs = Seq((1L, ""), (2L, "one")).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text").collect()
    assert(sigs.length == 2)
    assert(Dedup.simHash(docs, "doc_id", "text").count() == 2)
  }

  test("curate on empty corpus returns empty + empty reasons") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (kept, reasons) = TrainingData.curate(docs, "doc_id", "text")
    assert(kept.count() == 0)
    assert(reasons.count() == 0)
  }

  test("asOf with empty or null-time right side keeps every left row, null match") {
    val left = Seq(("a", Some(10L), 1), ("a", Option.empty[Long], 2)).toDF("k", "t", "id")
    val emptyRight = Seq.empty[(String, Option[Long], Double)].toDF("k", "t", "v")
    val out1 = TemporalJoin.asOf(left, emptyRight, "k", "t", Seq("v"))
    assert(out1.count() == 2)
    assert(out1.filter(col("asof_v").isNotNull).count() == 0)
    // null-time right rows are ignored; null-time left rows get no match
    val right = Seq(("a", Option.empty[Long], 9.0), ("a", Some(5L), 7.0)).toDF("k", "t", "v")
    val out2 = TemporalJoin.asOf(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getInt(2) -> Option(r.getAs[java.lang.Double]("asof_v"))).toMap
    assert(out2(1).contains(7.0)) // matched the t=5 row, not the null-time row
    assert(out2(2).isEmpty) // null-time left row: no prior right row
  }

  test("countInPrecedingRange with empty right side yields zero counts") {
    val left = Seq(("a", 10L, 1)).toDF("k", "t", "id")
    val right = Seq.empty[(String, Long)].toDF("k", "t")
    val out = TemporalJoin.countInPrecedingRange(left, right, "k", "t", 5L, "n")
    assert(out.head().getAs[Long]("n") == 0L)
  }

  test("hierarchicalTimecourse: constant-profile sites get null z and vanish from means") {
    // site c has zero variance across timepoints → sd=0 → try_divide
    // null z; the cluster means must simply skip those observations
    val rows = Seq(
      ("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0),
      ("b", 1, 1.1), ("b", 2, 2.1), ("b", 3, 3.1),
      ("c", 1, 5.0), ("c", 2, 5.0), ("c", 3, 5.0))
    val tc = graft.pipeline.Pipelines.hierarchicalTimecourse(
      spark, rows.toDF("site", "timepoint", "value"), "site", "timepoint", "value", k = 2)
    val means = tc.means.collect()
    tc.cleanup()
    // no row pools more than the 2 finite-z sites; the degenerate
    // cluster (only the constant site) reports n_sites=0 with a null
    // mean — mirroring pandas' NaN gap — and every populated row is
    // non-null
    assert(means.forall(r => r.getLong(3) <= 2L))
    assert(means.forall(r => (r.getLong(3) == 0L) == r.isNullAt(2)))
    assert(means.exists(r => r.getLong(3) > 0L))
  }

  test("curateFull near-dup frame is empty when no near-dups exist") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near a river bank"),
      (2L, "completely different content about numerical linear algebra methods today")
    ).toDF("doc_id", "text")
    val c = TrainingData.curateFull(docs, "doc_id", "text",
      TrainingData.CurationConfig(minQuality = 0.0, minTokens = 1,
        langs = Set("en", "und", "de", "fr", "es", "zh")))
    assert(c.nearDupRemoved.count() == 0)
    assert(c.kept.count() == 2)
  }

  test("Pls.fit with a y key absent from the frame does not blow up scoring") {
    val long = Seq(
      ("f1", "s1", 1.0), ("f1", "s2", 5.0),
      ("f2", "s1", 2.0), ("f2", "s2", 1.0)).toDF("id", "sample", "value")
    val y = Map("s1" -> 0.0, "s2" -> 1.0, "ghost" -> 1.0)
    val model = graft.ml.Pls.fit(spark, long, y, "id", "sample", "value", nComponents = 1)
    val scores = graft.ml.Pls.scores(spark, model).collect().map(_.getString(0)).toSet
    assert(scores == Set("s1", "s2")) // only samples present in the frame are scored
  }

  test("Impute.plsWithCleanup: cleanup releases the cache and broadcasts after materialization") {
    import spark.implicits._
    val prof = (1 to 20).flatMap { id =>
      Seq("a", "b", "c").map(sm => (id.toString, sm,
        if (id % 5 == 0 && sm == "b") None else Some(id * 1.0 + sm.length)))
    }.toDF("id", "sample", "value")
    // the shared test session carries other suites' caches — assert on
    // the ids this call adds, not on global counts
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, cleanup) = graft.ops.Impute.plsWithCleanup(spark, prof, "id", "sample", "value")
    val n = out.count() // materialize BEFORE cleanup (the handle's contract)
    assert(n == 60L)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty)
    cleanup()
    assert((spark.sparkContext.getPersistentRDDs.keySet & added).isEmpty)
  }

  test("assignCells: exact-tie vectors break to the lowest cell id, deterministically") {
    import spark.implicits._
    // two identical centroids → every distance ties → argmin must pick
    // cell 0 via the struct tie-break, on every row, regardless of
    // partitioning
    val emb = (1L to 50L).map(i => (i, Array.fill(4)(i * 0.5f))).toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 1.0, 1.0, 1.0), Array(1.0, 1.0, 1.0, 1.0),
      Array(9.0, 9.0, 9.0, 9.0))
    val cells = graft.sim.Similarity.assignCells(emb.repartition(7), "embedding", cents)
      .select($"vec_id", $"_cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells.values.forall(c => c == 0 || c == 2)) // never the duplicate cell 1
    val again = graft.sim.Similarity.assignCells(emb.repartition(3), "embedding", cents)
      .select($"vec_id", $"_cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells == again)
  }
}
