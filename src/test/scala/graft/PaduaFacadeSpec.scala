package graft

import org.apache.spark.sql.functions._

/** Smoke the reference-named facade: a padua user's call chain works
  * verbatim (modulo the long-form data model). */
class PaduaFacadeSpec extends SparkSpec {
  import spark.implicits._

  test("reference-named chain: filters -> expand -> qvalues -> volcano") {
    val df = Seq(
      (1, "", "", 0.9, Some(10.0), Some(11.0)),
      (2, "+", "", 0.9, Some(10.0), Some(11.0)),
      (3, "", "+", 0.9, Some(10.0), Some(11.0)),
      (4, "", "", 0.2, Some(10.0), Some(11.0))
    ).toDF("id", "Reverse", "Potential contaminant", "Localization prob",
      "Intensity A___1", "Intensity B___1")

    val cleaned = Padua.filter_localization_probability(
      Padua.remove_contaminants(Padua.remove_reverse(df)))
    assert(cleaned.select("id").as[Int].collect().toSeq == Seq(1))

    val expanded = Padua.expand_side_table(cleaned)
    assert(expanded.count() == 3) // ___1..___3 branches, absent ones null-padded

    val p = Seq(("x", 0.01), ("y", 0.4)).toDF("k", "p")
    val q = Padua.qvalues(p, "p").select("k", "q").as[(String, Double)].collect().toMap
    assert(approx(q("x"), 0.02, 1e-12))

    val long = Seq(
      ("f", "A", 1.0), ("f", "A", 1.1), ("f", "A", 0.9),
      ("f", "B", 9.0), ("f", "B", 9.1), ("f", "B", 8.9)
    ).toDF("id", "group", "value")
    val v = Padua.volcano(long, Seq("id"), "group", "value", "A", "B",
      minValidN = 3, s0 = 0.1, minRatio = 1.0, minP = 0.05)
    assert(v.filter(col("significant")).count() == 1)
  }
}
