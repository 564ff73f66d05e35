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

  test("QC/localization/histogram/box/rank data contracts") {
    val df = Seq(
      (1, "", "", 0.9, Some(10.0)),
      (2, "+", "", 0.8, Some(5.0)),
      (3, "", "+", 0.6, Some(0.0)),
      (4, "", "", 0.4, None),
      (5, "", "", 0.1, Some(2.0))
    ).toDF("id", "Reverse", "Potential contaminant", "Localization prob", "Intensity A")

    val qc = Padua.quality_control(df).head()
    assert(qc.getAs[Long]("total") == 5)
    assert(qc.getAs[Long]("n_Reverse") == 1)
    assert(qc.getAs[Long]("n_Potential contaminant") == 1)
    assert(qc.getAs[Long]("filtered") == 3) // ids 1, 4, 5 survive both flags
    assert(qc.getAs[Long]("quantified") == 2) // of those, non-zero intensity: 1, 5

    val ml = Padua.modificationlocalization(df).head()
    assert(ml.getAs[Long]("class_i") == 2) // 0.9, 0.8
    assert(ml.getAs[Long]("class_ii") == 1) // 0.6
    assert(ml.getAs[Long]("class_iii") == 1) // 0.4; 0.1 excluded

    val ev = Seq(
      ("e1", "Phospho (STY) x2", 10.0), ("e1", "Unmodified", 30.0),
      ("e2", "Phospho (STY)", 5.0)
    ).toDF("Experiment", "Modifications", "Intensity")
    val en = Padua.enrichment_from_evidence(ev, "Modifications", "Experiment",
        "Intensity", "Phospho (STY)")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("enrichment")).toMap
    assert(approx(en("e1"), 0.25) && approx(en("e2"), 1.0))

    val cd = Padua.comparedist(
      Seq(0.1, 0.2).toDF("v"), Seq(0.9).toDF("v"), "v", bins = 10)
    val cm = cd.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cm(("a", 2L)) == 1 && cm(("a", 3L)) == 1 && cm(("b", 10L)) == 1)

    val bx = Padua.box(Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("grp", "v"),
      Seq("grp"), "v").head()
    assert(bx.getAs[Double]("med") == 2.0 && bx.getAs[Long]("n") == 3)

    val ri = Padua.rankintensity(
      Seq((1L, 10.0), (2L, 1000.0), (3L, 0.0)).toDF("id", "Intensity"),
      "id", "Intensity")
    val byId = ri.collect().map(r =>
      r.getAs[Long]("id") -> (r.getAs[Long]("rank"), r.getAs[Long]("magnitude"))).toMap
    assert(byId(1L) == (1L, 1L) && byId(2L) == (2L, 3L) && !byId.contains(3L))

    assert(Padua.get_index_list(Seq("a", "b", "c"), Seq("c", "zz", "a")) == Seq(2, 0))
    assert(Padua.build_combined_label(
      Map("p" -> "P07830;P63267", "q" -> "Q1"), Seq("p", "q"), "-") == "P07830-Q1")
    // label_format branch (utils.py:221-222) + template format_label
    assert(Padua.build_combined_label(
      Map("p" -> "P07830;P63267", "q" -> "Q1"), Seq("p", "q"), "-",
      Some("%s (%s)")) == "P07830 (Q1)")
    assert(Seq(("KO", 1)).toDF("g", "r")
      .select(Padua.format_label_fmt("%s_rep%s", $"g", $"r")).head().getString(0) == "KO_rep1")
    val uniq = Padua.get_unique_indices(df, Seq("Reverse"))
    assert(uniq("Reverse").toSet == Set("", "+"))
  }

  test("go_enrichment_process: per-term mean, FDR gate, P-sorted (ref analysis.py:372-384)") {
    val go = Seq(
      ("GO:1", "apoptosis", "P1", 0.01, 0.02),
      ("GO:1", "apoptosis", "P2", 0.03, 0.04), // mean P = 0.02
      ("GO:2", "transport", "P3", 0.30, 0.40), // gated out by fdr
      ("GO:3", "binding", "P4", 0.001, 0.002)
    ).toDF("GO", "Name", "Gene ID", "P", "FDR")
    val out = Padua.go_enrichment_process(go, fdr = 0.05).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("GO:3", "GO:1")) // sorted by P asc
    assert(math.abs(out(1).getDouble(2) - 0.02) < 1e-12)
    assert(!out.head.schema.fieldNames.contains("Gene ID")) // summary drops it
  }

  test("apply_id_mapping: broadcast pair-table join, unmapped ids keep null") {
    val df = Seq(("A", 1), ("B", 2), ("C", 3)).toDF("pid", "v")
    val mapping = Seq(("A", "kegg:a"), ("B", "kegg:b")).toDF("from_id", "to_id")
    val out = Padua.apply_id_mapping(df, mapping, "pid").collect()
      .map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(out("A").contains("kegg:a") && out("B").contains("kegg:b") && out("C").isEmpty)
  }

  test("venn: 2- and 3-frame intersection (ref visualize.py:979-1033)") {
    val a = Seq(1, 2, 3, 4).toDF("k")
    val b = Seq(3, 4, 5).toDF("k")
    val c = Seq(4, 5, 6).toDF("k")
    assert(Padua.venn(a, b) == 2L)
    assert(Padua.venn(a, b, c) == 1L) // {4}
    // return_intersection=True form yields the ids themselves
    assert(Padua.venn_intersection(a, b).collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 4))
    assert(Padua.venn_intersection(a, b, Some(c)).collect().map(_.getInt(0)).toSeq == Seq(4))
  }
}
