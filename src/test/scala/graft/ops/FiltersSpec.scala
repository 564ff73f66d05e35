package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, Some("+"), Some("x"), Some(0.9), Some(1.0)),
    (2, None, Some("keep+me"), Some(0.5), None),
    (3, Some(""), None, None, Some(3.0)),
    (4, Some("+"), Some("y"), Some(0.76), Some(4.0))
  ).toDF("id", "Reverse", "name", "Localization prob", "value")

  test("removeRowsMatching keeps null rows (pandas != semantics)") {
    val out = Filters.removeRowsMatching(df, "Reverse", "+")
    assert(out.select("id").as[Int].collect().sorted.toSeq == Seq(2, 3))
  }

  test("removeRowsContaining keeps null rows") {
    val out = Filters.removeRowsContaining(df, "name", "+")
    assert(out.select("id").as[Int].collect().sorted.toSeq == Seq(1, 3, 4))
  }

  test("removeReverse drops '+' flagged decoys only") {
    val out = Filters.removeReverse(df)
    assert(out.select("id").as[Int].collect().sorted.toSeq == Seq(2, 3))
  }

  test("removeContaminants resolves first existing candidate column") {
    val d2 = df.withColumnRenamed("name", "Potential contaminant")
    val out = Filters.removeContaminants(d2)
    // only exact '+' matches are removed; 'keep+me' stays (== match, not contains)
    assert(out.count() == 4)
    val d3 = d2.withColumn("Potential contaminant",
      when(col("id") === 1, "+").otherwise(col("Potential contaminant")))
    assert(Filters.removeContaminants(d3).select("id").as[Int].collect().sorted.toSeq == Seq(2, 3, 4))
  }

  test("filterLocalizationProbability >= threshold, nulls dropped") {
    val out = Filters.filterLocalizationProbability(df)
    assert(out.select("id").as[Int].collect().sorted.toSeq == Seq(1, 4))
  }

  test("search matches any column null-safely") {
    val out = Filters.search(df, "y", Seq("name", "Reverse"))
    assert(out.select("id").as[Int].collect().sorted.toSeq == Seq(4))
  }

  test("selectColumnsMatching keeps metadata first plus regex matches") {
    val wide = Seq((1, 1.0, 2.0, "m")).toDF("id", "Intensity A", "Intensity B", "meta")
    val out = Filters.selectIntensityColumns(wide, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "Intensity A", "Intensity B"))
    assert(Filters.filterExclude(wide, "Intensity").columns.toSeq == Seq("id", "meta"))
  }

  test("minimumValidValuesInAnyGroup keeps features with >=n in any group") {
    val long = Seq(
      ("f1", "g1", Some(1.0)), ("f1", "g1", Some(2.0)), ("f1", "g2", None),
      ("f2", "g1", Some(1.0)), ("f2", "g2", Some(2.0)),
      ("f3", "g1", None), ("f3", "g2", None)
    ).toDF("id", "group", "value")
    val out = Filters.minimumValidValuesInAnyGroup(long, Seq("id"), Seq("group"), "value", 2L)
    assert(out.select("id").distinct().as[String].collect().sorted.toSeq == Seq("f1"))
  }
}
