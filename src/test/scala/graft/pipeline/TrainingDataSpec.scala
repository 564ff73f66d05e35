package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog and runs to the river bank"
  private val nearDupOfGood = good.replace("today", "tonight") + " now"
  private val junk = "!!!" * 20
  private val short = "the cat"
  private val german = "der hund und die katze ist hier und der vogel singt in der luft heute"

  test("curate gates quality/lang/length, removes exact and near dups") {
    val docs = Seq(
      (1L, good),
      (2L, good), // exact dup of 1
      (3L, good + " extra tail words here"), // near dup of 1
      (4L, junk),
      (5L, short),
      (6L, german),
      (7L, "completely different english text about query engines shuffles and the big table scans")
    ).toDF("doc_id", "text")
    val (kept, reasons) = TrainingData.curate(docs, "doc_id", "text",
      TrainingData.CurationConfig(minQuality = 0.3, langs = Set("en"),
        minTokens = 5, nearDupJaccard = 0.6))
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L))
    assert(!ids.contains(2L), "exact dup survived")
    assert(!ids.contains(3L), "near dup survived")
    assert(!ids.contains(4L), "junk survived")
    assert(!ids.contains(5L), "too-short survived")
    assert(!ids.contains(6L), "non-english survived")
    assert(ids.contains(7L))
    val r = reasons.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.getOrElse("language", 0L) >= 1L)
    // "the cat" trips the quality gate before the length gate (reason
    // chain checks quality first); junk + short both land there
    assert(r.getOrElse("low_quality", 0L) >= 2L)
  }
}
