package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, time, quote)
  private def quotes = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 10.0)
  ).toDF("k", "t", "quote")

  // (key, time, id)
  private def trades = Seq(
    ("a", 5L, 1), // before any quote -> null
    ("a", 10L, 2), // exactly at quote -> matched (<=)
    ("a", 25L, 3), // between 20 and 30 -> 20
    ("a", 99L, 4), // after all -> 30
    ("b", 14L, 5), // before b's only quote -> null
    ("c", 50L, 6) // key with no right rows -> null
  ).toDF("k", "t", "id")

  test("asOf matches most recent right row at or before left time, per key") {
    val out = TemporalJoin.asOf(trades, quotes, "k", "t", Seq("quote"))
      .select($"id", $"asof_t", $"asof_quote")
      .as[(Int, Option[Long], Option[Double])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1) == (None, None))
    assert(out(2) == (Some(10L), Some(1.0)))
    assert(out(3) == (Some(20L), Some(2.0)))
    assert(out(4) == (Some(30L), Some(3.0)))
    assert(out(5) == (None, None))
    assert(out(6) == (None, None))
    assert(out.size == 6) // left-join: every left row survives exactly once
  }

  test("asOf carries all left columns through") {
    val left = Seq(("a", 25L, 3, "meta")).toDF("k", "t", "id", "extra")
    val row = TemporalJoin.asOf(left, quotes, "k", "t", Seq("quote"))
      .select($"k", $"t", $"id", $"extra", $"asof_quote").head()
    assert(row.getString(0) == "a" && row.getLong(1) == 25L &&
      row.getInt(2) == 3 && row.getString(3) == "meta" && row.getDouble(4) == 2.0)
  }

  test("countInPrecedingRange counts [t-range, t) with same key") {
    val left = Seq(("a", 100L, 1), ("a", 50L, 2), ("b", 100L, 3)).toDF("k", "t", "id")
    val right = Seq(
      ("a", 60L), // outside id=1's [90,100)
      ("a", 99L), // in id=1's [90,100)
      ("a", 100L), // excluded: < t is strict
      ("a", 49L), // in id=2's [40,50)
      ("b", 10L) // outside id=3's [90,100)
    ).toDF("k", "t")
    val out = TemporalJoin
      .countInPrecedingRange(left, right, "k", "t", 10L, "n")
      .select($"id", $"n").as[(Int, Long)].collect().toMap
    assert(out == Map(1 -> 1L, 2 -> 1L, 3 -> 0L))
  }

  test("distributed ntile matches SQL NTILE semantics") {
    val df = (1 to 103).map(i => (i.toLong, (i * 37 % 101).toDouble)).toDF("id", "v")
    val fast = DistributedRank.ntile(df, "v", Seq("id"), 10, numBuckets = 7)
      .select($"id", $"chunk").as[(Long, Int)].collect().toMap
    import org.apache.spark.sql.expressions.Window
    val naive = df.withColumn("chunk", ntile(10).over(Window.orderBy($"v", $"id")))
      .select($"id", $"chunk").as[(Long, Int)].collect().toMap
    assert(fast == naive)
    // n < num: one row per bucket, ranked
    val tiny = Seq((1L, 5.0), (2L, 1.0)).toDF("id", "v")
    val t = DistributedRank.ntile(tiny, "v", Seq("id"), 10)
      .select($"id", $"chunk").as[(Long, Int)].collect().toMap
    assert(t == Map(2L -> 1, 1L -> 2))
  }
}
