package graft.ops

import graft.SparkSpec

class StitchSpec extends SparkSpec {
  import spark.implicits._

  private def summary = Seq((0, 10L), (1, 5L), (3, 7L)).toDF("k", "n")

  test("cumulativeBefore: exclusive running sum, 0 for the first key, gaps fine") {
    val out = Stitch.cumulativeBefore(summary, "k", "n", "off")
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out == Map(0 -> 0L, 1 -> 10L, 3 -> 15L))
  }

  test("minAfter: suffix min over later keys, null for the last") {
    val s = Seq((0, 3.0), (1, 1.0), (2, 2.0)).toDF("k", "v")
    val out = Stitch.minAfter(s, "k", "v", "m")
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out == Map(0 -> Some(1.0), 1 -> Some(2.0), 2 -> None))
  }

  test("plans contain no window at all") {
    val p = Stitch.cumulativeBefore(summary, "k", "n", "off")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
  }
}
