package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QValuesSpec extends SparkSpec {
  import spark.implicits._

  test("BH q-values match numpy golden (incl. backward cummin)") {
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.5), ("e", 0.04))
      .toDF("id", "p")
    val out = QValues.qvalues(df, "p").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("q")).toMap
    // golden: q = [0.05, 0.05, 0.05, 0.5, 0.05]
    assert(approx(out("a"), 0.05, 1e-12))
    assert(approx(out("b"), 0.05, 1e-12))
    assert(approx(out("c"), 0.05, 1e-12))
    assert(approx(out("d"), 0.5, 1e-12))
    assert(approx(out("e"), 0.05, 1e-12))
  }

  test("bucketed result equals single-partition window formulation") {
    val rng = new scala.util.Random(7)
    val df = (1 to 500).map(i => (i, rng.nextDouble())).toDF("id", "p")
    val fast = QValues.qvalues(df, "p", numBuckets = 16)
      .select("id", "q").as[(Int, Double)].collect().toMap
    // naive reference: one-partition window
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("p"))
    val m = df.count().toDouble
    val naive = df
      .withColumn("rnk", row_number().over(w))
      .withColumn("raw", lit(m) * col("p") / col("rnk"))
      .withColumn("q", least(
        min(col("raw")).over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)),
        lit(1.0)))
      .select("id", "q").as[(Int, Double)].collect().toMap
    naive.foreach { case (id, q) =>
      assert(approx(fast(id), q, 1e-12), s"id=$id fast=${fast(id)} naive=$q")
    }
  }

  test("tied p-values receive identical q") {
    val df = Seq(("a", 0.02), ("b", 0.02), ("c", 0.01), ("d", 0.9)).toDF("id", "p")
    val out = QValues.qvalues(df, "p").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("q")).toMap
    assert(out("a") == out("b"))
  }

  test("q >= p (pi0=1) and q monotone in p") {
    val rng = new scala.util.Random(11)
    val df = (1 to 200).map(i => (i, rng.nextDouble())).toDF("id", "p")
    val rows = QValues.qvalues(df, "p")
      .select("p", "q").as[(Double, Double)].collect().sortBy(_._1)
    rows.foreach { case (p, q) => assert(q >= p - 1e-12 && q <= 1.0) }
    rows.sliding(2).foreach {
      case Array((_, q1), (_, q2)) => assert(q2 >= q1 - 1e-12)
      case _ =>
    }
  }

  test("storeyPi0 is in (0,1] and ~1 for uniform p") {
    val rng = new scala.util.Random(3)
    val df = (1 to 2000).map(i => (i, rng.nextDouble())).toDF("id", "p")
    val pi0 = QValues.storeyPi0(df, "p")
    assert(pi0 > 0.5 && pi0 <= 1.0) // uniform p ⇒ pi0 near 1
  }
}
