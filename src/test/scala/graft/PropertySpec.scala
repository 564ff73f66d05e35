package graft

import graft.ops.{Filters, Impute, Normalize, Reshape}
import graft.stats.QValues
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.2.3) using raw ScalaCheck
  * generators sampled under fixed seeds (the scalatest bridge artifact
  * is not in the offline cache). Each case runs Spark jobs, so cases
  * are few and frames small. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val rowGen: Gen[List[(Int, String, Option[Double])]] =
    Gen.listOfN(25, for {
      id <- Gen.choose(1, 8)
      flag <- Gen.oneOf("A", "B", "C")
      v <- Gen.option(Gen.choose(-50.0, 50.0))
    } yield (id, flag, v))

  test("property: filters are conservative (filtered ⊆ input)") {
    samples(rowGen, 5).foreach { rows =>
      val df = rows.toDF("id", "flag", "value")
      val out = Filters.removeRowsMatching(df, "flag", "A")
      assert(out.count() <= df.count())
      assert(out.except(df).count() == 0) // no invented rows
    }
  }

  test("property: expandSideTable row count = rows × present multiplicities; ids bijective") {
    val gen = for {
      vs <- Gen.nonEmptyListOf(Gen.choose(0.0, 9.0))
      mults <- Gen.choose(1, 3)
    } yield (vs.take(10), mults)
    samples(gen, 5).foreach { case (vs, mults) =>
      val suffixes = (1 to mults).map(k => s"___$k")
      val cols = suffixes.map(s => s"Intensity X$s")
      val df = vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v0")
      val wide = cols.foldLeft(df) { (acc, c) => acc.withColumn(c, col("v0")) }.drop("v0")
      val out = Reshape.expandSideTable(wide, suffixes)
      assert(out.count() == vs.length.toLong * mults)
      // id___k values are unique (bijection input×suffix → output)
      assert(out.select("id").distinct().count() == vs.length.toLong * mults)
    }
  }

  test("property: q-values are monotone in p, >= p (pi0=1), <= 1") {
    samples(Gen.listOfN(40, Gen.choose(0.0, 1.0)), 5).foreach { ps =>
      val df = ps.zipWithIndex.map { case (p, i) => (i, p) }.toDF("id", "p")
      val out = QValues.qvalues(df, "p").select("p", "q")
        .as[(Double, Double)].collect().sortBy(_._1)
      out.foreach { case (p, q) =>
        assert(q >= p - 1e-12 && q <= 1.0 + 1e-12)
      }
      out.sliding(2).foreach {
        case Array((_, q1), (_, q2)) => assert(q2 >= q1 - 1e-12)
        case _ =>
      }
    }
  }

  test("property: median-centered samples have median 0") {
    samples(rowGen, 5).foreach { rows =>
      val df = rows.toDF("id", "sample", "value")
      val centered = Normalize.subtractColumnMedian(df, "sample", "value")
      val meds = centered.filter(col("value").isNotNull)
        .groupBy(col("sample")).agg(expr("median(value)").as("m"))
        .as[(String, Double)].collect()
      meds.foreach { case (_, m) => assert(math.abs(m) < 1e-9) }
    }
  }

  test("property: imputation preserves observed cells exactly") {
    samples(rowGen, 5).foreach { rows =>
      val df = rows.toDF("id", "sample", "value")
      val out = Impute.gaussian(df, "sample", "value", seed = 1L)
        .select(col("id"), col("sample"), col("value"), col("was_imputed"))
        .collect()
      val observed = rows.collect { case (id, s, Some(v)) => (id, s, v) }
      val outTriples = out.filter(!_.getBoolean(3))
        .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      assert(outTriples.sorted.toSeq == observed.sorted.toSeq)
    }
  }
}
