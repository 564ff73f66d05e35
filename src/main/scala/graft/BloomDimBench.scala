package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.BloomPrune
import graft.stats.Moments

/** Dim-regime A/B for the Bloom semi-join's exact false-positive-
  * removal tail (verdict-14 item 3): at the gate SFs the filtered dim
  * broadcasts, but at sf100's ~4M filtered keys Spark transitions the
  * exact join broadcast→SMJ, which SORTS the pruned fact stream — the
  * r14 decade run measured that tail at exponent 1.21 vs the 0.92 scan
  * baseline. This harness times the IDENTICAL q_bloom_prune_join body
  * under the dim-side strategies (planner default, shuffle_hash hint,
  * merge hint) with content-checksum equality enforced, LayoutBench
  * style.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BloomDimBench
  * Prints one JSON line:
  * {"metric":"bloom_dim_ab","default_sec":…,"shuffle_hash_sec":…,
  *  "merge_sec":…,"rows":R,"sf":…}
  */
object BloomDimBench {
  private def body(s: SparkSession, d: String, dimHint: Option[String]): DataFrame = {
    val dim = Tables.part(s, d).filter(col("p_size") <= 10)
    val nKeys = math.max(64L, dim.count())
    val nBits = math.min(BloomPrune.MaxBits.toLong,
      java.lang.Long.highestOneBit(nKeys * 16) * 2).toInt
    BloomPrune.semiJoin(
      Tables.lineitem(s, d), "l_partkey", dim, "p_partkey", nBits,
      dimHint = dimHint)
      .groupBy(col("l_returnflag"))
      .agg(
        Moments.sumExactInt(col("l_quantity")).as("sum_qty"),
        Moments.sumExactMoney(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n"))
  }

  private def checksum(df: DataFrame): (java.math.BigDecimal, Long) = {
    val r = df.agg(
      coalesce(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO)).as("h"),
      count(lit(1)).as("n")).head()
    (r.getDecimal(0), r.getLong(1))
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.production(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the page cache so the A/B compares execution, not first IO
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice")).count()

    val shapes = Seq(
      "default" -> None,
      "shuffle_hash" -> Some("shuffle_hash"),
      "merge" -> Some("merge"))
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    // interleaved samples so host drift hits every shape equally
    val samples = (1 to 3).map { _ =>
      shapes.map { case (name, hint) =>
        val ((h, n), t) = timed(checksum(body(spark, sfDir, hint)))
        (name, h, n, t)
      }
    }
    val ref = samples.head.head
    samples.flatten.foreach { case (name, h, n, _) =>
      require(n == ref._3 && h.compareTo(ref._2) == 0,
        s"dim hint '$name' changed the result: rows $n vs ${ref._3}")
    }
    val byShape = shapes.map { case (name, _) =>
      name -> med(samples.map(_.find(_._1 == name).get._4))
    }
    println(
      "{\"metric\":\"bloom_dim_ab\"," +
      byShape.map { case (k, v) => s""""${k}_sec":${math.round(v * 1000) / 1000.0}""" }
        .mkString(",") +
      s""","rows":${ref._3},"sf":"$sfDir"}""")
    spark.stop()
  }
}
