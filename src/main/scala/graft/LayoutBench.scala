package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout A/B harness: the same operator body timed against
  * (a) the plain parquet table and (b) a key-bucketed catalog table
  * (Skew.writeBucketed), reporting wall time and the number of shuffle
  * exchanges in each executed plan. First (and motivating) case: the
  * q_kruskal_wallis chain, whose every stage — tie groupBys, the
  * per-supplier rank window, the stitch join — is keyed by l_suppkey,
  * the exact shape bucketing co-locates (BENCH_NOTES round-14
  * "q_kruskal_wallis follow-up": the plan is shuffle-volume-linear;
  * the remaining lever is layout, not plan).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.LayoutBench
  * Prints one JSON line:
  * {"metric":"layout_ab","plain_sec":…,"bucketed_sec":…,
  *  "plain_exchanges":N,"bucketed_exchanges":M,"write_sec":…,"rows":R}
  * The one-time bucketed write is reported separately — it amortizes
  * across every later suppkey-keyed job, which is the layout contract.
  */
object LayoutBench {
  private def countExchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  /** Order-independent CONTENT checksum + row count: sum of xxhash64
    * over every output column, summed exactly (decimal(38,0) — ANSI
    * mode throws on a long-sum overflow, and a wrap would weaken the
    * check anyway). Row counts alone would pass a layout-induced
    * result difference that preserves cardinality. */
  private def checksum(df: DataFrame): (java.math.BigDecimal, Long) = {
    val r = df.agg(
      coalesce(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO)).as("h"),
      count(lit(1)).as("n")).head()
    (r.getDecimal(0), r.getLong(1))
  }

  private def kruskal(li: DataFrame): DataFrame =
    graft.stats.StatTests.kruskalWallis(
      li.select(col("l_suppkey"), col("l_returnflag"), col("l_quantity")),
      Seq("l_suppkey"), "l_returnflag", "l_quantity")
      .filter(col("k") >= 2)
      .drop("p")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val wh = java.nio.file.Files.createTempDirectory("graft_layout_wh").toString
    val spark = Sessions.production(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", wh),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val plainLi = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_returnflag"), col("l_quantity"))

    // warm the page cache so the A/B compares execution, not first-read IO
    plainLi.count()

    val (_, writeSec) = timed {
      graft.ops.Skew.writeBucketed(plainLi, "lineitem_by_suppkey", "l_suppkey", cpus)
    }
    val bucketedLi = spark.table("lineitem_by_suppkey")

    val planPlain = kruskal(plainLi)
    val planBucketed = kruskal(bucketedLi)
    val exPlain = countExchanges(planPlain)
    val exBucketed = countExchanges(planBucketed)

    // interleaved samples, median
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val samples = (1 to 3).map { _ =>
      val ((h1, n1), tPlain) = timed(checksum(kruskal(plainLi)))
      val ((h2, n2), tBuck) = timed(checksum(kruskal(bucketedLi)))
      require(n1 == n2 && h1.compareTo(h2) == 0,
        s"layout changed the result: rows $n1 vs $n2, checksum $h1 vs $h2")
      (tPlain, tBuck, n1)
    }
    val rows = samples.head._3
    println(
      s"""{"metric":"layout_ab","plain_sec":${med(samples.map(_._1))},""" +
      s""""bucketed_sec":${med(samples.map(_._2))},""" +
      s""""plain_exchanges":$exPlain,"bucketed_exchanges":$exBucketed,""" +
      s""""write_sec":$writeSec,"rows":$rows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
