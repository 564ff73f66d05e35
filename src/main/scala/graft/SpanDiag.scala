package graft
// temporary round-9 diagnostic: selection-vs-join cost split at scale
object SpanDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"DIAG $label: ${(System.nanoTime()-t0)/1e9}%.1f s (n=$n)")
    }
    for (mode <- Seq(true, false, true, false)) {
      val m = if (mode) "rolling" else "md5    "
      t(s"selection $m") {
        docs.select(explode(graft.functions.TextHashExpressions.winnowingGrams(
          col("text"), 12, 4, mode)).as("g")).count()
      }
    }
    t("full sharedSpanPairs rolling") {
      graft.text.Dedup.sharedSpanPairs(docs, "doc_id", "text", 12, 4, 64L, 2L, true).count()
    }
    spark.stop()
  }
}
