package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the span-family cost split at a given SF dir —
  * not part of the driver contract; safe to delete. Run:
  * SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt "runMain graft.SpanProfile"
  */
object SpanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "64"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[profile] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    val docs = Tables.documents(spark, sfDir)
    // JVM/scan warmup
    consume(docs.select(col("doc_id")))

    // replicate Dedup.selectedGrams / gramDocFreq / spanPairJoin
    // (object-private) with the library's own public building blocks
    val k = 12; val w = 4; val maxDf = 64L
    def selGrams() = docs.select(
      col("doc_id"),
      explode(graft.functions.TextHashExpressions.winnowing(
        col("text"), k, w, rolling = true)).as("_gram"))
    def pairJoin(pruned: org.apache.spark.sql.DataFrame) = {
      pruned.as("a")
        .join(pruned.as("b"),
          col("a._gram") === col("b._gram") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2L)
    }
    t("selection scan (fresh, no persist)") { consume(selGrams()) }
    t("selection scan again (recompute baseline)") { consume(selGrams()) }
    val sel = selGrams()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("selection persist + materialize") { consume(sel) }
    val sizes = sel.groupBy(col("_gram")).agg(count(lit(1)).as("_df"))
    t("gram doc-freq histogram over cached sel") { consume(sizes) }
    val pruned = graft.ops.PairBudget.capPrune(
      sel, sizes, "_df", Seq("_gram"), maxDf)
    t("capPrune over cached sel") { consume(pruned) }
    t("pair join (cap=maxDf)") { consume(pairJoin(pruned)) }
    t("pair join AGAIN (warm)") { consume(pairJoin(pruned)) }
    // Does an independently-built identical selection plan hit the cache?
    val sel2 = selGrams()
    val hits = sel2.queryExecution.withCachedData.toString.contains("InMemoryRelation")
    println(s"[profile] identical fresh selection plan uses cache: $hits")
    t("fresh identical selection consume (cache sub?)") { consume(sel2) }
    spark.stop()
  }
}
