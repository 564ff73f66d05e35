package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.TrainingData
import graft.streaming.{CompactionScheduler, DedupIndexMaintenance, DocStream}
import graft.text.DedupIndex

/** Measured face of the index-backed streaming ingest loop
  * (verdict-14 item 5): `DocStream.ingestWithNearDupIndex` is
  * spec-proven but its scale contract — per-epoch probe latency is
  * batch-proportional, NOT corpus-proportional — was never measured.
  * This harness drives the same epoch body the foreachBatch wrapper
  * runs ([[DocStream.ingestBatchVersioned]], so the
  * [[DedupIndexMaintenance]] compaction driver is in the loop too)
  * over the documents table sliced into `SPARK_GRAFT_INGEST_EPOCHS`
  * equal arrival waves, and reports per-epoch wall, survivors, and
  * index size. If the per-epoch wall GROWS with the corpus while
  * batch sizes stay flat, the probe broke its contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.IngestBench
  * Prints one JSON line:
  * {"metric":"ingest_bench","epochs":[{"epoch":0,"batch_rows":…,
  *  "kept":…,"wall_sec":…,"index_docs":…},…],"total_sec":…,
  *  "docs_per_sec":…,"compactions":N,"sf":…}
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val epochs = sys.env.getOrElse("SPARK_GRAFT_INGEST_EPOCHS", "10").toInt
    val spark = Sessions.production(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = java.nio.file.Files.createTempDirectory("graft_ingest_bench").toString
    val root = s"$scratch/idx"
    val sink = s"$scratch/sink"
    // accept every language the fixture carries: the bench measures the
    // dedup/probe machinery, not the language gate's selectivity
    val langs = Tables.documents(spark, sfDir)
      .select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    val cfg = TrainingData.CurationConfig(minQuality = 0.0, langs = langs, minTokens = 1)
    val maint = new DedupIndexMaintenance(spark, root,
      scheduler = new CompactionScheduler(targetUtilization = 0.5, minPeriodSec = 30.0))

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val totalDocs = docs.count() // also warms the page cache

    val rows = (0 until epochs).map { e =>
      val batch = docs.filter(pmod(col("doc_id"), lit(epochs)) === e)
      val batchRows = batch.count()
      val t0 = System.nanoTime()
      val kept = DocStream.ingestBatchVersioned(
        batch, e.toLong, "doc_id", "text", root, sink, cfg,
        threshold = cfg.nearDupJaccard, maintenance = Some(maint))
      val wall = (System.nanoTime() - t0) / 1e9
      val live = DedupIndex.resolveCurrent(spark, root).get
      val indexDocs = spark.read.parquet(s"$root/$live/sigs").count()
      (e, batchRows, kept, wall, indexDocs)
    }
    val total = rows.map(_._4).sum
    def f(d: Double) = math.round(d * 1000) / 1000.0
    val epochJson = rows.map { case (e, b, k, w, i) =>
      s"""{"epoch":$e,"batch_rows":$b,"kept":$k,"wall_sec":${f(w)},"index_docs":$i}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"metric":"ingest_bench","epochs":$epochJson,""" +
      s""""total_sec":${f(total)},"docs_per_sec":${f(totalDocs / total)},""" +
      s""""compactions":${maint.compactions.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
