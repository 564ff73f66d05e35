package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the measured ANN recall@k matrix (graft.sim.AnnRecall) for a
  * SF dir — one JSON line per config. Numbers are recorded per round in
  * BENCH_NOTES.md. Usage: runMain graft.RecallAudit [sfDir] */
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val queryIds = Seq(0L, 7L, 42L, 99L, 123L, 250L, 333L, 444L)
    import graft.sim.AnnRecall.AnnConfig
    val configs = Seq(
      "defaults" -> AnnConfig(),
      "recall-leaning" -> AnnConfig(numPlanes = 6, numTables = 6, nProbe = 8),
      "speed-leaning" -> AnnConfig(numPlanes = 10, numTables = 2, nProbe = 2),
      // the PQ production remedy (round-12 verdict item 2): the
      // faiss-standard k=256 codebooks fit on 64 samples/centroid,
      // PLUS the refine stage (exact re-rank over the ADC top-200
      // pool — Pq.adcTopKRefined) that production quantized serving
      // actually ships; tiny k=16 codebooks remain an oracle
      // constraint, not a default
      "production-pq" ->
        AnnConfig(codebookK = 256, pqSampleN = 16384, pqIters = 10, refineK = 200),
      "production-pq-m16" ->
        AnnConfig(m = 16, codebookK = 256, pqSampleN = 16384, pqIters = 10, refineK = 200))
    val selected = args.drop(1) // optional config-label filter
    for ((label, cfg) <- configs if selected.isEmpty || selected.contains(label)) {
      val r = graft.sim.AnnRecall.measure(
        emb, "vec_id", "embedding", dim = 64, queryIds, k = 20, cfg)
      val js = r.toSeq.sortBy(_._1)
        .map { case (m, v) => s""""$m":${"%.3f".formatLocal(java.util.Locale.ROOT, v)}""" }
        .mkString(",")
      println(s"""{"config":"$label","planes":${cfg.numPlanes},"tables":${cfg.numTables},"nProbe":${cfg.nProbe},"m":${cfg.m},"codebookK":${cfg.codebookK},"k":20,$js,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
