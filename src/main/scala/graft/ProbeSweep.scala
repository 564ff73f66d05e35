package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** nProbe recall/cost sweep for the quantized IVF serving stack
  * (round-13 verdict task 6): ivfpq_refined recall at nProbe 4/8/16
  * against its own IVF ceiling, PLUS the measured serve cost of
  * `Pq.ivfPqTopKRefined` at each probe width — the curve that picks
  * the production operating point (target ≥0.85 recall at <2× the
  * nProbe=4 serve cost). One JSON line per nProbe, recorded in
  * BENCH_NOTES.md.
  *
  * Config matches the BENCH_NOTES r13 recall matrix row
  * (production-pq-m16: m=16, codebookK=256, pqSampleN=16384,
  * pqIters=10, refineK=200, nCells=16) so the nProbe=4 row reproduces
  * the r13 baseline and the sweep isolates the probe-width knob.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProbeSweep [nProbe...]
  */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nProbes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 8, 16)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val queryIds = Seq(0L, 7L, 42L, 99L, 123L, 250L, 333L, 444L)
    import graft.sim.AnnRecall.AnnConfig
    val base = AnnConfig(m = 16, codebookK = 256,
      pqSampleN = 16384, pqIters = 10, refineK = 200)

    // serve-cost leg: ONE index + codebook fit shared across the sweep
    // (the serving shape — nProbe is a query-time knob, not an index
    // rebuild), then per-nProbe warmed single-query walls
    val (assigned0, cents) =
      graft.sim.Similarity.ivfIndex(emb, "vec_id", "embedding", base.nCells)
    val model = graft.sim.Pq.fit(emb, "embedding", dim = 64,
      base.m, base.codebookK, maxIter = base.pqIters, sampleN = base.pqSampleN)
    val encodedAssigned = graft.sim.Pq.encodeNative(assigned0, "embedding", model)
      .persist(graft.ops.Caches.memoLevel(spark))
    encodedAssigned.count() // materialize before timing
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("q"))
      .collect().map(_.getSeq[Double](1).toArray).toSeq

    def serveWall(nProbe: Int): Double = {
      def one(q: Array[Double]) = graft.sim.Pq.ivfPqTopKRefined(
        encodedAssigned, emb, "vec_id", "embedding", model, q,
        graft.sim.Similarity.probeCells(cents, q, nProbe), k = 20, poolK = base.refineK)
      one(queries.head).collect() // warm codegen/planning for this shape
      val t0 = System.nanoTime()
      queries.foreach(q => one(q).collect())
      (System.nanoTime() - t0) / 1e9 / queries.size
    }

    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    for (np <- nProbes) {
      val r = graft.sim.AnnRecall.measure(
        emb, "vec_id", "embedding", dim = 64, queryIds, k = 20,
        base.copy(nProbe = np))
      val wall = serveWall(np)
      val recalls = r.toSeq.sortBy(_._1)
        .map { case (m, v) => s""""$m":${f(v)}""" }.mkString(",")
      println(s"""{"metric":"ivf_probe_sweep","nProbe":$np,"nCells":${base.nCells},""" +
        s""""m":${base.m},"codebookK":${base.codebookK},"refineK":${base.refineK},""" +
        s""""k":20,$recalls,"serve_sec_per_query":${f(wall)},"sf":"$sfDir"}""")
    }
    encodedAssigned.unpersist()
    spark.stop()
  }
}
