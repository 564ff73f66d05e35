package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the batched multi-query ANN serving amortization
  * (AnnIndex.ivfTopKServeBatch / lshTopKServeBatch vs one plan per
  * query): N single-query serves against one N-query batch over the
  * same partition-pruned layouts. Recorded per round in BENCH_NOTES.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.AnnServeBench [nQueries] [nCells]
  *
  * nCells matters for the IVF half: when the batch's probe UNION
  * covers most of the cell space (nq·nProbe ≳ nCells), the batch scan
  * reads nearly the whole index while each single probe reads only
  * nProbe/nCells of it — batching stops amortizing. Production coarse
  * quantizers run 2^10..2^14 cells, where an 8-query union stays
  * sparse; pass a larger nCells to measure that regime.
  */
object AnnServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nq = args.headOption.map(_.toInt).getOrElse(8)
    val nCells = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.orderBy(col("vec_id")).limit(nq)
      .select(transform(col("embedding"), _.cast("double")).as("q"))
      .collect().map(_.getSeq[Double](0).toArray).toSeq
    require(queries.size == nq, s"only ${queries.size} vectors at $sfDir")

    val root = java.nio.file.Files.createTempDirectory("annservebench").toString
    val (assigned, cents) =
      graft.sim.Similarity.ivfIndex(emb, "vec_id", "embedding", nCells = nCells)
    graft.sim.AnnIndex.writeIvfIndexed(assigned, s"$root/ivf")
    graft.sim.AnnIndex.writeLshIndexed(emb, "vec_id", "embedding", s"$root/lsh",
      dim = 64, numPlanes = 8, numTables = 4)

    def ivfSingle(q: Array[Double]) = graft.sim.AnnIndex.ivfTopKServe(
      spark, s"$root/ivf", cents, "vec_id", "embedding", q, k = 20, nProbe = 4)
    def lshSingle(q: Array[Double]) = graft.sim.AnnIndex.lshTopKServe(
      spark, s"$root/lsh", "vec_id", "embedding", q, k = 20,
      numPlanes = 8, numTables = 4)

    // warm codegen/planning once per shape so timings measure serving
    ivfSingle(queries.head).collect(); lshSingle(queries.head).collect()
    graft.sim.AnnIndex.ivfTopKServeBatch(spark, s"$root/ivf", cents,
      "vec_id", "embedding", queries.take(2), k = 20, nProbe = 4).collect()
    graft.sim.AnnIndex.lshTopKServeBatch(spark, s"$root/lsh",
      "vec_id", "embedding", queries.take(2), k = 20,
      numPlanes = 8, numTables = 4).collect()

    def wall(body: => Unit): Double = {
      val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
    }
    val ivfSingles = wall(queries.foreach(q => ivfSingle(q).collect()))
    val ivfBatch = wall(graft.sim.AnnIndex.ivfTopKServeBatch(spark, s"$root/ivf",
      cents, "vec_id", "embedding", queries, k = 20, nProbe = 4).collect())
    val lshSingles = wall(queries.foreach(q => lshSingle(q).collect()))
    val lshBatch = wall(graft.sim.AnnIndex.lshTopKServeBatch(spark, s"$root/lsh",
      "vec_id", "embedding", queries, k = 20,
      numPlanes = 8, numTables = 4).collect())

    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"ann_serve_batch","nq":$nq,"ncells":$nCells,""" +
      s""""ivf_single_total_sec":${f(ivfSingles)},"ivf_batch_sec":${f(ivfBatch)},""" +
      s""""lsh_single_total_sec":${f(lshSingles)},"lsh_batch_sec":${f(lshBatch)},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
