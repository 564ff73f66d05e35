package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end ingest→compaction cycle measurement for the streaming
  * curation split (the production design: the stream owns gates +
  * watermark-bounded exact dedup, a PERIODIC BATCH compaction owns the
  * near-dup stage — DocStream scaladoc).
  *
  * Feeds the fixture's documents through `DocStream.curateStream` in
  * `nSlices` arrival waves (file-source micro-batches), then runs one
  * `TrainingData.curateFull` compaction over the streamed-in table,
  * and prints ONE JSON line:
  *
  *   docs_per_sec     sustained ingest throughput (gates + dedup +
  *                    parquet sink, end to end)
  *   state_rows       dedup state at end of ingest (distinct
  *                    fingerprints inside the watermark horizon — the
  *                    stream's memory bound: rate × horizon rows,
  *                    ~100 B each)
  *   compaction_sec   wall for the near-dup batch job over everything
  *                    ingested
  *
  * Cadence math documented in BENCH_NOTES: a compaction period P is
  * sustainable iff compaction_sec(corpus so far) < P, and the near-dup
  * staleness window is ≤ P (a near-dup pair straddling a compaction
  * boundary survives at most one period).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.StreamBench [nSlices]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nSlices = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("stream_bench")
    val ingestDir = s"$root/ingest"; val sinkDir = s"$root/sink"
    val ckptDir = s"$root/ckpt"; val stageDir = s"$root/stage"
    new java.io.File(ingestDir).mkdirs()

    // pre-stage the arrival waves so slice I/O isn't billed to ingest
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val total = docs.count()
    (0 until nSlices).foreach { s =>
      docs.filter(pmod(col("doc_id"), lit(nSlices)) === s)
        .coalesce(1).write.mode("overwrite").parquet(s"$stageDir/s$s")
    }
    def arrive(s: Int): Unit =
      new java.io.File(s"$stageDir/s$s").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(ingestDir, s"slice$s-$i.parquet"))
        }

    val cfg = graft.pipeline.TrainingData.CurationConfig(
      minQuality = 0.1, langs = Set("en", "de", "fr", "es", "zh"), minTokens = 3)
    arrive(0) // file streams need one footer for their first listing
    val stream = spark.readStream
      .schema(docs.schema)
      .parquet(ingestDir)
      .withColumn("ingest_ts", current_timestamp())
    val q = graft.streaming.DocStream
      .curateStream(stream, "doc_id", "text", "ingest_ts", cfg)
      .writeStream.format("parquet")
      .option("path", sinkDir).option("checkpointLocation", ckptDir)
      .outputMode("append").start()

    // Adaptive compaction trigger: the PRODUCTION wiring
    // (graft.streaming.CompactionDriver) — after each arrival wave,
    // the driver compacts iff the elapsed time since the last
    // compaction reached the period the scheduler derives from its
    // MEASURED walls (W/P pinned at the utilization target). The tiny
    // minPeriod + bench target make the trigger fire mid-ingest here
    // so the cycle demonstrates live; production uses the defaults.
    val driver = new graft.streaming.CompactionDriver(
      spark, sinkDir, "doc_id", "text", cfg,
      new graft.streaming.CompactionScheduler(
        targetUtilization = 0.5, minPeriodSec = 1.0, maxPeriodSec = 3600.0))

    val t0 = System.nanoTime()
    q.processAllAvailable()
    driver.maybeCompact()
    (1 until nSlices).foreach { s => arrive(s); q.processAllAvailable(); driver.maybeCompact() }
    // ingest throughput is the STREAM's number: compaction walls and
    // the driver's count() probes spent inside the slice loop are the
    // batch job's / the bench's cost, not the stream's
    val midIngest = driver.compactions
    val ingestSec = (System.nanoTime() - t0) / 1e9 -
      midIngest.map(_._2).sum - driver.probeSec
    val stateRows = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    q.stop()

    // final full compaction over everything ingested (unconditional).
    // A fully-gated run can leave the sink with zero data files —
    // compactNow() returns None and `compactions` stays empty, so the
    // bookkeeping must not assume a .last exists
    val (nIngested, compactionSec, kept) = driver.compactNow() match {
      case Some(_) =>
        val (r, w, _) = driver.compactions.last
        (r, w, driver.lastKept)
      case None => (0L, 0.0, 0L)
    }
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val compJson = midIngest
      .map { case (r, w, p) => s"""{"rows":$r,"wall_sec":${f(w)},"next_period_sec":${f(p)}}""" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"stream_cycle","docs":$total,"ingested":$nIngested,""" +
      s""""ingest_sec":${f(ingestSec)},"docs_per_sec":${f(total / ingestSec)},""" +
      s""""state_rows":$stateRows,"compaction_sec":${f(compactionSec)},""" +
      s""""mid_ingest_compactions":$compJson,""" +
      s""""recommended_period_sec":${f(driver.scheduler.nextPeriodSec(nIngested))},""" +
      s""""kept":$kept,"slices":$nSlices,"sf":"$sfDir"}""")
    spark.stop()
  }
}
