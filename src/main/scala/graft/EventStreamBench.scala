package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Streaming STATE benchmark (round-13 verdict task 7): drives the two
  * stateful event operators — gap sessionization and the stream-stream
  * interval join — over an sf-scale event stream under a selectable
  * state store provider (HDFS-backed default vs RocksDB, Spark 4
  * built-in), and banks the numbers spec-scale runs cannot show:
  * end-of-run state rows, state memory, and per-batch latency.
  *
  * RocksDB is the at-scale provider: the HDFS-backed store keeps every
  * partition's state map ON-HEAP (state ∝ users/pairs-in-horizon
  * competes with execution memory — the exact mode the sf10 span SMJ
  * postmortems document), while RocksDB holds it off-heap + on-disk
  * with incremental checkpointing. This main is the evidence that the
  * streaming surface survives provider swap (same results, bounded
  * state) and what the swap costs per batch.
  *
  * Prints one JSON line per (operator, provider):
  *   state_rows        total state rows at end of ingest
  *   state_mem_bytes   provider-reported memory (RocksDB: off-heap
  *                     usage; HDFS: on-heap map bytes)
  *   batch_sec_avg/max trigger-execution wall per micro-batch
  *   rows_out          sink rows (sessionize: one per event; join:
  *                     matched pairs) — the cross-provider invariant
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.EventStreamBench
  *          [nSlices] [providers...]   (default 8 slices, both)
  */
object EventStreamBench {
  private val RocksCls =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nSlices = args.headOption.map(_.toInt).getOrElse(8)
    val providers = {
      val sel = args.drop(1)
      if (sel.nonEmpty) sel.toSeq else Seq("hdfs", "rocksdb")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("event_stream_bench")
    // pre-stage arrival waves in EVENT-TIME order (a log ships roughly
    // time-ordered; sessionize state transitions assume it across
    // batches) so slice I/O isn't billed to the stream
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val total = events.count()
    val stageDir = s"$root/stage"
    events
      .withColumn("_slice", ntile(nSlices).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("user_id"), lit(64))).orderBy(col("ts"), col("event_id"))))
      .write.partitionBy("_slice").mode("overwrite").parquet(stageDir)

    def runOp(op: String, provider: String): Unit = {
      val providerCls = provider match {
        case "rocksdb" => RocksCls
        case _ =>
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      }
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", providerCls)
      val runDir = s"$root/$op-$provider"
      val ingestDir = s"$runDir/ingest"; new java.io.File(ingestDir).mkdirs()
      def arrive(s: Int): Unit =
        new java.io.File(s"$stageDir/_slice=${s + 1}").listFiles()
          .filter(_.getName.endsWith(".parquet")).zipWithIndex
          .foreach { case (f, i) => java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(ingestDir, s"s$s-$i.parquet")) }
      arrive(0)
      val stream = graft.streaming.EventStream.readEvents(spark, ingestDir)
      val out = op match {
        case "sessionize" =>
          graft.streaming.EventStream.sessionize(spark, stream)
        case "interval_join" =>
          graft.streaming.EventStream.intervalJoin(
            stream.filter(col("event_type").isin("view", "click", "purchase")),
            stream.filter(col("event_type").isin("click", "purchase", "error")),
            key = "user_id", maxGap = "30 minutes", watermark = "2 hours")
      }
      val q = out.writeStream.format("parquet")
        .option("path", s"$runDir/sink")
        .option("checkpointLocation", s"$runDir/ckpt")
        .outputMode("append").start()
      val t0 = System.nanoTime()
      q.processAllAvailable()
      (1 until nSlices).foreach { s => arrive(s); q.processAllAvailable() }
      val ingestSec = (System.nanoTime() - t0) / 1e9
      val progresses = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val batchSecs: Seq[Double] = progresses
        .map(_.durationMs.asScala.get("triggerExecution")
          .map(_.longValue).getOrElse(0L).toDouble / 1e3)
      val last = progresses.lastOption
      val stateRows = last.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      // provider-reported state memory: memoryUsedBytes is the
      // standard StateOperatorProgress field both providers fill
      // (HDFS: on-heap map bytes; RocksDB: its tracked usage). The
      // provider-specific keys split the RocksDB number into the
      // off-heap (pinned blocks) and on-disk (SST) parts.
      val stateMem =
        last.map(_.stateOperators.map(_.memoryUsedBytes).sum).getOrElse(0L)
      val detailKeys = Set("rocksdbSstFileSize", "rocksdbPinnedBlocksMemoryUsage",
        "stateOnCurrentVersionSizeBytes")
      val memDetail = last.map(_.stateOperators.flatMap(
        _.customMetrics.asScala.collect {
          case (k, v) if detailKeys(k) => k -> v.toLong
        }).groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum })
        .getOrElse(Map.empty)
        .map { case (k, v) => s""""$k":$v""" }.mkString(",")
      val rowsOut = spark.read.parquet(s"$runDir/sink").count()
      q.stop()
      def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
      println(s"""{"metric":"stream_state_bench","op":"$op","provider":"$provider",""" +
        s""""events":$total,"slices":$nSlices,"ingest_sec":${f(ingestSec)},""" +
        s""""events_per_sec":${f(total / ingestSec)},"batches":${batchSecs.size},""" +
        s""""batch_sec_avg":${f(batchSecs.sum / math.max(1, batchSecs.size))},""" +
        s""""batch_sec_max":${f(batchSecs.foldLeft(0.0)(math.max))},""" +
        s""""state_rows":$stateRows,"state_mem_bytes":$stateMem,""" +
        (if (memDetail.nonEmpty) s""""state_mem_detail":{$memDetail},""" else "") +
        s""""rows_out":$rowsOut,"sf":"$sfDir"}""")
    }

    for (op <- Seq("sessionize", "interval_join"); p <- providers) runOp(op, p)
    spark.stop()
  }
}
