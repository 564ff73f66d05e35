package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface (green-field — the reference has no
  * streaming, SURVEY §2.11). Mirrors the batch event operators so a
  * pipeline can lift batch transforms onto a stream unchanged:
  * readStream → watermark → windowed agg / stateful sessionize →
  * sink.
  */
object EventStream {

  /** events.parquet schema with ts as nanos-since-epoch long (the
    * TIMESTAMP(NANOS) testdata generation, via nanosAsLong=true). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Whether an ingest directory holds ANY non-hidden parquet file —
    * decided RECURSIVELY with the same hidden-path rule Spark's file
    * index applies (dot-prefixed segments and `_`-prefixed segments
    * without `=` are invisible; `date=1`-style partition dirs are
    * not). The "no footers yet → fallback schema" branch of
    * [[readEvents]] keys off this: a PARTITIONED ingest dir whose
    * parquet lives in subdirectories but fails `spark.read` for a
    * real reason (mixed-generation footers) must rethrow, not be
    * misclassified as empty — the old top-level-only probe did
    * exactly that (round-9 advisory). */
  def ingestDirHasFooters(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val root = fs.makeQualified(p)
    val it = fs.listFiles(p, true)
    var found = false
    while (!found && it.hasNext) {
      val f = it.next().getPath
      var cur = f
      var hidden = false
      while (!hidden && cur != null && cur != root) {
        val n = cur.getName
        if (n.startsWith(".") || (n.startsWith("_") && !n.contains("=")))
          hidden = true
        cur = cur.getParent
      }
      if (!hidden && f.getName.endsWith(".parquet")) found = true
    }
    found
  }

  /** Streaming scan of an events directory. A streaming file source
    * needs an explicit schema, and the driver's testdata has shipped
    * `ts` as both TIMESTAMP(NANOS)→long and µs timestamp — so take the
    * physical schema from one footer (a driver-side metadata read, not
    * a data scan) and normalize to the nanos-long contract the
    * downstream operators share with the batch side (Tables.events).
    * A directory with no footers yet — the normal state of an ingest
    * dir before the first file lands — falls back to the current
    * (µs timestamp) generation's schema instead of refusing to start:
    * a stream must be startable ahead of data arrival. Only that
    * no-footer-yet case gets the fallback: a nonexistent path or a
    * corrupt/mixed-generation footer set rethrows the real error —
    * swallowing it would silently start the stream on the wrong
    * generation's schema and mis-read files that land later. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val physical =
      try spark.read.parquet(dir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val emptyIngestDir = fs.exists(p) && fs.getFileStatus(p).isDirectory &&
            !ingestDirHasFooters(spark, dir)
          if (!emptyIngestDir) throw e
          StructType(eventsSchema.map(f =>
            if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))
      }
    spark.readStream
      .schema(physical)
      .parquet(dir)
      .withColumn("ts", graft.Tables.tsToNanos(col("ts"), physical("ts").dataType))
      .withColumn("event_ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Tumbling-window count/sum per event type with a watermark for
    * state eviction (append-mode safe). Mirrors batch q_events_window. */
  def windowedAgg(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  final case class Event(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(sessionCount: Int, lastTsNanos: Long)
  final case class SessionAssignment(event_id: Long, user_id: Long, session_id: Int)

  /** Stateful gap sessionization (30 min) via mapGroupsWithState —
    * the streaming analogue of the batch q_sessionize window query.
    * State per user is O(1) (last timestamp + counter). */
  def sessionize(
      spark: SparkSession,
      events: DataFrame,
      gapNanos: Long = 1800L * 1000 * 1000 * 1000): DataFrame = {
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          var st = state.getOption.getOrElse(SessionState(0, Long.MinValue))
          val out = rows.toSeq.sortBy(e => (e.ts, e.event_id)).map { e =>
            val newSession = st.lastTsNanos != Long.MinValue && e.ts - st.lastTsNanos > gapNanos
            st = SessionState(st.sessionCount + (if (newSession) 1 else 0), e.ts)
            SessionAssignment(e.event_id, userId, st.sessionCount)
          }
          state.update(st)
          out.iterator
        })
      .toDF()
  }

  /** Streaming exact dedup: drop events whose dedup key was already
    * seen within the watermark horizon (`dropDuplicatesWithinWatermark`
    * — bounded state, unlike unbounded dropDuplicates). The streaming
    * face of Dedup.exactByContent. */
  def dedupeStream(events: DataFrame, keyCols: Seq[String], watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment: left-join each micro-batch against a
    * static dimension table, broadcast so the stream side never
    * shuffles — the streaming face of the design join
    * (ops.Design.buildIndexFromDesign). Stateless, watermark-free. */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Stream-stream equi + interval join (the view→click attribution
    * shape): a left event matches right events with the same `key`
    * whose time falls in [l_ts, l_ts + maxGap]. Both sides carry
    * watermarks AND the join carries an event-time range condition —
    * the two ingredients Structured Streaming needs to bound the join
    * state: each side buffers only rows younger than
    * watermark + maxGap, so state is O(rate × horizon), not O(stream).
    * Inner join, append mode. Returns
    * (key, l_event_id, l_ts, r_event_id, r_ts).
    *
    * Batch-equivalent by construction (IoStreamingSpec ≡-batch test):
    * the same join condition over the same frames as a batch join
    * yields the same pair set. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      maxGap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.select(col(key), col("event_id").as("l_event_id"),
        col("event_ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("_rk"), col("event_id").as("r_event_id"),
        col("event_ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r,
        col(key) === col("_rk") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"))
      .drop("_rk")
  }

  /** Drive a streaming frame to a memory sink synchronously (local
    * verification; production would use a real sink). */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
