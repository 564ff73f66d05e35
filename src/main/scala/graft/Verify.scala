package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects;
      // read as nanos-since-epoch longs (queries convert explicitly).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Tell queries with driver-recorded oracle literals (q_volcano's p
    // column) to capture them during this run; Bench never sets this,
    // so it never pays the extra recording action.
    System.setProperty("graft.record.oracle", "1")
    // The winnowing/shared-span family's ORACLE mode: md5 gram hashes
    // are what the DuckDB oracle SQL replays (HAVING over md5-hash
    // minima). Production (Bench, library default) runs the rolling
    // Karp-Rabin kernel — same recall guarantee, ~5-10× less CPU, no
    // SQL image (see Dedup.defaultRollingHash).
    System.setProperty("graft.gramhash", "md5")
    new java.io.File(outDir).mkdirs()
    // optional extra args = query-name filter for local iteration (the
    // driver passes exactly two args → full registry). NOTE a filtered
    // run's oracle_sql.json lacks oracleGen entries for queries that
    // did not run — only use the filtered form to refresh result dirs.
    val only = args.drop(2).toSet
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // Output-type lint (round-9 incident): a DECIMAL/array/struct
          // output hash-mismatches the driver gate even when values are
          // bit-identical. PlanSpec fails the build on this; here we
          // scream in the dump log too so a driver run can't silently
          // carry a non-portable column to the hasher.
          val bad = PlanChecks.nonPortableOutputColumns(df.schema)
          if (bad.nonEmpty)
            System.err.println(s"[verify] LINT $name emits non-portable output " +
              s"type(s): ${bad.mkString(", ")} — expect a driver hash mismatch " +
              "(see Moments.sumExactScale4 scaladoc)")
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
