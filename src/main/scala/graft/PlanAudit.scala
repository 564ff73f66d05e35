package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- args) {
      val p = queries.Registry.queries(name)(spark, d)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      println(s"===== $name =====")
      // condensed: operator lines only
      println(p.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")
        || l.contains("Aggregate") || l.contains("Window") || l.contains("Scan")
        || l.contains("Sort") || l.contains("Generate")).mkString("\n"))
    }
    spark.stop()
  }
}
