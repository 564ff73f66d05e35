package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator demonstration: a Spark query over the
  * driver testdata plus (when SQL-expressible) a DuckDB oracle that
  * must hash-match it (BASELINE.md t2 gate).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryProvider {
  def all: Seq[Q]
}

/** Assembles the full SparkEntry surface from the per-package
  * providers. */
object Registry {
  def providers: Seq[QueryProvider] = Seq(
    CoreQueries,
    JoinQueries,
    StatQueries,
    TextQueries,
    MiscQueries,
    MediaQueries,
    MlQueries)

  lazy val all: Seq[Q] = providers.flatMap(_.all)

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
