package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator demonstration: a Spark query over the
  * driver testdata plus (when SQL-expressible) a DuckDB oracle that
  * must hash-match it (BASELINE.md t2 gate).
  */
/** `oracle` is a static SQL string; `oracleGen` is evaluated lazily at
  * dump time (AFTER Verify has run every query) — for oracles that
  * embed a driver-computed scalar (e.g. Storey pi0) as a literal. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleGen: Option[() => Option[String]] = None)

trait QueryProvider {
  def all: Seq[Q]
}

/** Shared oracle-SQL images of the portable hash primitives — ONE
  * definition each, so every oracle stays structurally locked to the
  * Scala kernels they mirror (graft.functions.TextHash.md5Top60,
  * graft.pipeline.TrainingData.hashUniform). */
object OracleSql {
  /** TextHash.md5Top60: top 60 bits of md5 = the first 15 hex digits. */
  def md5Top60(expr: String): String =
    s"CAST(CONCAT('0x', SUBSTR(md5($expr), 1, 15)) AS BIGINT)"

  /** TrainingData.hashUniform: md5Top60(g<seed>|id) mod 1e6 → [0,1). */
  def hashUniform(seed: Long, idExpr: String): String =
    s"CAST(${md5Top60(s"CONCAT('g$seed|', CAST($idExpr AS VARCHAR))")} % 1000000 AS DOUBLE) / 1000000.0"
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
    MlQueries,
    SketchQueries)

  lazy val all: Seq[Q] = providers.flatMap(_.all)

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  // def, not lazy val: oracleGen entries must re-evaluate at dump time
  // (Verify runs queries first, then dumps — generated oracles see the
  // scalars those runs computed)
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracleGen.flatMap(g => g()).orElse(q.oracle).map(q.name -> _)).toMap
}
