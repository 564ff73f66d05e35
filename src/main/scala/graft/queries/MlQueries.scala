package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Impute, Reshape}
import graft.ml.{Pca, Pls, Ward}
import graft.pipeline.Pipelines
import graft.stats.Moments.{Sql => MS}

/** PCA / PLS / Ward clustering / imputation (SURVEY §2.10). These are
  * eigen/iterative algorithms with no SQL-expressible oracle →
  * rows-only queries here; numerical parity is covered by ScalaTest
  * specs against hand-computed small cases.
  */
object MlQueries extends QueryProvider {

  private val dims = 8

  /** Long form over embeddings: features = vec_id, samples = dim0..7. */
  private def embLong(s: org.apache.spark.sql.SparkSession, d: String) = {
    val cols = (0 until dims).map(i =>
      col("embedding").getItem(i).cast("double").as(s"dim$i"))
    Reshape.unpivot(
      Tables.embeddings(s, d).select((col("vec_id") +: cols): _*),
      Seq("vec_id"), (0 until dims).map(i => s"dim$i"),
      nameCol = "sample", valueCol = "value")
  }

  private val qPca = Q(
    "q_pca_scores",
    (s, d) => {
      val long = embLong(s, d)
      val model = Pca.fit(long, "vec_id", "sample", "value", nComponents = 2)
      Pca.sampleScores(s, long, model, "vec_id", "sample", "value")
    },
    None)

  private val qPls = Q(
    "q_pls_scores",
    (s, d) => {
      val long = embLong(s, d)
      val y = (0 until dims).map(i => s"dim$i" -> (i % 2).toDouble).toMap
      val model = Pls.fit(s, long, y, "vec_id", "sample", "value", nComponents = 2)
      Pls.scores(s, model)
    },
    None)

  private val qWard = Q(
    "q_ward_clusters",
    (s, d) => Ward.clusterSamples(s, embLong(s, d), "vec_id", "sample", "value", k = 3),
    None)

  // ---- hierarchical_timecourse contract (ref visualize.py:1872-1959):
  //      z-scored site profiles → Ward clusters → per-cluster mean
  //      timecourse. The cluster ASSIGNMENTS are driver-side (Ward);
  //      the run records them and the oracle injects the map as a
  //      VALUES literal — everything else (collapse, z-score, means)
  //      is exact-decimal SQL, so the chain hash-checks end-to-end. ----
  private val lastTcAssign =
    new java.util.concurrent.atomic.AtomicReference[Seq[(String, Int)]]()

  private val qTimecourse = Q(
    "q_cluster_timecourse",
    (s, d) => {
      val long = Tables.lineitem(s, d).select(
        (col("l_suppkey") % 40).cast("string").as("site"),
        col("l_linenumber").as("timepoint"),
        col("l_quantity").as("value"))
      val tc = Pipelines.hierarchicalTimecourse(s, long, "site", "timepoint", "value", k = 4)
      // assignments are a driver-local toDF — this collect is free
      lastTcAssign.set(tc.assignments.collect().map(r => (r.getString(0), r.getInt(1))).toSeq)
      tc.means
    },
    None,
    oracleGen = Some(() => Option(lastTcAssign.get()).map { as =>
      val values = as.map { case (site, c) => s"('$site', $c)" }.mkString(", ")
      s"""
      WITH prof AS (
        SELECT CAST(l_suppkey % 40 AS VARCHAR) AS site, l_linenumber AS timepoint,
               ${MS.meanOf(MS.sumExact("l_quantity"), "COUNT(l_quantity)")} AS v
        FROM lineitem GROUP BY 1, 2),
      m AS (
        SELECT site,
          ${MS.meanOf(MS.sumExact("v"), "COUNT(v)")} AS mu,
          SQRT(${MS.varOf(MS.sumExact("v"), MS.sumSqExact("v"), "COUNT(v)")}) AS sd
        FROM prof GROUP BY site),
      z AS (
        SELECT p.site, p.timepoint, (p.v - m.mu) / m.sd AS z
        FROM prof p JOIN m ON m.site = p.site),
      assign(site, cluster) AS (SELECT * FROM (VALUES $values) v(site, cluster))
      SELECT a.cluster, z.timepoint,
        ${MS.meanOf(MS.sumExact("z.z"), "COUNT(z.z)")} AS mean_z,
        CAST(COUNT(z.z) AS BIGINT) AS n_sites
      FROM z JOIN assign a ON a.site = z.site
      GROUP BY 1, 2"""
    }))

  private val qImpute = Q(
    "q_impute_gaussian",
    (s, d) => {
      // synthesize missingness on the fly (testdata has no nulls):
      // low-discount observations become "not quantified"
      val long = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag").as("sample"),
        when(col("l_discount") < 0.02, lit(null)).otherwise(col("l_quantity")).as("value"))
      Impute.gaussian(long, "sample", "value", seed = 42L)
        .select(col("l_orderkey"), col("l_linenumber"), col("sample"),
          col("value"), col("was_imputed"))
    },
    None)

  // ---- PLS imputation (ref imputation.py:66-113, reconstructed as
  //      kernel PLS): profile matrix from lineitem (features =
  //      suppliers, samples = return flags), synthetic missingness on
  //      every 10th supplier's 'N' cell. rows-only: the kernel solve
  //      (deflated Gram iterations) is not SQL-expressible; MlSpec
  //      carries the primal-NIPALS golden. ----
  private val qImputePls = Q(
    "q_impute_pls",
    (s, d) => {
      val prof = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey").as("id"), col("l_returnflag").as("sample"))
        .agg(avg(col("l_quantity")).as("value"))
        .withColumn("value",
          when(col("id") % 10 === 0 && col("sample") === "N", lit(null))
            .otherwise(col("value")))
      Impute.pls(s, prof, "id", "sample", "value")
    },
    None)

  def all: Seq[Q] = Seq(qPca, qPls, qWard, qTimecourse, qImpute, qImputePls)
}
