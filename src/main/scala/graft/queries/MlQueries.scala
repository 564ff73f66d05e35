package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Impute, Reshape}
import graft.ml.{Pca, Pls, Ward}

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

  def all: Seq[Q] = Seq(qPca, qPls, qWard, qImpute)
}
