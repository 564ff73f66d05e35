package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MEASURED recall@k of the ANN family against exact baselines — the
  * quality number that justifies the speed/recall tradeoff knobs
  * (numPlanes/numTables, nCells/nProbe, m/k). Each approximate method
  * is scored against the exact search in ITS OWN metric:
  * LSH/IVF approximate the exact COSINE top-k; PQ/IVF-PQ approximate
  * the exact L2 top-k (ADC is a squared-L2 estimator — scoring it
  * against cosine would conflate quantization loss with metric
  * mismatch on unnormalized vectors).
  *
  * TextSimSpec asserts per-config floors at the default knobs;
  * `graft.RecallAudit` prints the matrix for any SF dir (recorded in
  * BENCH_NOTES.md per round).
  */
object AnnRecall {

  final case class AnnConfig(
      numPlanes: Int = 8, numTables: Int = 4,
      nCells: Int = 16, nProbe: Int = 4,
      m: Int = 8, codebookK: Int = 16)

  /** Exact L2 top-k (the PQ-family baseline): ‖v‖² − 2·v·q + ‖q‖²
    * with the same fold discipline as assignCells. */
  def bruteForceL2TopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val qCol = array(query.toIndexedSeq.map(lit): _*)
    val q2 = query.foldLeft(0.0)((a, x) => a + x * x)
    val v = col(vecCol)
    embeddings
      .select(col(idCol),
        (Similarity.dot(v, v) - lit(2.0) * Similarity.dot(v, qCol) + lit(q2)).as("dist2"))
      .orderBy(col("dist2"), col(idCol))
      .limit(k)
  }

  /** Mean recall@k per method over `queryIds`, with the indexes fit
    * ONCE and reused across queries (the serving shape). */
  def measure(
      emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      queryIds: Seq[Long], k: Int, cfg: AnnConfig): Map[String, Double] = {
    val queries = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    require(queries.nonEmpty, "no query vectors found")
    val (assigned0, cents) = Similarity.ivfIndex(emb, idCol, vecCol, cfg.nCells)
    val assigned = assigned0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pqModel = Pq.fit(emb, vecCol, dim, cfg.m, cfg.codebookK)
    val encoded = Pq.encode(emb, vecCol, pqModel)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val encodedIvf = Pq.encode(assigned, vecCol, pqModel)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def ids(df: DataFrame): Set[Long] =
      df.select(col(idCol)).collect().map(_.getLong(0)).toSet
    val perQuery = queries.toSeq.map { case (_, q) =>
      val cosTruth = ids(Similarity.bruteForceTopK(emb, idCol, vecCol, q, k))
      val l2Truth = ids(bruteForceL2TopK(emb, idCol, vecCol, q, k))
      val probes = Similarity.probeCells(cents, q, cfg.nProbe)
      Map(
        "lsh" -> (ids(Similarity.lshTopK(emb, idCol, vecCol, q, k, dim,
          cfg.numPlanes, cfg.numTables)) & cosTruth).size,
        "ivf" -> (ids(Similarity.ivfTopK(assigned, cents, idCol, vecCol, q, k,
          cfg.nProbe)) & cosTruth).size,
        "pq" -> (ids(Pq.adcTopK(encoded, idCol, pqModel, q, k)) & l2Truth).size,
        "ivfpq" -> (ids(Pq.ivfPqTopK(encodedIvf, idCol, pqModel, q, probes, k)) & l2Truth).size
      ).view.mapValues(_.toDouble / k).toMap
    }
    assigned.unpersist(); encoded.unpersist(); encodedIvf.unpersist()
    perQuery.flatten.groupMapReduce(_._1)(_._2)(_ + _)
      .view.mapValues(_ / perQuery.size).toMap
  }
}
