package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Impute, Reshape}
import graft.ml.{Pca, Pls, Ward}
import graft.pipeline.Pipelines
import graft.stats.Moments
import graft.stats.Moments.{Sql => MS}

/** PCA / PLS / Ward clustering / imputation (SURVEY §2.10).
  *
  * The eigen/agglomeration/KMeans steps are driver-side objects over
  * s×s (or k×dim) data, but every DISTRIBUTED aggregation feeding and
  * consuming them is exact-decimal (Moments) — so the runs record the
  * tiny driver objects (means, components, eigenvalues, NIPALS
  * scalars, cluster assignments) and the oracles replay the full
  * distributed chain in DuckDB with only those literals injected
  * (INVARIANTS.md §2's Storey-pi0 technique). What stays
  * rows-only is only what no SQL can express (the seeded KMeans fit
  * itself is covered by injecting its centroids; the kernel-PLS solve
  * in q_impute_pls by MlSpec goldens).
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

  /** The same long form as DuckDB SQL (embedding[] is 1-indexed). */
  private def longSql: String = (0 until dims).map(i =>
    s"SELECT vec_id, 'dim$i' AS sample, CAST(embedding[${i + 1}] AS DOUBLE) AS value FROM embeddings")
    .mkString("\n        UNION ALL ")

  /** `CASE <keyExpr> WHEN 'k' THEN CAST('<v>' AS DOUBLE) … END` —
    * the SQL image of Spark's `element_at(map(...), keyExpr)` with
    * driver-recorded doubles injected per invariant 2 (string-cast
    * literals, never bare decimals). */
  private def caseMap(keyExpr: String, m: Seq[(String, Double)]): String =
    m.map { case (k, v) => s"WHEN '$k' THEN CAST('$v' AS DOUBLE)" }
      .mkString(s"CASE $keyExpr ", " ", " END")

  private def dlit(v: Double): String = s"CAST('$v' AS DOUBLE)"

  // ---- PCA: fit collects the s×s Gram eigenbasis driver-side; the
  //      oracle injects (components, √λ, nSamples) and replays the
  //      distributed feature-centering + weight + score matvecs in
  //      SQL (feature means derive IN-QUERY on both sides — they are
  //      table-scale and never become literals). ----
  private val lastPca =
    new java.util.concurrent.atomic.AtomicReference[Pca.PcaModel]()

  private val qPca = Q(
    "q_pca_scores",
    (s, d) => {
      // persisted (r16): fit + scores read this long form ~7 times
      // (sample collect, feature means ×2, Gram pairs, weight matvec,
      // K row, score matvec) — each re-ran the unpivot over the
      // source scan. Session-lifetime LRU cache, one materialization.
      val long = embLong(s, d).persist(graft.ops.Caches.memoLevel(s))
      val model = Pca.fit(long, "vec_id", "sample", "value", nComponents = 2)
      lastPca.set(model)
      Pca.sampleScores(s, long, model, "vec_id", "sample", "value")
    },
    None,
    oracleGen = Some(() => Option(lastPca.get()).map { m =>
      // mirrors Pca.featureWeightsRaw / sampleScores: sums over
      // PRESENT rows plus the absent-cell constants (μ_f·S_c per
      // feature, K_c per component) — see Pca.scala scaladoc
      val wCols = m.components.zipWithIndex.map { case (comp, c) =>
        s"${MS.sumProdExact("l.value", caseMap("l.sample", m.sampleOrder.zip(comp.toSeq)))}" +
          s" - MAX(fm.fmu) * ${dlit(comp.sum)} AS w_$c"
      }.mkString(",\n          ")
      val kCols = m.eigenvalues.indices.map { c =>
        s"${MS.sumProdExact("fm.fmu", s"w.w_$c")} AS k_$c"
      }.mkString(",\n          ")
      val scoreCols = m.eigenvalues.zipWithIndex.map { case (lam, c) =>
        s"(${MS.sumProdExact("l.value", s"w.w_$c")} - MAX(k.k_$c))" +
          s" / ${dlit(math.sqrt(lam))} AS pc_$c"
      }.mkString(",\n          ")
      s"""
      WITH long AS (
        $longSql),
      fm AS (SELECT vec_id,
          ${MS.sumExactFine("value")} / CAST('${m.nSamples.toDouble}' AS DOUBLE) AS fmu
        FROM long GROUP BY vec_id),
      w AS (SELECT l.vec_id AS vec_id,
          $wCols
        FROM long l JOIN fm ON fm.vec_id = l.vec_id
        GROUP BY l.vec_id),
      k AS (SELECT
          $kCols
        FROM w JOIN fm ON fm.vec_id = w.vec_id)
      SELECT l.sample AS sample,
          $scoreCols
      FROM long l JOIN w ON w.vec_id = l.vec_id CROSS JOIN k
      GROUP BY l.sample"""
    }))

  // ---- PLS: the NIPALS loop's sample-space vectors (t, centered y)
  //      and scalars (‖w‖, tᵀt) are driver-side; the oracle injects
  //      them and replays both components' feature-space aggregations
  //      (means, weights, scores, loadings, deflation) in SQL. ----
  private val lastPls =
    new java.util.concurrent.atomic.AtomicReference[Pls.PlsModel]()

  private val qPls = Q(
    "q_pls_scores",
    (s, d) => {
      val long = embLong(s, d)
      val y = (0 until dims).map(i => s"dim$i" -> (i % 2).toDouble).toMap
      val model = Pls.fit(s, long, y, "vec_id", "sample", "value", nComponents = 2)
      lastPls.set(model)
      Pls.scores(s, model)
    },
    None,
    oracleGen = Some(() => Option(lastPls.get()).map { m =>
      val labeled = m.components.head.yc.keys.toSeq.sorted
      val inList = labeled.map(s => s"'$s'").mkString(", ")
      val c0 = m.components(0); val c1 = m.components(1)
      // two DISTINCT t images, mirroring the fit: the p-loading
      // aggregates over LABELED samples only (tMapFit — a held-out
      // sample must drop out of p), while deflation applies t to ALL
      // samples (tMapAll). Today's query labels every dim, but the
      // oracle must not silently diverge the day it doesn't.
      def tMapAll(c: Pls.PlsComponent) =
        caseMap("sample", m.sampleOrder.map(s => s -> c.t.getOrElse(s, 0.0)))
      def tMapFit(c: Pls.PlsComponent) =
        caseMap("sample", labeled.map(s => s -> c.t.getOrElse(s, 0.0)))
      def ycMap(c: Pls.PlsComponent) =
        caseMap("sample", labeled.map(s => s -> c.yc.getOrElse(s, 0.0)))
      s"""
      WITH long AS (
        $longSql),
      raw AS (SELECT vec_id, sample, COALESCE(value, 0.0) AS x FROM long),
      fm AS (SELECT vec_id, ${MS.meanOf(MS.sumExactFine("x"), "COUNT(x)")} AS fmu
        FROM raw WHERE sample IN ($inList) GROUP BY vec_id),
      x0 AS (SELECT r.vec_id, r.sample, r.x - f.fmu AS x
        FROM raw r JOIN fm f ON f.vec_id = r.vec_id),
      w0r AS (SELECT vec_id, ${MS.sumProdExact("x", ycMap(c0))} AS wr
        FROM x0 GROUP BY vec_id),
      w0 AS (SELECT vec_id, wr / ${dlit(c0.wNorm)} AS w FROM w0r),
      t0 AS (SELECT x0.sample, ${MS.sumProdExact("x0.x", "w0.w")} AS t
        FROM x0 JOIN w0 ON w0.vec_id = x0.vec_id GROUP BY x0.sample),
      p0 AS (SELECT vec_id, ${MS.sumProdExact("x", tMapFit(c0))} / ${dlit(c0.tt)} AS p
        FROM x0 GROUP BY vec_id),
      x1 AS (SELECT x0.vec_id, x0.sample, x0.x - ${tMapAll(c0)} * p0.p AS x
        FROM x0 JOIN p0 ON p0.vec_id = x0.vec_id),
      w1r AS (SELECT vec_id, ${MS.sumProdExact("x", ycMap(c1))} AS wr
        FROM x1 GROUP BY vec_id),
      w1 AS (SELECT vec_id, wr / ${dlit(c1.wNorm)} AS w FROM w1r),
      t1 AS (SELECT x1.sample, ${MS.sumProdExact("x1.x", "w1.w")} AS t
        FROM x1 JOIN w1 ON w1.vec_id = x1.vec_id GROUP BY x1.sample)
      SELECT t0.sample AS sample, t0.t AS lv_1, t1.t AS lv_2
      FROM t0 JOIN t1 ON t1.sample = t0.sample"""
    }))

  // ---- Ward: assignments are driver-side (s×s agglomeration over the
  //      distributed exact-decimal distance matrix); the query surfaces
  //      per-cluster DISTRIBUTED aggregates (pair counts, within-
  //      cluster squared-distance mass) so the oracle verifies the
  //      distance computation end-to-end with only the assignment map
  //      injected. ----
  private val lastWard =
    new java.util.concurrent.atomic.AtomicReference[Seq[(String, Int)]]()

  private val qWard = Q(
    "q_ward_clusters",
    (s, d) => {
      val long = embLong(s, d)
      val assign = Ward.clusterSamples(s, long, "vec_id", "sample", "value", k = 3)
      // assignments are a driver-local toDF — this collect is free
      lastWard.set(assign.collect().map(r => (r.getString(0), r.getInt(1))).toSeq)
      val sq = Ward.pairwiseSqDist(long, "vec_id", "sample", "value")
      val a = assign.select(col("sample").as("sa"), col("cluster"))
      val b = assign.select(col("sample").as("sb"), col("cluster").as("_cb"))
      val members = assign.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"))
      val within = sq.join(a, "sa").join(b, "sb")
        .filter(col("cluster") === col("_cb"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_pairs"),
          Moments.sumExactFine(col("sqdist")).as("sum_sqdist"))
      // both sides are k-row aggregates — broadcast beats the default
      // sort-merge exchange pair
      members.join(broadcast(within), Seq("cluster"), "left")
    },
    None,
    oracleGen = Some(() => Option(lastWard.get()).map { as =>
      val values = as.map { case (smp, c) => s"('$smp', $c)" }.mkString(", ")
      s"""
      WITH long AS (
        $longSql),
      pairs AS (
        SELECT a.sample AS sa, b.sample AS sb,
          ${MS.sumSqExact("(a.value - b.value)")} AS sqdist
        FROM long a JOIN long b ON b.vec_id = a.vec_id AND a.sample < b.sample
        GROUP BY 1, 2),
      assign(sample, cluster) AS (SELECT * FROM (VALUES $values) v(sample, cluster)),
      members AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM assign GROUP BY 1),
      within AS (
        SELECT x.cluster, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          ${MS.sumExactFine("p.sqdist")} AS sum_sqdist
        FROM pairs p
        JOIN assign x ON x.sample = p.sa
        JOIN assign y ON y.sample = p.sb
        WHERE y.cluster = x.cluster
        GROUP BY 1)
      SELECT m.cluster, m.n_members, w.n_pairs, w.sum_sqdist
      FROM members m LEFT JOIN within w ON w.cluster = m.cluster"""
    }))

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

  // Oracled end-to-end: the draw is a content hash (md5 Box-Muller,
  // Impute.gaussian), not an RNG stream, so DuckDB reproduces every
  // imputed value — moments exact-decimal, z rounded at 1e-7 (the
  // portable-transcendental rule).
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
    Some {
      def unif(salt: String) =
        s"(CAST(${OracleSql.md5Top60(s"CONCAT('$salt|', key)")} AS DOUBLE) + 0.5) / ${dlit(Impute.TwoPow60)}"
      val z = s"ROUND(SQRT(-2.0 * LN(${unif("a")})) * COS(${dlit(2.0 * math.Pi)} * ${unif("b")}), 7)"
      s"""
      WITH base AS (
        SELECT l_orderkey, l_linenumber, l_returnflag AS sample,
          CASE WHEN l_discount < 0.02 THEN NULL ELSE l_quantity END AS value,
          CONCAT('g42|', CAST(l_orderkey AS VARCHAR), '|', CAST(l_linenumber AS VARCHAR)) AS key
        FROM lineitem),
      st AS (
        SELECT sample, ${MS.meanOf("s1", "n")} AS mu,
          SQRT(${MS.varOf("s1", "s2", "n")}) AS sd
        FROM (SELECT sample, ${MS.sumExact("value")} AS s1,
                ${MS.sumSqExact("value")} AS s2, COUNT(value) AS n
              FROM base WHERE value IS NOT NULL GROUP BY sample) t)
      SELECT b.l_orderkey, b.l_linenumber, b.sample,
        CASE WHEN b.value IS NOT NULL THEN b.value
             ELSE (st.mu + CAST('-1.8' AS DOUBLE) * st.sd)
                  + $z * (CAST('0.3' AS DOUBLE) * st.sd) END AS value,
        b.value IS NULL AS was_imputed
      FROM base b LEFT JOIN st ON st.sample = b.sample"""
    })

  // ---- PLS imputation (ref imputation.py:66-113, reconstructed as
  //      kernel PLS): profile matrix from lineitem (features =
  //      suppliers, samples = return flags), synthetic missingness on
  //      every 10th supplier's 'N' cell.
  //
  //      ORACLED with no injected literals at all: the sample space is
  //      exactly {A, N, R}, so the two deflated kernel iterations
  //      unroll to per-feature scalar arithmetic (+,-,*,/,sqrt — all
  //      bitwise-portable), the 3×3 Gram is six exact-decimal product
  //      sums recomputable in SQL, and every Spark fold is mirrored
  //      term for term (incl. the 1e-12 degeneracy guards and the
  //      row-median fill). MlSpec keeps the primal-NIPALS golden. ----
  private val qImputePls = Q(
    "q_impute_pls",
    (s, d) => {
      val prof = Tables.lineitemKeyed(s, d)
        .groupBy(col("l_suppkey").as("id"), col("l_returnflag").as("sample"))
        .agg(Moments.meanOf(Moments.sumExact(col("l_quantity")),
          count(col("l_quantity"))).as("value"))
        .withColumn("value",
          when(col("id") % 10 === 0 && col("sample") === "N", lit(null))
            .otherwise(col("value")))
      Impute.pls(s, prof, "id", "sample", "value")
    },
    Some {
      val S = Seq("A", "N", "R") // sorted sample order, as Impute.pls sees it
      val eps = "CAST('1.0E-12' AS DOUBLE)"
      def g(i: Int, j: Int) = s"g${math.min(i, j)}${math.max(i, j)}"
      // Scala's `(0 until 3).map(f).sum` left fold: ((f0 + f1) + f2)
      def fold3(f: Int => String) = s"((${f(0)} + ${f(1)}) + ${f(2)})"
      val pivV = S.zipWithIndex.map { case (smp, i) =>
        s"MAX(CASE WHEN sample = '$smp' THEN v END) AS v$i" }.mkString(", ")
      val pivE = S.zipWithIndex.map { case (smp, i) =>
        s"COALESCE(MAX(CASE WHEN sample = '$smp' THEN 1 END), 0) AS e$i" }.mkString(", ")
      val pivC = S.zipWithIndex.map { case (smp, i) =>
        s"MAX(CASE WHEN sample = '$smp' THEN cv END) AS c$i" }.mkString(", ")
      // COALESCE to 0.0: with ZERO complete features Spark's Gram array
      // stays zero-initialized (→ the 1e-12 degenerate path imputes
      // yMean); an empty aggregate here returns NULL sums, which would
      // NULL every downstream column instead
      val gramCols = (for (i <- 0 until 3; j <- i until 3)
        yield s"COALESCE(${MS.sumProdExact(s"c$i", s"c$j")}, 0.0) AS g$i$j").mkString(", ")
      val k1Cols = (for (i <- 0 until 3; j <- 0 until 3) yield
        s"${g(i, j)} - t$i * kt$j / tt - kt$i * t$j / tt + t$i * t$j * tkt / (tt * tt) AS k$i$j")
        .mkString(",\n          ")
      val unions = S.zipWithIndex.map { case (smp, i) =>
        s"""SELECT id, '$smp' AS sample,
          CASE WHEN v$i IS NOT NULL THEN v$i WHEN c = 0 THEN NULL ELSE yhf$i END AS value,
          CASE WHEN c = 0 THEN FALSE ELSE v$i IS NULL END AS was_imputed
        FROM m8 WHERE c >= 1 OR e$i = 1""" }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH prof AS (
        SELECT l_suppkey AS id0, l_returnflag AS sample,
          ${MS.meanOf(MS.sumExact("l_quantity"), "COUNT(l_quantity)")} AS v0
        FROM lineitem GROUP BY 1, 2),
      base AS (
        SELECT CAST(id0 AS VARCHAR) AS id, sample,
          CASE WHEN id0 % 10 = 0 AND sample = 'N' THEN NULL ELSE v0 END AS v
        FROM prof),
      cnt AS (SELECT id, COUNT(v) AS c FROM base GROUP BY id),
      cmpl AS (SELECT b.id, b.sample, b.v FROM base b JOIN cnt ON cnt.id = b.id WHERE cnt.c = 3),
      incp AS (SELECT b.id, b.sample, b.v FROM base b JOIN cnt ON cnt.id = b.id WHERE cnt.c < 3),
      mu AS (SELECT id, ${MS.meanOf(MS.sumExact("v"), "COUNT(v)")} AS mu FROM cmpl GROUP BY id),
      cent AS (SELECT c.id, c.sample, c.v - m.mu AS cv FROM cmpl c JOIN mu m ON m.id = c.id),
      centp AS (SELECT id, $pivC FROM cent GROUP BY id),
      gram AS (SELECT $gramCols FROM centp),
      piv AS (SELECT id, $pivV, $pivE FROM incp GROUP BY id),
      m1 AS (SELECT piv.*, gram.*,
          (CASE WHEN v0 IS NOT NULL THEN 1 ELSE 0 END
           + CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END
           + CASE WHEN v2 IS NOT NULL THEN 1 ELSE 0 END) AS c
        FROM piv CROSS JOIN gram),
      m2 AS (SELECT *,
          CASE WHEN c = 1 THEN COALESCE(v0, v1, v2)
               ELSE ((COALESCE(v0, 0.0) + COALESCE(v1, 0.0)) + COALESCE(v2, 0.0)) / 2.0 END AS med
        FROM m1),
      m3 AS (SELECT *, ${(0 until 3).map(i => s"COALESCE(v$i, med) AS f$i").mkString(", ")} FROM m2),
      m4 AS (SELECT *, ${fold3(i => s"f$i")} / 3.0 AS ym FROM m3),
      m5 AS (SELECT *, ${(0 until 3).map(i => s"f$i - ym AS yc$i").mkString(", ")} FROM m4),
      m6 AS (SELECT *,
          ${(0 until 3).map(i => s"${fold3(j => s"${g(i, j)} * yc$j")} AS ky$i").mkString(",\n          ")}
        FROM m5),
      m6b AS (SELECT *, ${fold3(i => s"yc$i * ky$i")} AS wn2 FROM m6),
      m6c AS (SELECT *, ${(0 until 3).map(i => s"ky$i / SQRT(wn2) AS t$i").mkString(", ")} FROM m6b),
      m6d AS (SELECT *, ${fold3(i => s"t$i * t$i")} AS tt FROM m6c),
      m6e AS (SELECT *, ${fold3(i => s"yc$i * t$i")} / tt AS q FROM m6d),
      m6f AS (SELECT *,
          ${(0 until 3).map(i => s"ym + q * t$i AS yh$i").mkString(", ")},
          ${(0 until 3).map(i => s"${fold3(j => s"${g(i, j)} * t$j")} AS kt$i").mkString(",\n          ")}
        FROM m6e),
      m6g AS (SELECT *, ${fold3(i => s"t$i * kt$i")} AS tkt FROM m6f),
      m7 AS (SELECT *,
          $k1Cols,
          ${(0 until 3).map(i => s"yc$i - q * t$i AS ycb$i").mkString(", ")}
        FROM m6g),
      m7b AS (SELECT *,
          ${(0 until 3).map(i => s"${fold3(j => s"k$i$j * ycb$j")} AS kyb$i").mkString(",\n          ")}
        FROM m7),
      m7c AS (SELECT *, ${fold3(i => s"ycb$i * kyb$i")} AS wn2b FROM m7b),
      m7d AS (SELECT *, ${(0 until 3).map(i => s"kyb$i / SQRT(wn2b) AS tb$i").mkString(", ")} FROM m7c),
      m7e AS (SELECT *, ${fold3(i => s"tb$i * tb$i")} AS ttb FROM m7d),
      m7f AS (SELECT *, ${fold3(i => s"ycb$i * tb$i")} / ttb AS qb FROM m7e),
      m8 AS (SELECT *,
          ${(0 until 3).map(i =>
            s"CASE WHEN wn2 <= $eps THEN ym WHEN wn2b <= $eps THEN yh$i ELSE yh$i + qb * tb$i END AS yhf$i")
            .mkString(",\n          ")}
        FROM m7f)
      SELECT id, sample, v AS value, FALSE AS was_imputed FROM cmpl
      UNION ALL
        $unions"""
    })

  def all: Seq[Q] = Seq(qPca, qPls, qWard, qTimecourse, qImpute, qImputePls)
}
