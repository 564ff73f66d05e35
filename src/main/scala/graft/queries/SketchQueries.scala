package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sketches

/** The deterministic-sketch family (ops.Sketches): KMV distinct
  * estimate, bottom-k-sample quantiles, priority sampling. Every query
  * here is approximate in the statistical sense yet BITWISE
  * deterministic — a pure function of the input set via the md5-top60
  * hash family — so each one hash-checks against a full DuckDB replay
  * (no rows-only escapes).
  */
object SketchQueries extends QueryProvider {

  /** md5-top60 image in DuckDB (shared definition). */
  private def h60Sql(expr: String) = OracleSql.md5Top60(expr)

  private val twoPow60Sql = "CAST('1152921504606846976' AS DOUBLE)"

  // ---- KMV distinct sketch per group: k smallest distinct hashes →
  //      (k-1)·2^60 / kth-min. The Spark side is the mergeable
  //      KmvAgg (k longs per map task); the oracle replays the k-min
  //      set relationally. ----
  private val kmvK = 256
  private val qKmv = Q(
    "q_kmv_distinct",
    (s, d) => Sketches.kmvDistinctByKey(
      Tables.lineitem(s, d), Seq("l_returnflag"), "l_partkey", kmvK),
    Some(s"""
      WITH hashed AS (
        SELECT DISTINCT l_returnflag,
          ${h60Sql("CONCAT('kmv|', CAST(l_partkey AS VARCHAR))")} AS h
        FROM lineitem WHERE l_partkey IS NOT NULL),
      ranked AS (
        SELECT l_returnflag, h,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        FROM hashed),
      tops AS (
        SELECT l_returnflag, MAX(h) AS hk, COUNT(*) AS c
        FROM ranked WHERE rn <= $kmvK GROUP BY 1)
      SELECT l_returnflag,
        CASE WHEN c < $kmvK THEN CAST(c AS DOUBLE)
             ELSE CAST(${kmvK - 1} AS DOUBLE) * $twoPow60Sql / CAST(hk AS DOUBLE)
        END AS distinct_est
      FROM tops"""))

  // ---- quantiles from the deterministic bottom-k hash sample:
  //      TakeOrdered sample, bucketed rank (no unpartitioned window on
  //      the Spark side — the oracle's global ROW_NUMBER is DuckDB
  //      only), value at rank ceil(q·m). ----
  private val sqK = 512
  private val sqQs = Seq(0.1, 0.5, 0.9, 0.99)
  private val qSampleQuantiles = Q(
    "q_sketch_quantiles",
    (s, d) => Sketches.sampleQuantiles(
      Tables.orders(s, d), "o_totalprice", "o_orderkey", sqK, sqQs),
    Some(s"""
      WITH s AS (
        SELECT o_totalprice AS v, o_orderkey AS id,
          ${h60Sql("CONCAT('sq|', CAST(o_orderkey AS VARCHAR))")} AS h
        FROM orders WHERE o_totalprice IS NOT NULL
        ORDER BY h, id LIMIT $sqK),
      r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, id) AS rn FROM s),
      m AS (SELECT COUNT(*) AS m FROM s)
      SELECT t.q, CAST(r.v AS DOUBLE) AS value
      FROM (VALUES ${sqQs.map(q => s"(CAST('$q' AS DOUBLE))").mkString(", ")}) AS t(q), m, r
      WHERE r.rn = GREATEST(1, CAST(CEIL(t.q * CAST(m.m AS DOUBLE)) AS BIGINT))"""))

  // ---- priority sampling (Duffield-Lund-Thorup): priority w/u with
  //      u = (h60+0.5)/2^60, keep the k highest, est_weight =
  //      max(w, τ) with τ the (k+1)-th priority. One IEEE division —
  //      no transcendental — so selection AND estimator replay
  //      bit-exactly. ----
  private val psK = 200
  private val qPrioritySample = Q(
    "q_priority_sample",
    (s, d) => Sketches.prioritySample(
      Tables.orders(s, d), "o_orderkey", "o_totalprice", psK, seed = 42L),
    Some(s"""
      WITH p AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS weight,
          CAST(o_totalprice AS DOUBLE) /
            ((CAST(${h60Sql("CONCAT('ps42|', CAST(o_orderkey AS VARCHAR))")} AS DOUBLE)
              + 0.5) / $twoPow60Sql) AS pri
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice > 0),
      top AS (SELECT * FROM p ORDER BY pri DESC, o_orderkey LIMIT ${psK + 1}),
      r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pri DESC, o_orderkey) AS rn FROM top),
      tau AS (SELECT pri AS tau FROM r WHERE rn = ${psK + 1})
      SELECT o_orderkey, weight,
        GREATEST(weight, COALESCE((SELECT tau FROM tau), weight)) AS est_weight
      FROM r WHERE rn <= $psK"""))

  // ---- per-group sample quantiles: bottom-k hash sample WITHIN each
  //      key (windows partitioned by the key), value at ceil(q·m) with
  //      the per-group m joined in-plan — no driver scalar. ----
  private val sqgK = 256
  private val sqgQs = Seq(0.25, 0.5, 0.9)
  private val qQuantilesByKey = Q(
    "q_sketch_quantiles_by_key",
    (s, d) => Sketches.sampleQuantilesByKey(
      Tables.orders(s, d), Seq("o_orderstatus"), "o_totalprice", "o_orderkey",
      sqgK, sqgQs),
    Some(s"""
      WITH h AS (
        SELECT o_orderstatus, o_totalprice AS v, o_orderkey AS id,
          ${h60Sql("CONCAT('sq|', CAST(o_orderkey AS VARCHAR))")} AS h
        FROM orders WHERE o_totalprice IS NOT NULL),
      s AS (
        SELECT * FROM (
          SELECT o_orderstatus, v, id,
            ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY h, id) AS hr
          FROM h)
        WHERE hr <= $sqgK),
      m AS (SELECT o_orderstatus, COUNT(*) AS m FROM s GROUP BY 1),
      r AS (
        SELECT o_orderstatus, v, id,
          ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY v, id) AS rn
        FROM s)
      SELECT r.o_orderstatus, t.q, CAST(r.v AS DOUBLE) AS value
      FROM r
      JOIN m USING (o_orderstatus)
      CROSS JOIN (VALUES ${sqgQs.map(q => s"(CAST('$q' AS DOUBLE))").mkString(", ")}) AS t(q)
      WHERE r.rn = GREATEST(1, CAST(CEIL(t.q * CAST(m.m AS DOUBLE)) AS BIGINT))"""))

  // ---- per-key cost budget (token budget per source): seeded
  //      content-hash order within each source, keep while the running
  //      cost fits. DuckDB window SUM over BIGINT is HUGEINT — cast
  //      (invariant 2). ----
  private val budgetChars = 4000L
  private val qSourceBudget = Q(
    "q_source_budget",
    (s, d) => graft.pipeline.TrainingData.budgetPerKey(
        Tables.documents(s, d), "source", "n_chars", "doc_id",
        budget = budgetChars, seed = 42L)
      .select(col("doc_id"), col("source"), col("cum_cost")),
    Some(s"""
      SELECT doc_id, source, CAST(cum AS BIGINT) AS cum_cost FROM (
        SELECT doc_id, source,
          SUM(n_chars) OVER (
            PARTITION BY source
            ORDER BY ${h60Sql("CONCAT('b42|', CAST(doc_id AS VARCHAR))")}, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM documents)
      WHERE cum <= $budgetChars"""))

  // ---- per-group priority sampling through the mergeable
  //      TopKPriorityAgg (one aggregation, map-side ≤k+1 entries per
  //      group) — τ per group from the (k+1)-th priority. ----
  private val psgK = 64
  private val qPrioritySampleByKey = Q(
    "q_priority_sample_by_key",
    (s, d) => Sketches.prioritySampleByKey(
      Tables.orders(s, d), Seq("o_orderstatus"), "o_orderkey", "o_totalprice",
      psgK, seed = 7L),
    Some(s"""
      WITH p AS (
        SELECT o_orderstatus, o_orderkey, CAST(o_totalprice AS DOUBLE) AS weight,
          CAST(o_totalprice AS DOUBLE) /
            ((CAST(${h60Sql("CONCAT('ps7|', CAST(o_orderkey AS VARCHAR))")} AS DOUBLE)
              + 0.5) / $twoPow60Sql) AS pri
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice > 0),
      r AS (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY o_orderstatus ORDER BY pri DESC, o_orderkey) AS rn
        FROM p),
      tau AS (
        SELECT o_orderstatus, MAX(CASE WHEN rn = ${psgK + 1} THEN pri END) AS tau
        FROM r GROUP BY 1)
      SELECT r.o_orderstatus, r.o_orderkey, r.weight,
        GREATEST(r.weight, COALESCE(tau.tau, r.weight)) AS est_weight
      FROM r JOIN tau USING (o_orderstatus)
      WHERE r.rn <= $psgK"""))

  // ---- Count-Min sketch: depth×width counter table from ONE groupBy
  //      (map tasks ship ≤ depth·width counters), probed by min over
  //      rows. Counter sums are commutative → bitwise deterministic,
  //      full SQL replay. ----
  private val cmsDepth = 3
  private val cmsWidth = 1024
  private val qCmsCounts = Q(
    "q_cms_counts",
    (s, d) => Sketches.cmsEstimate(
      Sketches.cmsBuild(Tables.lineitem(s, d), "l_partkey", cmsDepth, cmsWidth),
      s.range(1, 17).select(col("id").as("item")),
      cmsDepth, cmsWidth),
    Some {
      val rowsVals = (0 until cmsDepth).map(i => s"($i)").mkString(", ")
      def bucketSql(itemExpr: String) =
        s"${h60Sql(s"CONCAT('cms0|', CAST(i.row_i AS VARCHAR), '|', CAST($itemExpr AS VARCHAR))")} % $cmsWidth"
      s"""
      WITH cms AS (
        SELECT row_i, bucket, CAST(COUNT(1) AS BIGINT) AS c
        FROM (
          SELECT i.row_i, ${bucketSql("l_partkey")} AS bucket
          FROM lineitem, (VALUES $rowsVals) AS i(row_i)
          WHERE l_partkey IS NOT NULL)
        GROUP BY 1, 2),
      probe AS (
        SELECT CAST(p.item AS BIGINT) AS item, i.row_i, ${bucketSql("p.item")} AS bucket
        FROM (SELECT UNNEST(GENERATE_SERIES(1, 16)) AS item) p,
             (VALUES $rowsVals) AS i(row_i))
      SELECT probe.item, CAST(MIN(COALESCE(cms.c, 0)) AS BIGINT) AS est
      FROM probe
      LEFT JOIN cms ON cms.row_i = probe.row_i AND cms.bucket = probe.bucket
      GROUP BY 1"""
    })

  // ---- HyperLogLog distinct estimate per group (b=8, m=256
  //      registers): bucket = top 8 hash bits, rho from the low-52-bit
  //      length (string-exact via bin(), no log2), registers as a
  //      two-level groupBy. The harmonic sum is the EXACT integer
  //      Σ 2^(53−M) (invariant 1 — FP summation order would not
  //      replay); the only transcendental is the linear-counting
  //      branch's ln, rounded once at 9 digits on both sides. Two
  //      metrics so BOTH estimator branches are oracle-covered:
  //      partkey (~2000 distinct per flag → raw HLL branch) and
  //      suppkey (~100 → small-range linear counting). ----
  private val hllB = 8
  private val qHll = Q(
    "q_hll_distinct",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      def one(valCol: String, label: String) =
        Sketches.hllDistinctByKey(li, Seq("l_returnflag"), valCol, hllB)
          .select(col("l_returnflag"), lit(label).as("metric"), col("distinct_est"))
      one("l_partkey", "partkey").unionByName(one("l_suppkey", "suppkey"))
    },
    Some {
      val m = 1 << hllB              // 256
      val low = 60 - hllB            // 52
      val maxRho = low + 1           // 53
      val mask = (1L << low) - 1
      val alpha = Sketches.hllAlpha(m)
      val p2 = math.pow(2.0, maxRho)
      def chain(valCol: String, sfx: String) = s"""
      h_$sfx AS (
        SELECT l_returnflag,
          ${h60Sql(s"CONCAT('hll|', CAST($valCol AS VARCHAR))")} AS h
        FROM lineitem WHERE $valCol IS NOT NULL),
      r_$sfx AS (
        SELECT l_returnflag, h >> $low AS bkt, h & $mask AS w FROM h_$sfx),
      rho_$sfx AS (
        SELECT l_returnflag, bkt,
          CASE WHEN w = 0 THEN $maxRho ELSE $maxRho - LENGTH(bin(w)) END AS rho
        FROM r_$sfx),
      regs_$sfx AS (
        SELECT l_returnflag, bkt, MAX(rho) AS M FROM rho_$sfx GROUP BY 1, 2),
      agg_$sfx AS (
        SELECT l_returnflag,
          CAST(SUM(1::BIGINT << ($maxRho - M)) AS BIGINT) AS sp,
          COUNT(*) AS n
        FROM regs_$sfx GROUP BY 1)"""
      def est(label: String, sfx: String) = s"""
      SELECT l_returnflag, '$label' AS metric,
        CASE WHEN CAST('$alpha' AS DOUBLE) * CAST('${m.toDouble * m}' AS DOUBLE) * CAST('$p2' AS DOUBLE)
                    / CAST(sp + ($m - n) * ${1L << maxRho} AS DOUBLE)
                  <= CAST('${2.5 * m}' AS DOUBLE) AND ($m - n) > 0
             THEN ROUND(CAST('${m.toDouble}' AS DOUBLE) *
                    LN(CAST('${m.toDouble}' AS DOUBLE) / CAST($m - n AS DOUBLE)), 9)
             ELSE CAST('$alpha' AS DOUBLE) * CAST('${m.toDouble * m}' AS DOUBLE) * CAST('$p2' AS DOUBLE)
                    / CAST(sp + ($m - n) * ${1L << maxRho} AS DOUBLE)
        END AS distinct_est
      FROM agg_$sfx"""
      s"""
      WITH ${chain("l_partkey", "pk")},
      ${chain("l_suppkey", "sk")}
      ${est("partkey", "pk")}
      UNION ALL
      ${est("suppkey", "sk")}"""
    })

  override def all: Seq[Q] = Seq(
    qKmv, qSampleQuantiles, qPrioritySample, qQuantilesByKey, qSourceBudget,
    qPrioritySampleByKey, qCmsCounts, qHll)
}
