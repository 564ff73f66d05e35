package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles — the percentile-gate primitive a corpus
  * curation pipeline runs constantly ("drop documents below the p5
  * quality score of their language", "cap at p99 token count").
  *
  * Scale design: group cardinality is this operator's stated use case
  * ("per language"), so one window partition PER GROUP is not enough —
  * at 100 TB one language can be half the corpus and would pin a
  * single sort task. Ranks therefore come from the two-level bucketed
  * pattern (same stitch as QValues/DistributedRank) applied WITHIN
  * each group: range-bucket the value against the group's own
  * (min, max) — from one aggregate, broadcast back — rank inside each
  * (group, bucket) window in parallel, then add per-bucket offsets
  * from a tiny (group × ≤numBuckets)-row cumulative sum. Bucketing by
  * value preserves the (value, tieCols...) order across buckets, so
  * the stitched rank is EXACTLY the per-group row_number; the
  * quantile is then the row at rank ceil(q·n) (1-indexed, the
  * discrete lower-nearest definition) — exact and bitwise-
  * reproducible (approx_percentile's sketch is neither), replayable
  * verbatim by an external engine.
  */
object Quantiles {

  /** One row per group with a column per requested quantile
    * (`p50`, `p95`, … named from `(q*100).round`). `tieCols` must make
    * (group, value, tieCols) unique for reproducible ranks. */
  def exactGroupQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[Double],
      tieCols: Seq[String],
      numBuckets: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), "qs in (0, 1]")
    val ranked = groupRanked(df, Seq(groupCol), valueCol, tieCols, numBuckets)
    val aggs = qs.map { q =>
      val name = s"p${math.round(q * 100)}"
      max(when(col("_rn") === ceil(lit(q) * col("_n")), col(valueCol))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Shared two-level bucketed-rank frame: the non-null rows of `df`
    * with the exact per-group row number `_rn` (ordered by value, then
    * `tieCols`) and group size `_n` — without any task ever sorting or
    * holding more than one (group, value-bucket) slice.
    *
    * Per-group value range + count is one partial-aggregated pass; the
    * result is group-cardinality-sized (the operator's own output
    * size), so broadcasting it back is always affordable. Buckets
    * clamp BEFORE floor/cast: under ANSI mode (invariant 5) floor of
    * ±Inf overflows LONG and NaN fails the int cast; least/greatest
    * treat NaN as the largest double, so -Inf→bucket 0, NaN/+Inf→last
    * bucket — exactly where the sort order puts them. Per-bucket rank
    * offsets come from a (group × ≤numBuckets)-row cumulative sum —
    * bounded at any scale. */
  private def groupRanked(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      tieCols: Seq[String], numBuckets: Int): DataFrame = {
    val gs = groupCols.map(col)
    // prune to the columns the rank needs BEFORE any exchange: callers
    // pass full frames (subtractColumnMedian, boxData), and shuffling
    // every column twice to produce a per-group scalar would dominate
    // the cost at scale
    val data = df
      .select((groupCols ++ (valueCol +: tieCols)).distinct.map(col): _*)
      .filter(col(valueCol).isNotNull)
    val stats = data.groupBy(gs: _*).agg(
      min(col(valueCol)).cast("double").as("_mn"),
      max(col(valueCol)).cast("double").as("_mx"),
      count(lit(1)).as("_n"))
    val span = when(col("_mx") > col("_mn"), col("_mx") - col("_mn")).otherwise(lit(1.0))
    val bucket = floor(least(greatest(
        (col(valueCol).cast("double") - col("_mn")) / span * numBuckets, lit(0.0)),
      lit((numBuckets - 1).toDouble))).cast("int")
    // NULL-SAFE group match: groupBy keeps a NULL group — and so do
    // the SQL mirrors' GROUP BYs — so a plain equi-join here would
    // silently drop every row of a NULL-keyed group
    val bucketed = nullSafeBroadcastJoin(data, stats, groupCols)
      .withColumn("_rb", bucket)
    // skew split numBuckets ways: the window key is (group, bucket)
    val wBkt = Window.partitionBy((gs :+ col("_rb")): _*)
      .orderBy((col(valueCol) +: tieCols.map(col)): _*)
    val local = bucketed.withColumn("_lrn", row_number().over(wBkt))
    val wGrp = Window.partitionBy(gs: _*).orderBy(col("_rb"))
    val offsets = local.groupBy((gs :+ col("_rb")): _*).agg(count(lit(1)).as("_bn"))
      .withColumn("_off", coalesce(
        sum(col("_bn")).over(wGrp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((gs :+ col("_rb") :+ col("_off")): _*)
    nullSafeBroadcastJoin(local, offsets, groupCols :+ "_rb")
      .withColumn("_rn", col("_off") + col("_lrn"))
  }

  /** Selection-only sibling of [[groupRanked]] for callers that read
    * values at a FEW known ranks per group (median's two, the box
    * plot's six): the classic distributed selection plan —
    *   1. per-group (min, max, n) — one partial-aggregated pass;
    *   2. per-(group, value-bucket) COUNTS — a second pass whose
    *      exchange carries ≤ groups·numBuckets rows (map-side combine),
    *      never the data;
    *   3. per-bucket rank offsets + "which bucket holds rank r" —
    *      arithmetic over the tiny counts frame;
    *   4. rank ONLY the rows of the target buckets (≈ rankCount ·
    *      n/numBuckets rows) — everything else is filtered at the
    *      scan by a broadcast semi-join on (group, bucket).
    * Where [[groupRanked]] shuffles and sorts the WHOLE input once
    * (correct when every row needs its rank — exactGroupQuantiles'
    * output joins, subtractColumnMedian's *ranked* variant), this
    * reads the source three times but never exchanges more than the
    * counts and the target buckets — at 100 TB that's three pruned
    * column scans vs a full-fact-table shuffle, and at the gate SF it
    * removes the multi-shuffle constants the round-9/10 verdicts
    * flagged (q_median_center 2.7×, q_box_summary 11× DuckDB).
    *
    * Returns the target buckets' rows as (groups..., valueCol, _rn,
    * _n, _mn, _mx): exactly [[groupRanked]]'s schema plus the group
    * stats, restricted to buckets containing a requested rank — the
    * rank-probing aggregates downstream are unchanged because value-
    * at-rank is what they read, and every requested rank's row is
    * here. `rankFns` build each target rank (a LONG column) from the
    * group's `n`.
    *
    * Degenerate concentration (many rows sharing one value) collapses
    * a target bucket toward the whole group — the same worst case the
    * full-rank stitch has, since equal values always share a bucket;
    * the uniform-range assumption behind numBuckets is the operator's
    * documented contract either way. */
  private def selectedGroupRanks(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      rankFns: Seq[Column => Column], numBuckets: Int): DataFrame = {
    val gs = groupCols.map(col)
    val data = df
      .select((groupCols :+ valueCol).distinct.map(col): _*)
      .filter(col(valueCol).isNotNull)
    val stats = data.groupBy(gs: _*).agg(
      min(col(valueCol)).cast("double").as("_mn"),
      max(col(valueCol)).cast("double").as("_mx"),
      count(lit(1)).as("_n"))
    val span = when(col("_mx") > col("_mn"), col("_mx") - col("_mn")).otherwise(lit(1.0))
    val bucket = floor(least(greatest(
        (col(valueCol).cast("double") - col("_mn")) / span * numBuckets, lit(0.0)),
      lit((numBuckets - 1).toDouble))).cast("int")
    // pass 2: per-bucket counts — the only full-data aggregation, and
    // its exchange is ≤ groups·numBuckets rows after partial agg
    val counts = nullSafeBroadcastJoin(data, stats, groupCols)
      .groupBy((gs :+ bucket.as("_rb")): _*).agg(count(lit(1)).as("_bn"))
    val wGrp = Window.partitionBy(gs: _*).orderBy(col("_rb"))
    val offsets = counts.withColumn("_off", coalesce(
      sum(col("_bn")).over(wGrp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // target ranks per group (tiny), matched to their holding bucket
    val targets = stats.select((gs :+
      explode(array(rankFns.map(f => f(col("_n"))): _*)).as("_tr")): _*)
    val needed = nullSafeBroadcastJoin(targets, offsets, groupCols)
      .filter(col("_tr") > col("_off") && col("_tr") <= col("_off") + col("_bn"))
      .select((gs :+ col("_rb") :+ col("_off")): _*)
      .distinct()
    // pass 3: rank only the target buckets' rows
    val bucketed = nullSafeBroadcastJoin(data, stats, groupCols)
      .withColumn("_rb", bucket)
    val selected = nullSafeBroadcastJoin(bucketed, needed, groupCols :+ "_rb")
    val wBkt = Window.partitionBy((gs :+ col("_rb")): _*).orderBy(col(valueCol))
    selected
      .withColumn("_rn", col("_off") + row_number().over(wBkt))
      .select((gs :+ col(valueCol) :+ col("_rn") :+ col("_n") :+
        col("_mn") :+ col("_mx")): _*)
  }

  /** Broadcast inner join that matches NULL keys to NULL keys
    * (EqualNullSafe is a valid hash-join key, so this stays a
    * BroadcastHashJoin). Right-side key columns are dropped. */
  private def nullSafeBroadcastJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val renamed = keys.foldLeft(right)((d, k) => d.withColumnRenamed(k, s"_r_$k"))
    val cond = keys.map(k => left(k) <=> renamed(s"_r_$k")).reduce(_ && _)
    left.join(broadcast(renamed), cond).drop(keys.map(k => s"_r_$k"): _*)
  }

  /** Exact INTERPOLATING median per group (pandas/DuckDB `MEDIAN`
    * semantics: even n averages the two middle values) on the same
    * bucketed-rank engine — one row per group, `(group, _median)`.
    *
    * This exists because Spark's `median`/`percentile` aggregate
    * buffers every value of a group in the final aggregation task
    * (ObjectHashAggregate): exact but O(group) memory on ONE task —
    * at 100 TB a hot group OOMs the executor. Here ranks come from the
    * (group, value-bucket) two-level pattern, so no task ever sorts or
    * holds more than a bucket, and the median is the exact average of
    * the rank-⌊(n+1)/2⌋ and rank-⌈(n+1)/2⌉ values (odd n: same row,
    * (v+v)/2 = v bitwise). Ties need no tie-break columns: the VALUE
    * at a given rank is invariant to the order among equal values.
    * The (lo+hi)/2 tree must be mirrored verbatim in oracle SQL —
    * /2.0 on doubles is exact, so both engines agree bitwise. */
  def medianByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      numBuckets: Int = 1024,
      outCol: String = "_median"): DataFrame = {
    // selection plan, not a full rank: only the two median ranks'
    // buckets are ever shuffled (see selectedGroupRanks)
    def halfOf(n: Column) = (n + lit(1L)).cast("double") / lit(2.0)
    val ranked = selectedGroupRanks(df, Seq(groupCol), valueCol,
      Seq(n => floor(halfOf(n)).cast("long"), n => ceil(halfOf(n)).cast("long")),
      numBuckets)
    val half = halfOf(col("_n"))
    val g = ranked.groupBy(col(groupCol)).agg(
      max(when(col("_rn") === floor(half), col(valueCol).cast("double"))).as("_l"),
      max(when(col("_rn") === ceil(half), col(valueCol).cast("double"))).as("_h"),
      max(col("_n")).as("_gn"))
    // odd n: both ranks select the SAME row — return it directly
    // rather than (v+v)/2, which overflows to Infinity for
    // |v| > Double.MaxValue/2 (the old median() returned v exactly)
    val halfOut = (col("_gn") + lit(1L)).cast("double") / lit(2.0)
    g.select(col(groupCol),
      when(floor(halfOut) === ceil(halfOut), col("_l"))
        .otherwise((col("_l") + col("_h")) / lit(2.0)).as(outCol))
  }

  /** Per-group five-number box-plot summary `(groups..., n, lo, q1,
    * med, q3, hi)` with LINEARLY INTERPOLATED quartiles (numpy/pandas
    * `quantile` default: position 1+(n−1)·q, fractional positions
    * interpolate v_lo + (v_hi − v_lo)·frac) — on the bucketed-rank
    * engine for the same reason as [[medianByGroup]]: Spark's
    * `percentile`/`median` aggregates buffer a whole group in the
    * final task, and a box plot's groups are routinely corpus-scale.
    * Groups whose values are ALL null emit no row (a box plot draws
    * nothing for them). The interpolation tree must be mirrored
    * verbatim in oracle SQL — see [[fiveNumberOracleSql]]. */
  def fiveNumberByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      numBuckets: Int = 1024): DataFrame = {
    // selection plan: only the six quartile ranks' buckets are ranked;
    // lo/hi/n ride in from the stats pass (min(v) cast double ==
    // cast-then-min — the double cast is monotone)
    def posOf(n: Column, q: Double) = lit(1.0) + (n.cast("double") - lit(1.0)) * lit(q)
    val quartiles = Seq("q1" -> 0.25, "med" -> 0.5, "q3" -> 0.75)
    val ranked = selectedGroupRanks(df, groupCols, valueCol,
      quartiles.flatMap { case (_, q) =>
        Seq[Column => Column](
          n => floor(posOf(n, q)).cast("long"),
          n => ceil(posOf(n, q)).cast("long"))
      }, numBuckets)
    def pos(q: Double) = posOf(col("_n"), q)
    val aggs = quartiles.flatMap { case (name, q) =>
      Seq(
        max(when(col("_rn") === floor(pos(q)), col(valueCol).cast("double")))
          .as(s"_l_$name"),
        max(when(col("_rn") === ceil(pos(q)), col(valueCol).cast("double")))
          .as(s"_h_$name"))
    } ++ Seq(
      max(col("_n")).as("n"),
      max(col("_mn")).as("lo"),
      max(col("_mx")).as("hi"))
    val g = ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    def posOut(q: Double) =
      lit(1.0) + (col("n").cast("double") - lit(1.0)) * lit(q)
    val outs = quartiles.map { case (name, q) =>
      (col(s"_l_$name") + (col(s"_h_$name") - col(s"_l_$name")) *
        (posOut(q) - floor(posOut(q)).cast("double"))).as(name)
    }
    g.select((groupCols.map(col) :+ col("n") :+ col("lo")) ++
      outs :+ col("hi"): _*)
  }

  /** The DuckDB mirror of [[fiveNumberByGroup]] (same rank selection,
    * same interpolation tree; q injected as CAST('q' AS DOUBLE) so the
    * products are double×double on both engines). */
  def fiveNumberOracleSql(
      table: String, groupCols: Seq[String], valueCol: String): String = {
    val gs = groupCols.mkString(", ")
    def posSql(q: String) =
      s"(1 + (CAST(n AS DOUBLE) - 1) * CAST('$q' AS DOUBLE))"
    val quartiles = Seq("q1" -> "0.25", "med" -> "0.5", "q3" -> "0.75")
    val caseAggs = quartiles.map { case (name, q) =>
      s"""MAX(CASE WHEN rn = FLOOR(${posSql(q)})
              THEN CAST($valueCol AS DOUBLE) END) AS l_$name,
          MAX(CASE WHEN rn = CEIL(${posSql(q)})
              THEN CAST($valueCol AS DOUBLE) END) AS h_$name"""
    }.mkString(",\n          ")
    val outs = quartiles.map { case (name, q) =>
      s"l_$name + (h_$name - l_$name) * (${posSql(q)} - FLOOR(${posSql(q)})) AS $name"
    }.mkString(",\n        ")
    s"""
      WITH mb AS (
        SELECT $gs, $valueCol,
          ROW_NUMBER() OVER (PARTITION BY $gs ORDER BY $valueCol) AS rn,
          COUNT(*) OVER (PARTITION BY $gs) AS n
        FROM $table WHERE $valueCol IS NOT NULL),
      g AS (
        SELECT $gs, CAST(MAX(n) AS BIGINT) AS n,
          MIN(CAST($valueCol AS DOUBLE)) AS lo,
          MAX(CAST($valueCol AS DOUBLE)) AS hi,
          $caseAggs
        FROM mb GROUP BY $gs)
      SELECT $gs, n, lo,
        $outs,
        hi
      FROM g"""
  }

  /** The DuckDB mirror of [[medianByGroup]] (same two-rank selection,
    * same (lo+hi)/2 tree) — one row per group: `(groupCol, outCol)`. */
  def medianOracleSql(
      table: String, groupCol: String, valueCol: String,
      outCol: String = "_median"): String = s"""
      WITH mb AS (
        SELECT $groupCol, $valueCol,
          ROW_NUMBER() OVER (PARTITION BY $groupCol ORDER BY $valueCol) AS rn,
          COUNT(*) OVER (PARTITION BY $groupCol) AS n
        FROM $table WHERE $valueCol IS NOT NULL),
      mg AS (
        SELECT $groupCol, MAX(n) AS n,
          MAX(CASE WHEN rn = FLOOR((CAST(n AS DOUBLE) + 1) / 2)
                THEN CAST($valueCol AS DOUBLE) END) AS l,
          MAX(CASE WHEN rn = CEIL((CAST(n AS DOUBLE) + 1) / 2)
                THEN CAST($valueCol AS DOUBLE) END) AS h
        FROM mb GROUP BY $groupCol)
      SELECT $groupCol,
        CASE WHEN FLOOR((CAST(n AS DOUBLE) + 1) / 2)
                = CEIL((CAST(n AS DOUBLE) + 1) / 2)
             THEN l ELSE (l + h) / 2 END AS $outCol
      FROM mg"""

  /** The matching DuckDB SQL (same rank selection, same tie-break) —
    * kept adjacent so the trees stay structurally identical. */
  def oracleSql(
      table: String, groupCol: String, valueCol: String,
      qs: Seq[Double], tieCols: Seq[String]): String = {
    val order = (valueCol +: tieCols).mkString(", ")
    val aggs = qs.map { q =>
      val name = s"p${math.round(q * 100)}"
      // CAST('..' AS DOUBLE) on BOTH factors: a bare 0.95 is DECIMAL in
      // DuckDB and 0.95·n then differs from Spark's double product at
      // exact-integer boundaries (double 0.95·20 = 19.0000…04 → CEIL
      // 20, decimal → 19). Identical IEEE trees or nothing.
      s"MAX(CASE WHEN rn = CEIL(CAST('$q' AS DOUBLE) * CAST(n AS DOUBLE)) THEN $valueCol END) AS $name"
    }.mkString(",\n        ")
    s"""
      WITH r AS (
        SELECT $groupCol, $valueCol,
          ROW_NUMBER() OVER (PARTITION BY $groupCol ORDER BY $order) AS rn,
          COUNT(*) OVER (PARTITION BY $groupCol) AS n
        FROM $table WHERE $valueCol IS NOT NULL)
      SELECT $groupCol,
        $aggs
      FROM r GROUP BY $groupCol"""
  }
}
