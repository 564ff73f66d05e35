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
    val data = df.filter(col(valueCol).isNotNull)
    // per-group value range + count: one partial-aggregated pass; the
    // result is group-cardinality-sized (the operator's own output
    // size), so broadcasting it back is always affordable
    val stats = data.groupBy(col(groupCol)).agg(
      min(col(valueCol)).cast("double").as("_mn"),
      max(col(valueCol)).cast("double").as("_mx"),
      count(lit(1)).as("_n"))
    val span = when(col("_mx") > col("_mn"), col("_mx") - col("_mn")).otherwise(lit(1.0))
    // clamp BEFORE floor/cast: under ANSI mode (invariant 5) floor of
    // ±Inf overflows LONG and NaN fails the int cast; least/greatest
    // treat NaN as the largest double, so -Inf→bucket 0, NaN/+Inf→last
    // bucket — exactly where the sort order puts them
    val bucket = floor(least(greatest(
        (col(valueCol).cast("double") - col("_mn")) / span * numBuckets, lit(0.0)),
      lit((numBuckets - 1).toDouble))).cast("int")
    val bucketed = data.join(broadcast(stats), groupCol).withColumn("_rb", bucket)
    // skew split numBuckets ways: the window key is (group, bucket)
    val wBkt = Window.partitionBy(col(groupCol), col("_rb"))
      .orderBy((col(valueCol) +: tieCols.map(col)): _*)
    val local = bucketed.withColumn("_lrn", row_number().over(wBkt))
    // per-(group, bucket) offsets: cumulative counts over ≤numBuckets
    // summary rows per group — bounded at any scale
    val wGrp = Window.partitionBy(col(groupCol)).orderBy(col("_rb"))
    val offsets = local.groupBy(col(groupCol), col("_rb")).agg(count(lit(1)).as("_bn"))
      .withColumn("_off", coalesce(
        sum(col("_bn")).over(wGrp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("_rb"), col("_off"))
    val ranked = local.join(broadcast(offsets), Seq(groupCol, "_rb"))
      .withColumn("_rn", col("_off") + col("_lrn"))
    val aggs = qs.map { q =>
      val name = s"p${math.round(q * 100)}"
      max(when(col("_rn") === ceil(lit(q) * col("_n")), col(valueCol))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
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
    val data = df.filter(col(valueCol).isNotNull)
    val stats = data.groupBy(col(groupCol)).agg(
      min(col(valueCol)).cast("double").as("_mn"),
      max(col(valueCol)).cast("double").as("_mx"),
      count(lit(1)).as("_n"))
    val span = when(col("_mx") > col("_mn"), col("_mx") - col("_mn")).otherwise(lit(1.0))
    val bucket = floor(least(greatest(
        (col(valueCol).cast("double") - col("_mn")) / span * numBuckets, lit(0.0)),
      lit((numBuckets - 1).toDouble))).cast("int")
    val bucketed = data.join(broadcast(stats), groupCol).withColumn("_rb", bucket)
    val wBkt = Window.partitionBy(col(groupCol), col("_rb")).orderBy(col(valueCol))
    val local = bucketed.withColumn("_lrn", row_number().over(wBkt))
    val wGrp = Window.partitionBy(col(groupCol)).orderBy(col("_rb"))
    val offsets = local.groupBy(col(groupCol), col("_rb")).agg(count(lit(1)).as("_bn"))
      .withColumn("_off", coalesce(
        sum(col("_bn")).over(wGrp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("_rb"), col("_off"))
    val ranked = local.join(broadcast(offsets), Seq(groupCol, "_rb"))
      .withColumn("_rn", col("_off") + col("_lrn"))
    val half = (col("_n") + lit(1L)).cast("double") / lit(2.0)
    ranked.groupBy(col(groupCol)).agg(
      ((max(when(col("_rn") === floor(half), col(valueCol).cast("double"))) +
        max(when(col("_rn") === ceil(half), col(valueCol).cast("double")))) / lit(2.0))
        .as(outCol))
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
        FROM $table WHERE $valueCol IS NOT NULL)
      SELECT $groupCol,
        (MAX(CASE WHEN rn = FLOOR((CAST(n AS DOUBLE) + 1) / 2)
              THEN CAST($valueCol AS DOUBLE) END) +
         MAX(CASE WHEN rn = CEIL((CAST(n AS DOUBLE) + 1) / 2)
              THEN CAST($valueCol AS DOUBLE) END)) / 2 AS $outCol
      FROM mb GROUP BY $groupCol"""

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
