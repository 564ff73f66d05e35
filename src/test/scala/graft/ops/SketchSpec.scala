package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KmvAgg

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: ids 1..4000, value domain sized
  // per group so the estimator has a known ground truth
  private lazy val grouped = spark.range(1, 4001)
    .select(col("id"),
      (col("id") % 2).cast("string").as("grp"),
      // even ids mod an even modulus hit only even residues: group
      // "0" = 2000 rows over 250 distinct, group "1" (odd ids mod
      // 1000 → odd residues) = 2000 rows over 500 distinct
      when(col("id") % 2 === 0, col("id") % 500)
        .otherwise(col("id") % 1000).as("v"))

  test("KMV distinct estimate is exact below k and within 4/sqrt(k) above") {
    val k = 128
    val est = Sketches.kmvDistinctByKey(grouped, Seq("grp"), "v", k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // both groups exceed k distinct: estimator regime, se ~ 1/sqrt(k-2)
    assert(math.abs(est("0") / 250.0 - 1.0) < 4.0 / math.sqrt(k - 2.0))
    assert(math.abs(est("1") / 500.0 - 1.0) < 4.0 / math.sqrt(k - 2.0))
    // below-k regime: exact
    val exact = Sketches.kmvDistinctByKey(grouped, Seq("grp"), "v", 2048)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact("0") == 250.0 && exact("1") == 500.0)
  }

  test("KMV sketch is partitioning-invariant (merge-order independent)") {
    val k = 64
    val a = Sketches.kmvDistinct(grouped, "v", k).head().getDouble(0)
    val b = Sketches.kmvDistinct(grouped.repartition(13, col("id")), "v", k)
      .head().getDouble(0)
    val c = Sketches.kmvDistinct(grouped.coalesce(1), "v", k).head().getDouble(0)
    assert(a == b && b == c)
  }

  test("KmvAgg serialize/deserialize/merge round-trips the k-min set") {
    val agg = KmvAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L), k = 4)
    val b1 = agg.createAggregationBuffer()
    Seq(9L, 3L, 7L, 1L, 5L).foreach(b1.add(_))
    while (b1.size > 4) b1.pollLast()
    val b2 = agg.deserialize(agg.serialize(b1))
    assert(b2.asScala.toList == List(1L, 3L, 5L, 7L))
    val other = agg.createAggregationBuffer()
    Seq(2L, 8L, 1L).foreach(other.add(_))
    val merged = agg.merge(b2, other)
    assert(merged.asScala.toList.take(4) == List(1L, 2L, 3L, 5L))
  }

  test("bottom-k sample is deterministic and uniform enough for quantiles") {
    val df = spark.range(1, 20001).select(col("id"), (col("id") * 7 % 10000).as("v"))
    val s1 = Sketches.sampleQuantiles(df, "v", "id", 400, Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val s2 = Sketches.sampleQuantiles(df.repartition(11), "v", "id", 400, Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(s1 == s2) // partitioning-invariant
    // v is uniform on [0, 10000): sample quantile within ~4/sqrt(k) in
    // quantile space
    assert(math.abs(s1(0.5) / 10000.0 - 0.5) < 4.0 / math.sqrt(400.0))
    assert(math.abs(s1(0.9) / 10000.0 - 0.9) < 4.0 / math.sqrt(400.0))
  }

  test("sampleQuantiles with k >= n degenerates to exact rank quantiles") {
    val df = spark.range(1, 101).select(col("id"), col("id").cast("double").as("v"))
    val qs = Sketches.sampleQuantiles(df, "v", "id", 1000, Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(qs(0.5) == 50.0) // ceil(0.5*100) = 50
    assert(qs(1.0) == 100.0)
  }

  test("WithCleanup hooks release the pinned sketch working sets") {
    val df = spark.range(1, 5001).select(
      col("id"), (col("id") % 97).cast("double").as("v"))
    val (qs, qsClean) = Sketches.sampleQuantilesWithCleanup(df, "v", "id", 200, Seq(0.5))
    val (ps, psClean) = Sketches.prioritySampleWithCleanup(df, "id", "v", 100, 7L)
    assert(qs.count() > 0 && ps.count() > 0)
    // both internal pins are registered while the frames are live
    val during = spark.sparkContext.getPersistentRDDs.size
    qsClean(); psClean()
    assert(spark.sparkContext.getPersistentRDDs.size <= during - 2,
      s"cleanup hooks did not unpersist (still $during persistent RDDs)")
  }

  test("per-group sample quantiles: k >= group size is exact, partitioning-invariant") {
    val df = spark.range(1, 301).select(col("id"),
      (col("id") % 3).cast("string").as("g"),
      col("id").cast("double").as("v"))
    // k >= every group (100 rows each): rank selection is exact
    val qs = Sketches.sampleQuantilesByKey(df, Seq("g"), "v", "id", 512, Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // group "1" = {1,4,...,298}: median = value at rank 50 = 148
    assert(qs(("1", 0.5)) == 148.0)
    assert(qs(("1", 1.0)) == 298.0)
    assert(qs(("0", 1.0)) == 300.0)
    val qs2 = Sketches.sampleQuantilesByKey(
      df.repartition(7, col("v")), Seq("g"), "v", "id", 512, Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(qs == qs2)
  }

  test("per-group sample quantiles: aggregate path ≡ windowed path, windowless plan") {
    // k < group size — the REAL sampling regime, where the bottom-k
    // selection (not just rank arithmetic) must agree between the two
    // implementations entry for entry
    val df = spark.range(1, 2001).select(col("id"),
      (col("id") % 4).cast("string").as("g"),
      (col("id") * 7 % 1000).cast("double").as("v"))
    val qs = Seq(0.25, 0.5, 0.9)
    val agg = Sketches.sampleQuantilesByKey(df, Seq("g"), "v", "id", 64, qs)
    val win = Sketches.sampleQuantilesByKeyWindowed(df, Seq("g"), "v", "id", 64, qs)
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(asMap(agg) == asMap(win))
    // the aggregate path must carry no window at all: the windows were
    // the measured ~linear term at the sf100 decade (r14 exponent 1.03)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"), plan)
  }

  test("per-group sample quantiles: STRING ids take the aggregate path, ≡ windowed") {
    // round-16 (verdict-15 item 7): non-integral ids no longer fall
    // back to the O(rows)-shuffle window form — the string-id
    // aggregate must select the identical sample (same h60 hash, id
    // tie-break in the same string order) and carry no window
    val df = spark.range(1, 2001).select(
      concat(lit("doc-"), col("id")).as("id"),
      (col("id") % 4).cast("string").as("g"),
      (col("id") * 7 % 1000).cast("double").as("v"))
    val qs = Seq(0.25, 0.5, 0.9)
    val agg = Sketches.sampleQuantilesByKey(df, Seq("g"), "v", "id", 64, qs)
    val win = Sketches.sampleQuantilesByKeyWindowed(df, Seq("g"), "v", "id", 64, qs)
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(asMap(agg) == asMap(win))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // partitioning invariance holds for the string-id aggregate too
    val agg2 = Sketches.sampleQuantilesByKey(
      df.repartition(13, col("v")), Seq("g"), "v", "id", 64, qs)
    assert(asMap(agg) == asMap(agg2))
    // non-numeric value: loud rejection, not a silent window fallback
    intercept[IllegalArgumentException] {
      Sketches.sampleQuantilesByKey(
        df.withColumn("v", col("v").cast("string")), Seq("g"), "v", "id", 64, qs)
    }
  }

  test("bottom-k hash aggregate: merge-order / partitioning invariance") {
    val df = spark.range(1, 1001).select(col("id"),
      lit("k").as("g"), (col("id") % 97).cast("double").as("v"))
    def sample(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(graft.functions.SketchFunctions.bottomKByHash(
          graft.ops.Sketches.h60(concat_ws("|", lit("t"), col("id").cast("string"))),
          col("id"), col("v"), 32).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.h"), col("e.id"), col("e.value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = sample(df.coalesce(1))
    val b = sample(df.repartition(13, col("v")))
    assert(a == b) // ascending order AND membership identical
    assert(a.size == 32)
  }

  test("priority sample: n <= k returns everything with est_weight = weight") {
    val df = spark.range(1, 51).select(col("id"), (col("id") % 7 + 1).cast("double").as("w"))
    val out = Sketches.prioritySample(df, "id", "w", k = 100, seed = 1L).collect()
    assert(out.length == 50)
    assert(out.forall(r => r.getDouble(1) == r.getDouble(2)))
  }

  test("priority sample: subset-sum estimator lands near the true total") {
    // skewed weights: a few heavy rows dominate — the regime priority
    // sampling is built for (heavy rows enter w.p. 1, est = w exact)
    val df = spark.range(1, 5001).select(col("id"),
      when(col("id") <= 10, 10000.0).otherwise(1.0).as("w"))
    val trueTotal = 10 * 10000.0 + 4990 * 1.0
    val sampled = Sketches.prioritySample(df, "id", "w", k = 500, seed = 42L)
    val estTotal = sampled.agg(sum("est_weight")).head().getDouble(0)
    // DLT estimator: heavy rows exact, light-tail noise O(total/sqrt(k))
    assert(math.abs(estTotal / trueTotal - 1.0) < 0.15,
      s"est $estTotal vs true $trueTotal")
    // heavy rows must all be present
    assert(sampled.filter(col("id") <= 10).count() == 10)
  }

  test("prioritySampleByKey on one group equals the global prioritySample") {
    val df = spark.range(1, 2001).select(col("id"),
      lit("g").as("grp"), (pmod(col("id"), lit(19)) + 1).cast("double").as("w"))
    val global = Sketches.prioritySample(df, "id", "w", 100, 3L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val grouped = Sketches.prioritySampleByKey(df, Seq("grp"), "id", "w", 100, 3L)
      .select(col("id"), col("weight"), col("est_weight"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(grouped == global)
  }

  test("prioritySampleByKey is partitioning-invariant and respects group budgets") {
    val df = spark.range(1, 3001).select(col("id"),
      (col("id") % 3).cast("string").as("grp"),
      (pmod(col("id"), lit(11)) + 1).cast("double").as("w"))
    val a = Sketches.prioritySampleByKey(df, Seq("grp"), "id", "w", 50, 9L)
    val rowsA = a.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSet
    val b = Sketches.prioritySampleByKey(
      df.repartition(17, col("id")), Seq("grp"), "id", "w", 50, 9L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSet
    assert(rowsA == b)
    val perGroup = rowsA.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perGroup.values.forall(_ == 50)) // 1000 rows per group >> k
  }

  test("duplicate entries cannot shrink the top-k priority buffer") {
    // every row duplicated: the same (pri, id, w) entry reaches a full
    // buffer repeatedly (and merge unions buffers containing the same
    // entries) — an unconditional evict-after-add would shrink the
    // sample below k and shift the τ slot
    val base = spark.range(1, 2001).select(col("id"),
      lit("g").as("grp"), (pmod(col("id"), lit(19)) + 1).cast("double").as("w"))
    val dup = base.unionAll(base).repartition(13, col("w"))
    val fromDup = Sketches.prioritySampleByKey(dup, Seq("grp"), "id", "w", 100, 3L)
      .select(col("id"), col("weight"), col("est_weight"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val fromBase = Sketches.prioritySampleByKey(base, Seq("grp"), "id", "w", 100, 3L)
      .select(col("id"), col("weight"), col("est_weight"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(fromDup.size == 100)
    assert(fromDup == fromBase)
  }

  test("priority sample is partitioning-invariant") {
    val df = spark.range(1, 3001).select(col("id"), (pmod(col("id"), lit(13)) + 1).cast("double").as("w"))
    val a = Sketches.prioritySample(df, "id", "w", 64, 7L)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val b = Sketches.prioritySample(df.repartition(17, col("w")), "id", "w", 64, 7L)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("count-min sketch: never underestimates, bounded excess, mergeable by sum") {
    // zipf-ish corpus: item j appears 2000/j times
    val data = (1 to 50).flatMap(j => Seq.fill(2000 / j)(j.toLong)).toDF("item")
    val n = data.count()
    val (d, w) = (3, 256)
    val cms = Sketches.cmsBuild(data, "item", d, w, seed = 1L)
    val probes = spark.range(1, 51).select(col("id").as("item"))
    val est = Sketches.cmsEstimate(cms, probes, d, w, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = (1 to 50).map(j => j.toLong -> (2000L / j)).toMap
    est.foreach { case (item, e) =>
      assert(e >= exact(item), s"CMS underestimated item $item")
      // E[excess] = n/w per row; min over d rows makes 8n/w generous
      assert(e <= exact(item) + 8 * n / w, s"item $item: est $e exact ${exact(item)}")
    }
    // merge = union + sum: sketch(a ∪ b) == sketch(a) + sketch(b)
    val a = Sketches.cmsBuild(data.filter(col("item") <= 25), "item", d, w, 1L)
    val b = Sketches.cmsBuild(data.filter(col("item") > 25), "item", d, w, 1L)
    val merged = a.unionByName(b).groupBy(col("row"), col("bucket"))
      .agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cms.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("HLL distinct estimate lands within 4 standard errors of truth") {
    // b=8 -> m=256 registers, se ~ 1.04/16 = 6.5%
    val est = Sketches.hllDistinctByKey(grouped, Seq("grp"), "v", b = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(est("0") / 250.0 - 1.0) < 4 * 1.04 / 16.0, s"got ${est("0")}")
    assert(math.abs(est("1") / 500.0 - 1.0) < 4 * 1.04 / 16.0, s"got ${est("1")}")
  }

  test("HLL small-range branch (linear counting) is near-exact") {
    // 40 distinct over m=256 registers: E <= 2.5m -> m*ln(m/V) branch,
    // which is near-exact when n << m (collision-corrected occupancy)
    val small = spark.range(1, 2001).select(col("id"), (col("id") % 40).as("v"))
    val e = Sketches.hllDistinct(small, "v", b = 8).head().getDouble(0)
    assert(math.abs(e - 40.0) < 4.0, s"linear-counting estimate $e")
  }

  test("HLL sketch is partitioning-invariant (bitwise)") {
    val a = Sketches.hllDistinct(grouped, "v", b = 8).head().getDouble(0)
    val b = Sketches.hllDistinct(grouped.repartition(13, col("id")), "v", b = 8)
      .head().getDouble(0)
    val c = Sketches.hllDistinct(grouped.coalesce(1), "v", b = 8).head().getDouble(0)
    assert(a == b && b == c)
  }

  test("HLL agg face is bitwise identical to the relational face") {
    // the native HllRegistersAgg (one shuffle, streaming-safe) and the
    // two-level groupBy must produce the SAME double — identical
    // integer harmonic sums through the shared estimator tree
    val rel = Sketches.hllDistinctByKey(grouped, Seq("grp"), "v", b = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val agg = Sketches.hllDistinctAggByKey(grouped, Seq("grp"), "v", b = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rel == agg)
    // and under a different partitioning (merge path exercised)
    val agg13 = Sketches.hllDistinctAggByKey(
      grouped.repartition(13, col("id")), Seq("grp"), "v", b = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(agg13 == rel)
  }

  test("HllRegistersAgg serde round-trips and merge is elementwise max") {
    val a = graft.functions.HllRegistersAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), b = 4)
    val b1 = a.createAggregationBuffer()
    b1(3) = 5; b1(7) = 2
    val b2 = a.deserialize(a.serialize(b1))
    assert(b2.toSeq == b1.toSeq)
    assert(!(b2 eq b1)) // defensive copy, no aliasing
    val other = a.createAggregationBuffer()
    other(3) = 4; other(7) = 9; other(0) = 1
    val merged = a.merge(b2, other)
    assert(merged(3) == 5 && merged(7) == 9 && merged(0) == 1)
  }

  test("HLL register split matches the definition on a known hash") {
    // one value: its single register must be bucket=h>>52,
    // rho=53-bitlen(low 52 bits); estimate then rides the
    // linear-counting branch with V=255 -> m*ln(m/255)
    val one = Seq(("x", 42L)).toDF("grp", "v")
    val e = Sketches.hllDistinct(one, "v", b = 8).head().getDouble(0)
    val expected = BigDecimal(256.0 * math.log(256.0 / 255.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(e == expected, s"$e vs $expected")
  }

  private implicit class JavaTreeSetOps(ts: java.util.TreeSet[java.lang.Long]) {
    def asScala: Iterator[Long] = {
      val it = ts.iterator()
      new Iterator[Long] {
        def hasNext = it.hasNext
        def next() = it.next()
      }
    }
  }
}
