package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  // fact keyed 1..10000 cycling; dim holds keys 1..100 only
  private lazy val fact = spark.range(1, 50001)
    .select(col("id").as("row_id"), (col("id") % 10000 + 1).as("k"),
      (col("id") % 7).cast("double").as("w"))
  private lazy val dim = spark.range(1, 101).select(col("id").as("dk"))

  test("bloom filter has zero false negatives and a low fp rate") {
    val f = BloomPrune.build(dim, "dk", nBits = 4096, nHashes = 3, seed = 7L)
    // every dim key must pass
    val misses = dim.filter(!f.contains(col("dk"))).count()
    assert(misses == 0L, s"$misses false negatives")
    // realized fp rate on known non-members tracks the analytic rate
    val nonMembers = spark.range(20001, 30001).select(col("id").as("k"))
    val fp = nonMembers.filter(f.contains(col("k"))).count()
    assert(f.fpRate < 0.01, s"analytic fp ${f.fpRate}")
    assert(fp <= 10000 * (f.fpRate * 5 + 0.001), s"$fp false positives at ${f.fpRate}")
  }

  test("semiJoin result is identical to the plain left_semi join") {
    val pruned = BloomPrune.semiJoin(fact, "k", dim, "dk", nBits = 1024)
      .orderBy(col("row_id")).collect()
    val plain = fact.join(dim, fact("k") === dim("dk"), "left_semi")
      .orderBy(col("row_id")).collect()
    assert(pruned.sameElements(plain))
    assert(pruned.nonEmpty)
  }

  test("the bloom predicate prunes before the join (fact side shrinks)") {
    val f = BloomPrune.build(dim, "dk", nBits = 4096, nHashes = 3)
    val pass = fact.filter(f.contains(col("k"))).count()
    val members = fact.join(dim, fact("k") === dim("dk"), "left_semi").count()
    // all members pass, plus at most a small fp margin of the 49500
    // non-member rows — the shuffle-volume claim in the scaladoc
    assert(pass >= members)
    assert(pass <= members + (50000 * (f.fpRate * 5 + 0.001)).toLong,
      s"pass=$pass members=$members fp=${f.fpRate}")
  }

  test("null and absent keys never pass; undersized filter still exact") {
    val withNulls = Seq((1L, Option(5L)), (2L, None), (3L, Option(999999L)))
      .toDF("row_id", "k")
    val out = BloomPrune.semiJoin(withNulls, "k", dim, "dk", nBits = 64, nHashes = 2)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    // nBits=64 for 100 keys: heavily saturated bloom (fp ~ 1) — the
    // exact join still removes every false positive
    val sat = BloomPrune.build(dim, "dk", nBits = 64, nHashes = 2)
    assert(sat.fpRate > 0.5) // saturated indeed
    val pruned = BloomPrune.semiJoin(fact, "k", dim, "dk", nBits = 64, nHashes = 2)
    val plain = fact.join(dim, fact("k") === dim("dk"), "left_semi")
    assert(pruned.count() == plain.count())
  }

  test("string keys take the md5 family with the same guarantees") {
    val sdim = dim.select(concat(lit("k"), col("dk")).as("dk"))
    val sfact = fact.select(col("row_id"), concat(lit("k"), col("k")).as("k"))
    val f = BloomPrune.build(sdim, "dk", nBits = 4096, nHashes = 3, seed = 7L)
    assert(!f.longKeys)
    assert(sdim.filter(!f.contains(col("dk"))).count() == 0L) // no false negatives
    val pruned = BloomPrune.semiJoin(sfact, "k", sdim, "dk", nBits = 4096)
      .orderBy(col("row_id")).collect()
    val plain = sfact.join(sdim, sfact("k") === sdim("dk"), "left_semi")
      .orderBy(col("row_id")).collect()
    assert(pruned.sameElements(plain) && pruned.nonEmpty)
  }

  test("integral keys take the SplitMix64 family (build and probe agree)") {
    val f = BloomPrune.build(dim, "dk", nBits = 4096, nHashes = 3)
    assert(f.longKeys)
    // int-typed probe column casts into the same family
    val intFact = fact.select(col("row_id"), col("k").cast("int").as("k"))
    assert(intFact.join(dim, intFact("k") === dim("dk"), "left_semi").count() ==
      BloomPrune.semiJoin(intFact, "k", dim, "dk", nBits = 4096).count())
  }

  test("estimatedKeys tracks the true insert count") {
    val f = BloomPrune.build(dim, "dk", nBits = 4096, nHashes = 3)
    assert(math.abs(f.estimatedKeys - 100.0) < 20.0, s"est=${f.estimatedKeys}")
    // an UNDERSIZED filter's estimate saturates near (m/k)·ln(m) — it
    // can only underestimate, so the auto hint degrades to "no hint"
    // (the always-correct planner choice), never to a wrong result
    val sat = BloomPrune.build(dim, "dk", nBits = 64, nHashes = 2)
    assert(sat.estimatedKeys > 50.0 && sat.estimatedKeys < 64.0 * 5)
  }

  test("auto dim hint flips the fp-removal join at the key threshold") {
    def joinNodes(df: org.apache.spark.sql.DataFrame): String = {
      df.count() // finalize AQE
      df.queryExecution.executedPlan.toString
    }
    // small dim (100 keys, default AutoDimHint): planner's broadcast wins
    val small = BloomPrune.semiJoin(fact, "k", dim, "dk", nBits = 4096)
    val smallPlan = joinNodes(small)
    assert(smallPlan.contains("BroadcastHashJoin") && !smallPlan.contains("ShuffledHashJoin"),
      smallPlan)
    // big dim (2M keys > ShuffleHashDimKeys): auto resolves shuffle_hash.
    // nBits = 2^24 keeps the load factor low so the estimate is accurate.
    val bigDim = spark.range(1, 2000001).select(col("id").as("dk"))
    val fBig = BloomPrune.build(bigDim, "dk", nBits = 1 << 24, nHashes = 3)
    assert(fBig.estimatedKeys > BloomPrune.ShuffleHashDimKeys, s"est=${fBig.estimatedKeys}")
    val big = BloomPrune.semiJoin(fact, "k", bigDim, "dk", nBits = 1 << 24)
    val bigPlan = joinNodes(big)
    assert(bigPlan.contains("ShuffledHashJoin"), bigPlan)
    // forced None keeps the planner's choice even at the big dim
    val forced = BloomPrune.semiJoin(fact, "k", bigDim, "dk", nBits = 1 << 24,
      dimHint = None)
    assert(!joinNodes(forced).contains("ShuffledHashJoin"))
  }

  test("auto hint never fires on an untrustworthy or out-of-band estimate (r17)") {
    // FULLY saturated filter: estimate diverges to +Inf — before the
    // r17 guard this FORCED shuffle_hash on an arbitrarily large dim
    // (ADVICE r16); now it must degrade to "no hint"
    val sat = BloomPrune.Filter(nHashes = 2, nBits = 64, seed = 0L,
      words = Array(-1L), longKeys = true)
    assert(sat.estimatedKeys.isInfinity)
    assert(!sat.estimateTrustworthy)
    assert(BloomPrune.resolveAutoHint(sat).isEmpty)
    // overloaded (fpRate > 0.5) but not fully saturated: also distrusted
    val hot = BloomPrune.Filter(nHashes = 1, nBits = 64, seed = 0L,
      words = Array(0x00ffffffffffffffL), longKeys = true) // 56/64 bits
    assert(hot.fpRate > 0.5 && hot.bitsSet < hot.nBits)
    assert(BloomPrune.resolveAutoHint(hot).isEmpty)
    // in-band trusted estimate fires; past the measured upper bound it
    // degrades to the planner even though the estimate is trusted
    val mk = (nBits: Int, load: Double) => {
      val words = new Array[Long](nBits / 64)
      val setBits = (nBits * load).toInt
      (0 until setBits).foreach(i => words(i / 64) |= (1L << (i % 64)))
      BloomPrune.Filter(nHashes = 3, nBits = nBits, seed = 0L, words, longKeys = true)
    }
    val inBand = mk(1 << 25, 0.25) // est ≈ 3.2M keys ∈ (1M, 64M]
    assert(inBand.estimateTrustworthy &&
      inBand.estimatedKeys > BloomPrune.ShuffleHashDimKeys)
    assert(BloomPrune.resolveAutoHint(inBand).contains("shuffle_hash"))
    val pastBand = mk(1 << 27, 0.79) // trusted (fp ~0.49) but est ≈ 70M > 64M
    assert(pastBand.estimateTrustworthy &&
      pastBand.estimatedKeys > BloomPrune.MaxAutoShuffleHashKeys)
    assert(BloomPrune.resolveAutoHint(pastBand).isEmpty)
    // end-to-end: a saturated build over a >1M-key dim keeps the
    // planner's join AND the exact result
    val bigDim = spark.range(1, 1200001).select(col("id").as("dk"))
    val pruned = BloomPrune.semiJoin(fact, "k", bigDim, "dk", nBits = 64, nHashes = 2)
    pruned.count()
    assert(!pruned.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
    assert(pruned.count() ==
      fact.join(bigDim, fact("k") === bigDim("dk"), "left_semi").count())
  }

  test("build rejects invalid shapes") {
    intercept[IllegalArgumentException] {
      BloomPrune.build(dim, "dk", nBits = 100) // not a multiple of 64
    }
    intercept[IllegalArgumentException] {
      BloomPrune.build(dim, "dk", nBits = 1024, nHashes = 0)
    }
  }
}
