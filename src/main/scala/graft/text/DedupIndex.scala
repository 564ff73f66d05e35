package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup deduplication: a PERSISTED MinHash-LSH
  * signature index over the corpus, probed by each new ingest batch —
  * the daily-crawl pattern, where re-running [[Dedup]]'s batch
  * self-join over corpus ∪ batch would re-shingle and re-shuffle the
  * full 100 TB corpus for every arriving shard.
  *
  * Index layout under `path` (plain parquet — readable by any engine):
  *  - `bands/`  (doc_id, band_idx, band_hash): the LSH membership
  *    triples, ~20 B × bands per document;
  *  - `sigs/`   (doc_id, mh_0..mh_{k-1}): the signatures, for the
  *    jaccard estimate on candidates.
  * Both are pure row-local functions of each document (signatures are
  * deterministic — INVARIANTS.md §1), so [[append]] is just additional
  * parquet files: append-then-probe ≡ rebuild-then-probe exactly
  * (DedupIndexSpec asserts it), with no compaction or merge step.
  *
  * Probe scale contract (the asymmetry is the point — `batch` is the
  * small side, the corpus is unbounded):
  *  - the corpus never shuffles in the NORMAL regime: the candidate
  *    join broadcasts the batch's banded triples against one scan of
  *    `bands/`, and the signature joins broadcast the candidates
  *    against one scan of `sigs/` (same shape as
  *    [[Dedup.contaminationScores]]'s broadcast probe). Worst case the
  *    bucket cap alone permits is |batchTriples| × maxBucketRows
  *    candidates — NOT batch-sized — so the probe gates the broadcast
  *    plan on an exact candidate-count bound and falls back to shuffle
  *    joins above [[DefaultMaxBroadcastCandidates]] (identical pairs,
  *    degraded cost, never an OOM);
  *  - skew: a batch band-hash that hits an oversized corpus bucket
  *    (boilerplate clusters — the LSH mega-bucket mode) is dropped by
  *    the `maxBucketRows` cap BEFORE the join fans out, from one
  *    aggregate-only histogram pass over `bands/`; the dropped buckets
  *    are the standard [[Dedup.minHashOversizedBuckets]] playbook
  *    (their members are near-identical — route to exact dedup on the
  *    band hash).
  */
object DedupIndex {

  /** Corpus-side LSH bucket cap (rows per (band_idx, band_hash) bucket
    * a probe will join against). Named so oracle SQL can interpolate
    * the SAME constant the library default uses — a silent default
    * change can then never diverge the two sides. */
  val DefaultMaxBucketRows: Long = 100000L

  /** Candidate-pair ceiling for the BROADCAST probe plan. The bucket
    * cap alone bounds candidates only to |batchTriples| × maxBucketRows
    * — a dup-heavy batch whose every band lands in a near-cap corpus
    * bucket can legitimately produce candidate sets far beyond
    * "batch-sized", and broadcasting those would OOM the driver, not
    * degrade gracefully. probePairs therefore pre-computes the exact
    * pre-distinct candidate count from the bucket histogram it already
    * builds (aggregate-only — never the membership rows) and, above
    * this ceiling, drops the broadcast hints: the SAME pairs via
    * shuffle joins (results identical; the corpus pays one shuffle —
    * the documented degraded mode, still never a rescan of the text).
    * 2M pairs ≈ tens of MB broadcast at typical id widths. */
  val DefaultMaxBroadcastCandidates: Long = 2000000L

  /** Write (or overwrite) the index for `docs`. Documents with no
    * shingles (< shingleSize words) have null signatures and are not
    * indexed — they cannot be near-dup candidates. */
  def write(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      numHashes: Int = 32,
      bands: Int = 8): Unit =
    writeMode(docs, idCol, textCol, path, numHashes, bands, "overwrite")

  /** Incrementally add a new shard to an existing index (row-local
    * computation, parquet file append — no read-modify-write of the
    * existing index). Caller contract: ids must be new; appending an
    * id twice yields self-candidate pairs on later probes. */
  def append(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      numHashes: Int = 32,
      bands: Int = 8): Unit =
    writeMode(docs, idCol, textCol, path, numHashes, bands, "append")

  private def writeMode(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      numHashes: Int, bands: Int, mode: String): Unit = {
    val sigs = Dedup.minHashSignatures(docs, idCol, textCol, numHashes)
      .filter(col("mh_0").isNotNull)
      // one signature computation feeds both tables (the two writes
      // are separate jobs; without the pin the shingle+minhash pass —
      // the expensive part — would run twice)
      .persist(graft.ops.Caches.memoLevel(docs.sparkSession))
    try {
      sigs.write.mode(mode).parquet(s"$path/sigs")
      Dedup.bandedTriples(sigs, idCol, numHashes, bands)
        .write.mode(mode).parquet(s"$path/bands")
    } finally { sigs.unpersist(); () }
  }

  /** Rewrite the index WITHOUT duplicate rows into `newPath` and
    * return the (docs, bandRows) counts after compaction. Duplicate
    * rows accumulate only from replayed ingest epochs whose append
    * committed but whose marker write was lost
    * ([[graft.streaming.DocStream.ingestBatch]]) — they are benign for
    * probe correctness (candidates are distinct'd, newDocs decisions
    * are set-based) but pay scan cost forever. Compaction keeps one
    * sigs row per doc_id and one bands row per (doc_id, band_idx,
    * band_hash); signatures are deterministic functions of the text,
    * so "any row per doc" is THE row. Writes to a NEW path — the swap
    * is the caller's pointer flip (same contract as the ANN index's
    * versioned layouts); compacting in place would expose readers to
    * a half-rewritten index. */
  def compact(spark: SparkSession, path: String, newPath: String): (Long, Long) = {
    require(newPath != path, "compact writes to a NEW path (atomic pointer swap is the caller's)")
    val sigs = spark.read.parquet(s"$path/sigs").dropDuplicates("doc_id")
    sigs.write.mode("overwrite").parquet(s"$newPath/sigs")
    val bands = spark.read.parquet(s"$path/bands").distinct()
    bands.write.mode("overwrite").parquet(s"$newPath/bands")
    (spark.read.parquet(s"$newPath/sigs").count(),
      spark.read.parquet(s"$newPath/bands").count())
  }

  // ---- versioned index ROOT: `root/v<N>` dirs + an atomically-swapped
  //      `_graft_current` pointer, so [[compact]]'s "the swap is the
  //      caller's pointer flip" contract has a first-class caller —
  //      the same protocol as the ANN serving index
  //      ([[graft.sim.AnnIndex.publishCurrent]]), minus the centroid
  //      payload (an LSH signature index has no probe-side constants).
  //      A reader resolves (version) ONCE and scans only that
  //      version's sigs/ + bands/, so a concurrent compact+repoint
  //      never tears its view; superseded versions are first-class GC
  //      targets for [[sweepVersions]]. ----
  private val CurrentPointer = "_graft_current"
  private val VersionDirRe = """v(\d+)""".r

  /** Atomically repoint `root`'s live index version (tmp + rename). */
  def publishCurrent(spark: SparkSession, root: String, version: String): Unit = {
    val base = new org.apache.hadoop.fs.Path(root)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(base, CurrentPointer + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(base, CurrentPointer)
    if (!fs.rename(tmp, dst)) { // HDFS refuses rename-onto; replace explicitly
      fs.delete(dst, false)
      require(fs.rename(tmp, dst), s"could not publish current pointer at $dst")
    }
  }

  /** The live version dir name, if published. Empty/torn pointers read
    * as unpublished. */
  def resolveCurrent(spark: SparkSession, root: String): Option[String] =
    try {
      val base = new org.apache.hadoop.fs.Path(root)
      val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
      val p = new org.apache.hadoop.fs.Path(base, CurrentPointer)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val body =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        if (body.isEmpty) None else Some(body)
      }
    } catch { case _: java.io.FileNotFoundException => None }

  /** Resolve the live version, initializing (and publishing) `v1` when
    * the root is unversioned — the ingest loop's entry point. */
  def resolveOrInit(spark: SparkSession, root: String): String =
    resolveCurrent(spark, root).getOrElse {
      publishCurrent(spark, root, "v1"); "v1"
    }

  /** [[compact]] under the versioned-root convention: rewrite the live
    * version without duplicate rows into `root/v<N+1>` and repoint.
    * Returns (new version dir, (docs, bandRows)). Single-writer like
    * all maintenance ops — version transitions are the ingest
    * pipeline's serialized job; concurrent READERS are safe (they hold
    * a resolved version whose files [[sweepVersions]]' retention
    * window protects). */
  def compactCurrent(spark: SparkSession, root: String): (String, (Long, Long)) = {
    val live = resolveCurrent(spark, root).getOrElse(
      throw new IllegalStateException(s"no current pointer under $root"))
    val n = live match { case VersionDirRe(v) => v.toLong; case _ => 0L }
    val next = s"v${n + 1}"
    val counts = compact(spark, s"$root/$live", s"$root/$next")
    publishCurrent(spark, root, next)
    (next, counts)
  }

  /** Retention sweep for superseded versions: delete `root/v<N>` dirs
    * that are neither the live version nor among the `keep` highest.
    * Size `keep` to exceed the longest probe's lifetime in versions —
    * an in-flight reader of the just-superseded version needs its
    * grace window (same rule as AnnIndex.sweepIndexVersions). */
  def sweepVersions(spark: SparkSession, root: String, keep: Int = 2): Unit = {
    require(keep >= 1, "must keep at least the live version")
    val base = new org.apache.hadoop.fs.Path(root)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val live = resolveCurrent(spark, root)
    val versions = fs.listStatus(base).iterator
      .filter(_.isDirectory).map(_.getPath.getName)
      .collect { case name @ VersionDirRe(n) => (n.toLong, name) }
      .toSeq.sortBy(_._1)
    val retained = versions.takeRight(keep).map(_._2).toSet ++ live
    versions.map(_._2).filterNot(retained).foreach { name =>
      fs.delete(new org.apache.hadoop.fs.Path(base, name), true): Unit
    }
  }

  /** Cross near-dup candidates (corpus_id, batch_id, est_jaccard) of a
    * new batch against the indexed corpus. `est_jaccard` is the
    * fraction of agreeing minhash slots ([[Dedup.minHashJaccard]]);
    * filter it against the caller's threshold. Within-batch pairs are
    * NOT included — run the batch through the standard
    * [[Dedup.minHashCandidatePairsBounded]] self-join for those. */
  def probePairs(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBucketRows: Long = DefaultMaxBucketRows,
      maxBroadcastCandidates: Long = DefaultMaxBroadcastCandidates): DataFrame = {
    val batchSigs = Dedup.minHashSignatures(batch, idCol, textCol, numHashes)
      .filter(col("mh_0").isNotNull)
    val batchBanded = Dedup.bandedTriples(batchSigs, idCol, numHashes, bands)
      .withColumnRenamed(idCol, "batch_id")
    val corpusBands = spark.read.parquet(s"$path/bands")

    // hot-bucket cap: one aggregate-only histogram over the index
    // (map-side partials — one row per bucket per task, never the
    // membership rows), restricted to the probed buckets, drives a
    // left_semi prune of the batch triples. Everything broadcast here
    // is batch-sized.
    val probed = corpusBands
      .join(broadcast(batchBanded.select(col("band_idx"), col("band_hash")).distinct()),
        Seq("band_idx", "band_hash"), "left_semi")
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("_bn"))
    val okBuckets = probed.filter(col("_bn") <= maxBucketRows)
      .select(col("band_idx"), col("band_hash"))
    val batchOk = batchBanded
      .join(broadcast(okBuckets), Seq("band_idx", "band_hash"), "left_semi")

    // broadcast-safety gate: the bucket cap bounds candidates only to
    // |batchTriples| × maxBucketRows, so before building the join pick
    // the plan from the EXACT pre-distinct candidate count — Σ over
    // capped probed buckets of corpusRows × batchRows. One extra
    // aggregate-only pass over bands/ (semi-pruned to the probed
    // buckets), same shape as the histogram above; the membership rows
    // still never reach the driver.
    val batchPerBucket = batchBanded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("_bb"))
    val candUpperBound = probed
      .filter(col("_bn") <= maxBucketRows)
      .join(broadcast(batchPerBucket), Seq("band_idx", "band_hash"))
      .agg(coalesce(sum(col("_bn") * col("_bb")), lit(0L)))
      .head().getLong(0)
    // above the ceiling the SAME joins run unhinted (shuffle): results
    // identical, the corpus pays a bands/+sigs/ shuffle instead of an
    // impossible broadcast
    val bcast: DataFrame => DataFrame =
      if (candUpperBound <= maxBroadcastCandidates) broadcast else identity

    // candidate join: ONE scan of bands/, batch side broadcast — the
    // corpus membership rows never shuffle (broadcast regime)
    val cand = corpusBands
      .join(bcast(batchOk), Seq("band_idx", "band_hash"))
      .select(col(idCol).as("corpus_id"), col("batch_id"))
      .distinct()

    // jaccard estimate: corpus sigs scanned once, candidates broadcast
    val sigsRaw = spark.read.parquet(s"$path/sigs")
    val corpusSigs = sigsRaw.toDF(sigsRaw.columns.map(c =>
      if (c == idCol) "corpus_id" else s"a_$c").toIndexedSeq: _*)
    val bSigs = batchSigs.toDF(batchSigs.columns.map(c =>
      if (c == idCol) "batch_id" else s"b_$c").toIndexedSeq: _*)
    val agree = (0 until numHashes)
      .map(i => when(col(s"a_mh_$i") === col(s"b_mh_$i"), 1).otherwise(0))
      .reduce(_ + _)
    corpusSigs
      .join(bcast(cand), Seq("corpus_id"))
      .join(broadcast(bSigs), Seq("batch_id"))
      .select(col("corpus_id"), col("batch_id"),
        (agree.cast("double") / numHashes).as("est_jaccard"))
  }

  /** The ingest decision: batch documents with NO corpus near-dup at
    * `threshold` (the rows to keep). Null-signature batch docs (< 3
    * words) have no candidates and are kept. */
  def newDocs(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBucketRows: Long = DefaultMaxBucketRows,
      maxBroadcastCandidates: Long = DefaultMaxBroadcastCandidates): DataFrame = {
    val dups = probePairs(
      spark, path, batch, idCol, textCol, numHashes, bands, maxBucketRows,
      maxBroadcastCandidates)
      // self-matches excluded: ids are globally unique in normal use
      // (nothing matches), and after a CRASHED ingest epoch whose
      // index append committed but whose marker did not, the replayed
      // batch finds ITSELF in the index — without this guard every
      // replayed document would score est=1.0 against its own prior
      // append and be dropped (DocStream.ingestBatch idempotence)
      .filter(col("corpus_id") =!= col("batch_id"))
      .filter(col("est_jaccard") >= threshold)
      .select(col("batch_id").as(idCol))
      .distinct()
    batch.join(broadcast(dups), Seq(idCol), "left_anti")
  }
}
