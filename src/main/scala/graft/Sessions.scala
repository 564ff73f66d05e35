package graft

import org.apache.spark.sql.SparkSession

/** The production session profile — the heap-aware tuning the
  * benchmark harness certified at sf10/sf100, packaged so LIBRARY
  * users get the same session shape instead of it living only in
  * `graft.Bench`'s builder (round-13 verdict item 8).
  *
  * What the profile encodes (evidence in Bench.scala's round-11..13
  * annotations and BENCH_NOTES):
  *  - `nanosAsLong`: driver testdata has shipped TIMESTAMP(NANOS)
  *    parquet (INVARIANTS.md §4) — every session must read it.
  *  - AQE on + shuffles BORN WIDE (64, or 256 on constrained heaps)
  *    and coalesced down by runtime stats: bounds concurrent SMJ sort
  *    working sets; the 8 GiB OOM modes died exactly here.
  *  - `storageFraction 0.3`: the library's session-lifetime memo
  *    caches (span histograms, minhash triples, ANN layouts) are
  *    MEMORY_AND_DISK — protecting the default 50% of unified memory
  *    for them starved execution on constrained heaps.
  *  - `periodicGC 2min`: completed queries' shuffle files are only
  *    reclaimed after a driver GC; the 30 min default outlives whole
  *    runs and accumulated >20 GB of dead shuffle scratch at sf100.
  *
  * "Constrained heap" = under [[graft.ops.Caches.MinHeapPerCoreMb]]
  * per core — the same floor that degrades memo caches to DISK_ONLY.
  */
object Sessions {

  /** The SMJ-heavy families whose concurrent sort working sets cause
    * the constrained-heap OOM mode — ONLY these keep the wide (256)
    * initial shuffle width there; everything else plans at 64
    * (measured 35-50% faster at 8g/sf10, identical on provisioned
    * heaps where both resolve to 64). Membership is the
    * round-11/12 crash + heavy-tail evidence: the span family (SMJ
    * chains over gram pairs), the pair-join family (banded triples
    * self-joins), and the TF shuffle pair tfidf/lm. */
  val WideFamilies: Set[String] = Set(
    "q_shared_span_pairs", "q_span_budget_pairs", "q_span_budget_clusters",
    "q_winnowing_fingerprints", "q_jaccard_pairs",
    "q_neardup_budget_pairs", "q_neardup_budget_clusters",
    "q_dedup_clusters", "q_tfidf_topk", "q_lm_score")

  /** Same floor [[graft.ops.Caches.memoLevelFor]] uses: under
    * ~384 MB/core the session is "constrained" — memos go DISK_ONLY
    * and shuffles start wide. */
  def constrainedHeap(maxHeapBytes: Long, cores: Int): Boolean =
    ops.Caches.memoLevelFor(maxHeapBytes, cores) ==
      org.apache.spark.storage.StorageLevel.DISK_ONLY

  /** Session-default initial shuffle width (AQE coalesces DOWN from
    * here): the SAFE wide value on a constrained heap, 64 otherwise. */
  def defaultInitialPartitions(maxHeapBytes: Long, cores: Int): String =
    if (constrainedHeap(maxHeapBytes, cores)) "256" else "64"

  /** Per-query width: only [[WideFamilies]] members keep 256 on a
    * constrained heap; untagged queries narrow back to 64
    * (`initialPartitionNum` is a runtime SQL conf — set it before
    * each query so each plans under its own width). */
  def initialPartitionsFor(queryName: String, maxHeapBytes: Long, cores: Int): String =
    if (constrainedHeap(maxHeapBytes, cores) && WideFamilies(queryName)) "256"
    else "64"

  /** The full conf set, exposed so harnesses and specs can assert
    * against the same source of truth the builder applies. */
  def productionConfs(
      cores: Int,
      maxHeapBytes: Long = Runtime.getRuntime.maxMemory): Seq[(String, String)] = Seq(
    "spark.sql.shuffle.partitions" -> cores.toString,
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" ->
      defaultInitialPartitions(maxHeapBytes, cores),
    "spark.memory.storageFraction" -> "0.3",
    "spark.cleaner.periodicGC.interval" -> "2min",
    // Allow shuffled-hash join where its size conditions hold
    // (optimization guide §3.1/§9): broadcast still wins when a side
    // fits the threshold, and large-large joins fail
    // canBuildLocalHashMap and stay sort-merge — the flip only fires
    // where one side builds a per-partition hash table, which skips
    // sorting the big side. Measured r16 at sf100 on the bucketed
    // layout (both join children already hash-partitioned by the
    // bucket key, so SMJ's only remaining cost was two 600M-row
    // sorts): q_min_valid_in_any_group 113.3 -> 58.6 s and
    // q_median_collapse 108.3 -> 81.6 s, same window, clean:true,
    // oracle-checked results; q_volcano solo-flat (49.3 vs 48.8).
    "spark.sql.join.preferSortMergeJoin" -> "false")

  /** Executor memory to REQUEST under a `local-cluster[n,c,m]` master.
    *
    * The master string's `m` sizes the WORKER's capacity only;
    * executors still ask for the `spark.executor.memory` default
    * (1 GiB) unless the session requests more — the round-15 sf10
    * topology run OOMed exactly there (8192 MB workers, 1 GiB
    * executor heaps, the span-memo build dead at exit 52). Harnesses
    * that honor `SPARK_GRAFT_MASTER` pass this alongside
    * `spark.executor.extraClassPath`. None for non-local-cluster
    * masters or an unparseable spec (caller keeps Spark's default). */
  def localClusterExecutorMemory(master: String): Option[String] =
    if (!master.startsWith("local-cluster")) None
    else master.replaceAll("[^0-9,]", "").split(',').lift(2)
      .filter(_.nonEmpty).map(_ + "m")

  /** Apply the production profile to a builder. Master, UI, and any
    * deployment-specific confs stay the caller's: cluster users set
    * their own master/resources and then layer this profile on top.
    * `cores` should be the PER-EXECUTOR core count (local mode: the
    * local[N] thread count). */
  def production(
      builder: SparkSession.Builder,
      cores: Int,
      maxHeapBytes: Long = Runtime.getRuntime.maxMemory): SparkSession.Builder =
    productionConfs(cores, maxHeapBytes).foldLeft(builder) {
      case (b, (k, v)) => b.config(k, v)
    }
}
