package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Storage-level policy for the library's session-lifetime memo and
  * serving caches (span selection + doc-freq histogram, minhash/simhash
  * triples, curate annotation/signature stages, pair-join working
  * sets).
  *
  * Why: those caches are deliberately long-lived (INVARIANTS.md — the
  * budget decision is a separate driver job from the pair plan, and
  * the serving families re-read their layouts), and MEMORY_AND_DISK
  * blocks, while LRU-evictable, still compete with execution memory in
  * the unified pool. At 8 GiB / 32 threads on the sf10 corpus that
  * competition sat on a NONDETERMINISTIC heap-OOM boundary
  * (BENCH_NOTES round-11 "what 8 GiB means at sf10"): 32 concurrent
  * sort/agg tasks over ~2.4 GiB of evictable execution memory with the
  * caches fully materialized. Tuning storageFraction moved the cliff
  * but could not remove it.
  *
  * Policy: when the per-core heap share is below
  * [[MinHeapPerCoreMb]] (384 MB — between the measured-failing
  * 256 MB/core and the measured-safe 512 MB/core), memo caches go
  * DISK_ONLY: the cache still short-circuits recomputation (the point
  * of every memo site), but its bytes live on local disk and the whole
  * unified pool stays available to execution. On provisioned heaps the
  * level stays MEMORY_AND_DISK (hot reads stay in memory, spill is the
  * eviction path). On a real cluster the same rule holds per executor:
  * spark.executor.memory/spark.executor.cores is the share that
  * decides.
  *
  * Overrides (tests, operators who know better):
  * `-Dgraft.cache.memo=disk|memory` forces the level;
  * `-Dgraft.cache.minHeapPerCoreMb=N` moves the threshold.
  */
object Caches {

  /** Heap-per-core floor (MB) below which memo caches avoid the
    * unified pool entirely. */
  val MinHeapPerCoreMb = 384L

  /** Pure decision — unit-testable without a session. */
  def memoLevelFor(maxHeapBytes: Long, cores: Int): StorageLevel = {
    val floorMb = sys.props.get("graft.cache.minHeapPerCoreMb")
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .getOrElse(MinHeapPerCoreMb)
    val perCoreMb = maxHeapBytes / math.max(cores, 1) / (1L << 20)
    if (perCoreMb < floorMb) StorageLevel.DISK_ONLY
    else StorageLevel.MEMORY_AND_DISK
  }

  /** Per-executor (heapBytes, cores) share that decides the level.
    *
    * On a real cluster the caches live in EXECUTOR heaps, so the share
    * must come from `spark.executor.memory` / `spark.executor.cores`
    * when set — driver `Runtime.maxMemory` over cluster-wide
    * `defaultParallelism` would wildly underestimate it and push every
    * memo to DISK_ONLY regardless of provisioning. In local mode (no
    * executor confs) the driver heap IS the executor heap and
    * defaultParallelism the thread count, so the fallback is exact. */
  private[ops] def executorShare(spark: SparkSession): (Long, Int) = {
    val sc = spark.sparkContext
    val conf = sc.getConf
    val heap = conf.getOption("spark.executor.memory")
      .flatMap(s => scala.util.Try(
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)).toOption)
    val cores = conf.getOption("spark.executor.cores")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ > 0)
    // Per-EXECUTOR core estimate when spark.executor.cores is unset:
    // cluster-wide defaultParallelism divided by the live executor
    // count (the status tracker lists the driver too — drop that row
    // when real executors exist). Dividing the per-executor heap by
    // cluster-wide TOTAL cores would shrink the share by the executor
    // count and push memos to DISK_ONLY on exactly the provisioned
    // clusters this share models. In local mode the driver is the one
    // "executor", so the estimate degenerates to defaultParallelism —
    // the thread count, which is exact.
    def estCoresPerExecutor: Int = {
      val execs = math.max(1, sc.statusTracker.getExecutorInfos.length - 1)
      math.max(1, sc.defaultParallelism / execs)
    }
    // spark.executor.memory's cluster default when executors exist but
    // the conf is unset (local mode has no separate executor heap —
    // the driver's Runtime.maxMemory IS it).
    def defaultHeap: Long =
      if (sc.isLocal) Runtime.getRuntime.maxMemory
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes("1g")
    (heap, cores) match {
      case (Some(h), Some(c)) => (h, c)
      case (Some(h), None)    => (h, estCoresPerExecutor)
      case (None, Some(c))    => (defaultHeap, c)
      case _                  => (defaultHeap, estCoresPerExecutor)
    }
  }

  /** The storage level every session-lifetime memo/serving cache in
    * the library uses. */
  def memoLevel(spark: SparkSession): StorageLevel =
    sys.props.get("graft.cache.memo")
      .orElse(sys.env.get("SPARK_GRAFT_CACHE_MEMO")) match {
      case Some("disk")   => StorageLevel.DISK_ONLY
      case Some("memory") => StorageLevel.MEMORY_AND_DISK
      case _ =>
        val (heap, cores) = executorShare(spark)
        memoLevelFor(heap, cores)
    }
}
