package graft

import org.apache.spark.sql.SparkSession

/** Engine tuning knobs — the Spark-native mirror of the reference's
  * benchmark/engine options surface (reference:
  * benchmarks/src/util/options.rs:34-64 memory-limit / partitions / batch
  * size / prefer_hash_join, and options.rs:90-115 + tpch/run.rs:90-97,118
  * fair-vs-greedy memory pool, sort-spill reservation, statistics toggle).
  * Each reference knob maps to the Spark config that governs the same
  * resource decision:
  *
  *  - memory limit → `spark.memory.fraction` (execution+storage share of
  *    the heap; the heap itself is a deploy-time `--driver-memory` /
  *    `--executor-memory` flag, like the reference's process rlimit)
  *  - fair/greedy pool → `spark.scheduler.mode` FAIR vs FIFO
  *  - sort-spill reservation → the operator buffer spill thresholds
  *    (rows held in memory before an UnsafeExternalSorter spill)
  *  - prefer_hash_join → `spark.sql.join.preferSortMergeJoin` (inverted)
  *  - statistics toggle → `spark.sql.cbo.enabled` (+ join reorder)
  *  - partitions / batch size → shuffle partitions, files.maxPartitionBytes,
  *    parquet columnar reader batch size
  */
case class GraftTuning(
    cpus: Int = GraftSession.defaultCpus,
    /** Shuffle parallelism; defaults to `cpus` locally (a deploy-time
      * setting on a real cluster — AQE coalesces down from it). */
    shufflePartitions: Option[Int] = None,
    /** Fraction of heap for execution+storage (reference: memory limit).
      * STATIC (context-level) conf: only takes effect in the process that
      * creates the SparkContext — `builderWith(...).getOrCreate()` against
      * an already-running context silently ignores it (use
      * [[GraftSession.sessionWith]] to get a loud warning instead). */
    memoryFraction: Double = 0.6,
    /** true = FAIR scheduler pools (reference: FairSpillPool), false =
      * FIFO (reference: GreedyMemoryPool). STATIC conf — same caveat as
      * [[memoryFraction]]: ignored when an existing context is reused. */
    fairScheduling: Boolean = false,
    /** Rows an operator buffer (sort-merge-join / window) may hold before
      * spilling (reference: sort-spill reservation). None = Spark default
      * (spill only under memory pressure). */
    spillRowThreshold: Option[Int] = None,
    /** false = broadcast/shuffled-hash preferred (reference default
      * prefer_hash_join=true); true = sort-merge preferred. */
    preferSortMergeJoin: Boolean = false,
    /** Cost-based optimizer + join reorder from table stats (reference:
      * `--disable-statistics` inverted). */
    cboEnabled: Boolean = true,
    /** Broadcast-join build-side ceiling. 64 MB was re-adjudicated in r10
      * after finding q12 at the SF1 replica spending ~800 ms of a 1.3 s
      * query in the SINGLE-THREADED driver-side HashedRelation build of
      * 1.2 M orders rows: a same-shape A/B at 16 MB flipped those builds
      * to sort-merge joins and was NET WORSE (q-family 8.7 → 9.2 s; the
      * probe-side sort costs more than the serial build at this scale),
      * so 64 MB stands. The genuinely degenerate cases are FACT-DERIVED
      * AGGREGATES whose post-filter estimates sneak under any ceiling —
      * those are fixed at the query level with shuffle_hash hints
      * (q03/q18), not by shrinking the ceiling for true dimensions.
      * SPARK_GRAFT_BROADCAST_MB overrides for future A/Bs. */
    broadcastThresholdBytes: Long = GraftSession.defaultBroadcastBytes,
    /** Max bytes per file-scan partition (reference: batch size analog at
      * the scan; governs scan task granularity at 100 TB). */
    maxPartitionBytes: Long = 128L << 20,
    /** Vectorized parquet reader batch rows (reference: batch_size). */
    columnarBatchSize: Int = 4096,
    /** Opt-in prepared-query reuse ([[graft.plans.PlanCache]]): repeated
      * executions of a semantically identical query skip Catalyst,
      * codegen source generation and (under AQE, for unchanged inputs)
      * already-materialized exchanges. Off by default — the bench
      * contract mode re-plans per iteration like the reference protocol;
      * cached-mode numbers are reported alongside, never instead. */
    planCache: Boolean = false)

/** Session construction for the graft engine.
  *
  * Mirrors the operational surface of the reference's `SessionBuilder`
  * (reference: src/flight_service/session_builder.rs:9-111) — programmatic
  * session building with engine-pinned config — expressed Spark-natively as a
  * thin layer over `SparkSession.builder`.
  *
  * Config choices are scale-oriented, not demo-oriented:
  *  - AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  *    broadcast-join demotion are exactly the knobs that keep a plan healthy
  *    when the same code runs at 100 TB.
  *  - shuffle.partitions matches local cores here; on a real cluster this is
  *    a deploy-time setting (AQE coalesces down from it).
  *  - UTC session timezone so results are reproducible against any oracle.
  */
object GraftSession {

  /** Default parallelism for the local test harness. */
  def defaultCpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  /** Default broadcast ceiling (see GraftTuning.broadcastThresholdBytes);
    * SPARK_GRAFT_BROADCAST_MB overrides for A/B measurement. */
  def defaultBroadcastBytes: Long =
    sys.env.getOrElse("SPARK_GRAFT_BROADCAST_MB", "64").toLong << 20

  /** Shuffle/spill scratch directory. Prefer RAM-backed tmpfs when
    * present and big: this sandbox's kernel throttles page-cache
    * writeback to single-digit MB/s once a few GB are dirty (measured:
    * 2.8 GB/s for the first 2 GB of buffered writes, then 8.9 MB/s —
    * while O_DIRECT sustains 514 MB/s), which turns shuffle-heavy stages
    * CPU-idle and syscall-bound (jstack: every executor thread inside
    * FileChannel write/transferTo). Shuffle files are short-lived scratch
    * — exactly what tmpfs is for; on a production cluster this maps to
    * local NVMe `spark.local.dir`, and tmpfs only when the shuffle
    * working set is known to fit in RAM. Overridable via
    * SPARK_GRAFT_LOCAL_DIR; falls back to the JVM default (/tmp) when no
    * tmpfs is writable. */
  def scratchDir: Option[String] = sys.env.get("SPARK_GRAFT_LOCAL_DIR").orElse {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-scratch")
      d.mkdirs()
      Some(d.getAbsolutePath)
    } else None
  }

  def builder(cpus: Int = defaultCpus): SparkSession.Builder =
    builderWith(GraftTuning(cpus = cpus))

  /** Fully-tunable builder (≡ reference options.rs:34-64,90-115).
    *
    * `master` defaults to in-process `local[cpus]`; [[ClusterCheck]] passes
    * `local-cluster[...]` to get separate executor JVMs (real task
    * serialization + netty shuffle — the reference's process-boundary
    * claim, reference: src/flight_service/service.rs:17-22). */
  def builderWith(t: GraftTuning, master: Option[String] = None): SparkSession.Builder = {
    val b1 = SparkSession
      .builder()
      .appName("graft")
      .master(master.getOrElse(s"local[${t.cpus}]"))
      .config("spark.sql.shuffle.partitions",
        t.shufflePartitions.getOrElse(t.cpus).toString)
      .config("spark.memory.fraction", t.memoryFraction.toString)
      .config("spark.scheduler.mode", if (t.fairScheduling) "FAIR" else "FIFO")
      .config("spark.sql.join.preferSortMergeJoin", t.preferSortMergeJoin.toString)
      .config("spark.sql.cbo.enabled", t.cboEnabled.toString)
      .config("spark.sql.cbo.joinReorder.enabled", t.cboEnabled.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", t.broadcastThresholdBytes.toString)
      .config("spark.sql.files.maxPartitionBytes", t.maxPartitionBytes.toString)
      .config("spark.sql.parquet.columnarReaderBatchSize", t.columnarBatchSize.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // stream-copy instead of mmap'd FileChannel.transferTo for shuffle
      // merges: with 32 task threads the map/unmap cycle is a TLB-shootdown
      // storm on VM kernels (measured here: q18 at 30x data 11 s vs 123 s),
      // and the copy itself is not the bottleneck for 32 MB-scale spills
      .config("spark.file.transferTo", "false")
      .config("graft.plan.cache", t.planCache.toString)
    val b2 = scratchDir.fold(b1)(d => b1.config("spark.local.dir", d))
    // in.memory.threshold moves rows into the UnsafeExternalSorter once
    // exceeded; spill.threshold then forces that sorter to disk — both are
    // needed for the reservation to actually bound memory (≡ the
    // reference's sort_spill_reservation_bytes, options.rs:100-108)
    t.spillRowThreshold.fold(b2) { n =>
      b2.config("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", n.toString)
        .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", n.toString)
        .config("spark.sql.windowExec.buffer.in.memory.threshold", n.toString)
        .config("spark.sql.windowExec.buffer.spill.threshold", n.toString)
        .config("spark.sql.sessionWindow.buffer.in.memory.threshold", n.toString)
        .config("spark.sql.sessionWindow.buffer.spill.threshold", n.toString)
    }
  }

  /** Build (or reuse) a session under the given tuning, warning loudly
    * when static knobs are being ignored. The runtime-SQL subset
    * (shuffle partitions, join prefs, CBO, thresholds) always applies;
    * the static subset — master/cpus, memoryFraction, fairScheduling —
    * only takes effect in the process that CREATES the SparkContext.
    * Spark silently drops static confs on an existing context; this
    * surfaces each dropped knob on stderr so a tuning run can't silently
    * measure the wrong configuration. */
  def sessionWith(t: GraftTuning): SparkSession = {
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = builderWith(t).getOrCreate()
    if (preExisting) {
      val conf = spark.sparkContext.getConf
      Seq(
        "spark.master" -> s"local[${t.cpus}]",
        "spark.memory.fraction" -> t.memoryFraction.toString,
        "spark.scheduler.mode" -> (if (t.fairScheduling) "FAIR" else "FIFO"))
        .foreach { case (k, v) =>
          val got = conf.get(k, "")
          if (got.nonEmpty && got != v) System.err.println(
            s"[graft] static conf $k=$v IGNORED (existing context has $got)" +
              " — stop the session first to apply it")
        }
    }
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  /** Release ORPHANED per-query persistent state (localCheckpoint blocks,
    * cached plans) between independent query executions in a long-lived
    * harness JVM. A query's `localCheckpoint`s live until unpersisted; a
    * harness running the full registry back-to-back (Bench / Verify /
    * ClusterCheck — up to 4 executions per query in BenchFull) otherwise
    * accumulates hundreds of orphaned block sets, fills the storage pool,
    * and forces later checkpoints to evict to disk: measured 5× on the
    * late-alphabet vector family (`v_knn_graph` 1.15 s in isolation vs
    * 6.12 s at suite position 193 before this). Equivalent to the
    * reference protocol's fresh context per benchmarked query
    * (benchmarks/src/util/run.rs:197-260).
    *
    * Mechanism: reachability, not a blanket unpersist. Cross-query caches
    * (the trained-index fits in VectorOps.idxCache) are localCheckpointed
    * — lineage-TRUNCATED — so unpersisting them is unrecoverable
    * ([CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND] on next reuse). Spark's
    * ContextCleaner already tracks every RDD by weak reference and
    * unpersists it when the JVM proves it unreachable; a query's orphaned
    * checkpoint intermediates have no live referents once its DataFrames
    * are dropped, while retained fits stay strongly referenced by their
    * cache. So an explicit GC at the query boundary frees exactly the
    * orphans and can never touch live state. clearCache() additionally
    * drops plan-cache entries, whose lineage is intact (recompute-safe).
    *
    * The GC is THRESHOLDED on storage-pool PRESSURE, not unconditional
    * and not on entry count: an unconditional full GC between all ~200
    * queries measurably taxed the light ones (~60-400 ms each —
    * soft-reference/code-cache aging), and the round-8 count threshold
    * (`getPersistentRDDs.size > 64`) overshot the same way in reverse —
    * the count stays high throughout the heavy checkpoint stretch, so the
    * GC kept firing between precisely the light ANN queries sitting
    * inside it (measured 1.2-1.4x on v_ivf/lsh/pq/radius in the round-8
    * driver bench) even though the storage POOL had room. The actual
    * eviction hazard is pool occupancy: blocks only start spilling/
    * evicting when the pool fills. So fire only when the storage pool is
    * more than half full — light stretches stay GC-free regardless of how
    * many (small) orphaned entries are listed, while a genuinely filling
    * pool still gets released within a query boundary of the hazard.
    * (Round-9 ruled OUT sub-threshold accumulation as a hazard class:
    * a 2× regression cluster on the 10×-replica documents-scan queries
    * initially looked like resident-block buildup under a never-firing
    * trigger, but the SPARK_GRAFT_DEBUG_RELEASE boundary probe measured
    * ≤ 62 MiB resident at every boundary of a heavy-prefix run — the
    * real cause was the range-sort sampling double-execution fixed in
    * TextOps. Do not re-add a bytes/count trigger without a boundary
    * probe showing actual accumulation.)
    *
    * Caveat (advice r8): `System.gc()` is a NO-OP under
    * `-XX:+DisableExplicitGC` — the leak would silently return with the
    * threshold firing useless calls. Detected below via the GC MXBean
    * collection-count delta around the call: a no-op'd request runs ZERO
    * collections, which is unambiguous, whereas the r9 occupancy
    * heuristic (pool not dropping across releases) also fired when a
    * working GC was simply followed by a heavy query refilling the pool
    * (advice r9, false-positive naming the wrong cause). */
  def releaseQueryState(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    val status = spark.sparkContext.getExecutorMemoryStatus.values
    val maxMem = status.map(_._1).sum
    val usedBytes = math.max(0L, maxMem - status.map(_._2).sum)
    val usedFrac = if (maxMem <= 0L) 0.0 else usedBytes.toDouble / maxMem
    // The in-memory pressure trigger has two blind spots (advice r9):
    // orphaned blocks EVICTED TO DISK (localCheckpoint defaults to
    // MEMORY_AND_DISK) lower the measured fraction without any release,
    // and the cluster-wide sum can mask one full executor. A high
    // entry-count backstop catches both: the live cross-query state
    // (trained-fit caches) is ~a dozen entries, so >512 persistent RDDs
    // means orphans are accumulating somewhere the occupancy sum can't
    // see. Kept deliberately far above r8's count threshold of 64, whose
    // firing BETWEEN light queries was itself a measured 1.2-1.4x tax.
    val entries = spark.sparkContext.getPersistentRDDs.size
    if (sys.env.contains("SPARK_GRAFT_DEBUG_RELEASE"))
      System.err.println(f"[graft] releaseQueryState: ${usedBytes >> 20} MiB" +
        f" resident (${usedFrac * 100}%.1f%% of pool), $entries entries")
    if (usedFrac > 0.5 || entries > 512) {
      val gcBeans = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      }
      val before = gcBeans.map(_.getCollectionCount).sum
      System.gc() // ContextCleaner unpersists whatever this proves orphaned
      if (gcBeans.map(_.getCollectionCount).sum == before && !gcWarned) {
        gcWarned = true
        System.err.println(
          "[graft] releaseQueryState: System.gc() ran zero collections — " +
            "the JVM is ignoring explicit GC (-XX:+DisableExplicitGC?); " +
            "orphaned localCheckpoint blocks will accumulate")
      }
    }
  }

  @volatile private var gcWarned: Boolean = false

  /** Build (or reuse) the engine session, with graft-native functions
    * registered (≡ the reference's per-request SessionBuilder hook,
    * reference: src/flight_service/do_get.rs:100-113). */
  def get(cpus: Int = defaultCpus): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
