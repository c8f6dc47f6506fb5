package graft

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}

/** One-call entry point for users of this engine: a SparkSession with the
  * engine's required/recommended configuration applied and the native SQL
  * functions registered — the "switch your app to this library" surface.
  *
  * Required for correctness on the fixture data:
  *   - UTC session timezone (cross-engine timestamp determinism);
  *   - nanosAsLong for parquet timestamp[ns] columns (see graft.ops.tbl).
  * Recommended at any scale:
  *   - shuffle partitions sized to the cluster (NOT the 200 default —
  *     pass ~2-3× total executor cores; AQE coalesces downward at runtime).
  *
  * The ObjectHashAggregate sort-based fallback threshold stays at Spark's
  * 128 default session-wide — that low default is the memory safety valve
  * for every unbounded object aggregate (collect_list/collect_set and any
  * user-added typed agg), and r19 MEASURED why it must stay: a raised
  * 2^21 threshold OOMed a 15 M-group small-k aggregate (q_topk_agg,
  * ~0.5 KB boxed buffer per group × 32 concurrent tasks) at sf100 inside
  * the standard 8 GB heap — the per-group buffer bound alone does not cap
  * memory; group count per task does, and that is data-dependent. The
  * engine's bounded typed aggregates that genuinely need the hash path at
  * high group counts (the BottomKPairs kNN fold — a sort-based demotion
  * re-introduces exactly the per-partition n log n the aggregate exists
  * to avoid) get the raise PER QUERY via [[boundedAggFrame]]: the frame
  * is re-homed onto a cloned session whose only delta is the threshold,
  * so the override travels with that frame's executions and never governs
  * sibling queries (r18 ADVICE closed by scoping, not documentation).
  */
object Graft {

  def session(
      master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft",
      ui: Boolean = false): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Let AQE re-optimize CACHED plans while keeping their output
      // partitioning visible (r21): the iterative operators (connected
      // components, PageRank) persist their edge frames pre-partitioned on
      // the per-round join key so rounds stop re-shuffling the edge set;
      // without this flag the cached subplan skips AQE partition
      // coalescing and pins shuffle-partition-count tasks onto every
      // downstream stage at small scale. Physical-only: results identical.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", ui)
      .getOrCreate()
    graft.expr.GraftExtensions.register(spark)
    spark
  }

  /** Sizing of the scoped threshold: 2^18 groups/task × ~164 B per
    * BottomKPairs buffer (4 + 16·k bytes at the kNN k=10 ceiling) ≈ 43 MB
    * per task, ~1.4 GB across 32 concurrent local tasks — bounded against
    * the 8 GB ledger heap. Measured (PROFILE_r19): at sf10 the 2^18 value
    * is FASTER than the old global 2^21 (46.4 s vs 51.7 s warm q_knn_graph
    * — smaller hash maps, same no-fallback behavior) and 28% faster than
    * the 128 default's sort demotion; kNN per-task group counts stay well
    * under 2^18 at sf100 because the occupancy cap bounds collisions per
    * bucket and shuffle partitions scale with input.
    */
  val BoundedAggFallbackThreshold = 262144

  /** Re-home `df` onto a session clone whose ObjectHashAggregate fallback
    * threshold is raised to [[BoundedAggFallbackThreshold]] — the scoped
    * form of the conf for SMALL-BOUNDED-buffer typed aggregates over
    * high-cardinality groups (the kNN BottomKPairs fold).
    *
    * One clone is cached PER PARENT SESSION, for the life of the
    * SparkContext. (r22: was a WeakHashMap claiming entries die with
    * their parent — false, r21 ADVICE: the clone strongly references its
    * parent via shared session state, and each `cloneSession()` registers
    * session-state listeners on the shared context bus that are never
    * torn down — which is also why cloning per call would slowly
    * accumulate sessions/listeners in a long-lived process that rebuilds
    * plans repeatedly, r19 ADVICE. The map now states the real lifetime:
    * bounded at exactly one immortal clone per parent session.)
    * Conf drift is not a concern: the clone's only delta is the one
    * threshold constant, and runtime conf changes a caller makes on the
    * PARENT after the clone exists are deliberate non-propagation (the
    * same isolation the scoping exists for).
    */
  def boundedAggFrame(df: DataFrame): DataFrame =
    GraftBridge.rehome(boundedAggSession(df.sparkSession), df)

  private val boundedAggClones =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  private def boundedAggSession(parent: SparkSession): SparkSession =
    boundedAggClones.computeIfAbsent(parent, p =>
      GraftBridge.sessionWithConf(p,
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        BoundedAggFallbackThreshold.toString))

  /** Register the fixture tables of `dir` as temp views so plain
    * `spark.sql` works over them (events gets the ns→µs timestamp
    * normalization from graft.ops.tbl).
    */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(n => graft.ops.tbl(spark, dir, n).createOrReplaceTempView(n))

  /** Apply the engine configuration to an EXISTING session (a shared
    * cluster session the caller does not own): runtime-settable confs +
    * function registration. The parquet-nanos flag is read at scan
    * planning, so it applies to subsequent reads.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    graft.expr.GraftExtensions.register(spark)
    spark
  }
}
