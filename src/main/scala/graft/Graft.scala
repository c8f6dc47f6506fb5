package graft

import org.apache.spark.sql.SparkSession

/** One-call entry point for users of this engine: a SparkSession with the
  * engine's required/recommended configuration applied and the native SQL
  * functions registered — the "switch your app to this library" surface.
  *
  * Required for correctness on the fixture data:
  *   - UTC session timezone (cross-engine timestamp determinism);
  *   - nanosAsLong for parquet timestamp[ns] columns (see graft.ops.tbl).
  * Recommended at any scale:
  *   - shuffle partitions sized to the cluster (NOT the 200 default —
  *     pass ~2-3× total executor cores; AQE coalesces downward at runtime);
  *   - objectHashAggregate fallback threshold raised from the 128 default:
  *     the engine's bounded typed aggregates (BottomKPairs kNN reducer,
  *     TopKByValue, CountMinSketch) carry O(k) state per group, so the
  *     default would demote them to SORT-based aggregation after 128
  *     groups — re-introducing exactly the per-partition n log n the
  *     aggregates exist to avoid. 2^21 groups × O(k) state ≈ tens of MB
  *     per task, far under executor memory at the partition sizes the
  *     engine targets.
  *
  *     CONSTRAINT the raised threshold imposes (r18 ADVICE): it is a
  *     session-wide dial, so it also governs every collect_list /
  *     collect_set / unbounded-buffer ObjectHashAggregate — those may now
  *     hold up to 2^21 group buffers per task before the sort-based
  *     spill safety valve fires. The engine's own unbounded object aggs
  *     are all either low-cardinality-grouped (per-source, per-band
  *     censuses) or bounded upstream (the q_cms_freq_est reassembly
  *     groups 4096 fixed cells); library users adding NEW unbounded
  *     object aggregates grouped by a high-cardinality key should size
  *     per-task group count × buffer size against executor memory, or
  *     lower the threshold for that job. The sizing argument above is
  *     for bounded small-k buffers only (BottomKPairs caps k at 4096 ≈
  *     64 KB/group). Measured headroom: PROFILE_r19 pins a multi-M-group
  *     ObjectHashAggregate key at sf100 inside the standard 8 GB heap
  *     under this threshold.
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
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2097152")
      .config("spark.ui.enabled", ui)
      .getOrCreate()
    graft.expr.GraftExtensions.register(spark)
    spark
  }

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
    graft.expr.GraftExtensions.register(spark)
    spark
  }
}
