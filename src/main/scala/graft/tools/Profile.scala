package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query profiler: times named declared queries over several warm
  * iterations (first iteration reported separately as cold), so plan cost
  * is separable from session/JIT warm-up. Complements Bench (one cold pass
  * over everything, the driver's contract) when hunting a hot spot.
  *
  * Run: sbt "runMain graft.tools.Profile <sfDir> <iters> <query ...>"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle-partition sizing is per-SF, not per-core: at sf100 (600 M
    // lineitem) 32 partitions put ~19 M rows per sort-merge-join task and
    // the UnsafeExternalSorter exhausts execution memory (measured r16);
    // 256 keeps per-task state bounded while AQE coalesces the excess on
    // small inputs. Default stays the driver-contract 32; override with
    // SPARK_GRAFT_SHUFFLE at sf ≥ 100 (the same dial a real cluster sets
    // from input bytes / target partition size).
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // Input-split sizing is the scan-side twin of the shuffle dial: a
    // single-directory fixture at sf100 can yield fewer 128 MB splits
    // than cores, so explode-heavy scan stages (53 span rows per doc row)
    // run underparallelized with multi-M-row per-task partial-agg state.
    // SPARK_GRAFT_MAXPART (e.g. "32m") = files.maxPartitionBytes.
    val maxPart = sys.env.getOrElse("SPARK_GRAFT_MAXPART", "128m")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.files.maxPartitionBytes", maxPart)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // A/B dial for the ObjectHashAggregate fallback threshold (see
      // Graft.scala — the session default is Spark's 128 safety valve;
      // the kNN fold carries its own scoped raise). SPARK_GRAFT_FALLBACK
      // overrides the SESSION value to measure a key under an alternative
      // threshold without a code edit; note it cannot override the kNN
      // fold's scoped clone.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_FALLBACK", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B dial for the sortOnce tradeoff (see ops/package.scala): with
    // SPARK_GRAFT_NOCHECKPOINT=true the final sort's range sampler
    // re-executes the child plan instead of reading a materialized copy —
    // lets the profiler measure both shapes of a key without a code edit.
    if (sys.env.get("SPARK_GRAFT_NOCHECKPOINT").contains("true"))
      spark.conf.set("graft.sortOnce.nocheckpoint", "true")
    // SPARK_GRAFT_MEM=true: report the max per-task peakExecutionMemory and
    // total spill observed during each query — the number that says whether
    // an ObjectHashAggregate under the raised fallbackThreshold actually
    // approaches the heap, rather than inferring it from "didn't OOM".
    val memStats = if (sys.env.get("SPARK_GRAFT_MEM").contains("true")) {
      val peak = new java.util.concurrent.atomic.AtomicLong(0L)
      val spillMem = new java.util.concurrent.atomic.AtomicLong(0L)
      val spillDisk = new java.util.concurrent.atomic.AtomicLong(0L)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = t.taskMetrics
            if (m != null) {
              peak.getAndAccumulate(m.peakExecutionMemory, math.max)
              spillMem.addAndGet(m.memoryBytesSpilled)
              spillDisk.addAndGet(m.diskBytesSpilled)
            }
          }
        })
      Some((peak, spillMem, spillDisk))
    } else None
    names.foreach { n =>
      val times = (0 until iters).map { _ =>
        // Scope the post-iteration cleanup to blocks THIS iteration
        // creates: snapshot the pre-existing persistent RDD ids first.
        val preexisting = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        org.apache.spark.sql.GraftBridge.runExactPlan(graft.SparkEntry.queries(n)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        // Each iteration builds a FRESH plan, so the previous iteration's
        // lazy localCheckpoint blocks (sortOnce, multi-consumer frames)
        // are pure garbage to the next one — but they are only freed when
        // GC runs the ContextCleaner, so at large SF they sit in the block
        // manager and the "warm" iterations measure eviction pressure, not
        // the query (sf100 q_heavy_hitters: warm 132 s vs cold 49 s).
        // Production runs a plan once per job; drop the blocks eagerly so
        // warm times measure steady state.
        spark.sparkContext.getPersistentRDDs
          .collect { case (id, rdd) if !preexisting.contains(id) => rdd }
          .foreach(_.unpersist(blocking = true))
        // Shuffle files are freed by the ContextCleaner only when the
        // previous iteration's ShuffleDependency objects are GC'd — at
        // low driver heap pressure they survive iterations and tens of
        // GB of dead shuffle data stay on disk, so later "warm" runs
        // measure a fuller disk, not the query (sf100 q_substring_dedup:
        // 96.7 → 118.7 s ACROSS iterations before this). Nudge GC so the
        // cleaner reclaims them between iterations.
        System.gc()
        dt
      }
      val mem = memStats.map { case (peak, sm, sd) =>
        // Deterministic drain (r19 ADVICE): waitUntilEmpty blocks until
        // every queued task-end event has been delivered — under a
        // backlogged bus a fixed sleep silently missed the LAST tasks'
        // peak/spill, understating exactly the number this dial measures.
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        f"  peak_task_mem=${peak.get / 1048576.0}%.0fMB spill_mem=${sm.get / 1048576.0}%.0fMB spill_disk=${sd.get / 1048576.0}%.0fMB"
      }.getOrElse("")
      memStats.foreach { case (peak, sm, sd) => peak.set(0); sm.set(0); sd.set(0) }
      println(f"$n%-24s cold=${times.head}%7.3f warm_min=${times.tail.minOption.getOrElse(Double.NaN)}%7.3f  all=${times.map(t => f"$t%.2f").mkString(",")}$mem")
    }
    spark.stop()
  }
}
