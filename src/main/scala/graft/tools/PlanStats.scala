package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Deterministic per-query execution statistics: jobs, stages, tasks,
  * shuffle bytes/records written, input records — counted by listener over
  * one measured run (after one warm-up run). Wall time is reported too but
  * the COUNTS are the point: on a noisy box the structural numbers are
  * stable while seconds are not, and a removed exchange/job shows up here
  * regardless of contention.
  *
  * Run: tools/runmain.sh graft.tools.PlanStats <sfDir> <query ...>
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong(0); val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0); val shufW = new AtomicLong(0)
    val shufRecs = new AtomicLong(0); val inRecs = new AtomicLong(0)
    val spill = new AtomicLong(0) // disk bytes spilled (guide §5 signal)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          inRecs.addAndGet(m.inputMetrics.recordsRead)
          spill.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    def runOnce(n: String): Double = {
      val preexisting = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      org.apache.spark.sql.GraftBridge.runExactPlan(
        graft.SparkEntry.queries(n)(spark, sfDir))
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .collect { case (id, rdd) if !preexisting.contains(id) => rdd }
        .foreach(_.unpersist(blocking = true))
      // ALSO drop Dataset-cache entries: an operator's persist() leaves a
      // CacheManager entry that the NEXT run's identical subtree would hit
      // (and recompute through the warm run's surviving shuffle files),
      // silently zeroing the measured run's shuffle writes.
      spark.sharedState.cacheManager.clearCache()
      dt
    }
    println(f"${"query"}%-26s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s ${"shufMB"}%8s ${"shufRec"}%9s ${"inRec"}%9s ${"spillMB"}%8s ${"warm_s"}%7s")
    names.foreach { n =>
      runOnce(n) // warm-up: JIT + codegen for this shape
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      jobs.set(0); stages.set(0); tasks.set(0)
      shufW.set(0); shufRecs.set(0); inRecs.set(0); spill.set(0)
      val dt = runOnce(n)
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      println(f"$n%-26s ${jobs.get}%5d ${stages.get}%5d ${tasks.get}%6d ${shufW.get / 1048576.0}%8.2f ${shufRecs.get}%9d ${inRecs.get}%9d ${spill.get / 1048576.0}%8.2f $dt%7.3f")
    }
    spark.stop()
  }
}
