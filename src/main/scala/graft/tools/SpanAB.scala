package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the q_boilerplate_spans census shape (r21 verdict
  * item 5): the current single-pass span-TEXT census vs a two-pass
  * hash-census + text-join-back (narrower exchange, one extra generate
  * pass). Prints result parity plus PlanStats-style counters per variant.
  *
  * Run: tools/runmain.sh graft.tools.SpanAB <sfDir> <iters>
  */
object SpanAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val k = 4
    def spansOf() = {
      val toks = split(col("text"), " ")
      val spanArr = when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => array_join(slice(toks, i, lit(k)), " ")))
      graft.ops.tbl(spark, sfDir, "documents")
        .select(col("doc_id"), explode(spanArr).as("span"))
    }

    // Variant A — current declared shape: census groups span TEXT.
    def variantA() = spansOf()
      .groupBy("span")
      .agg(count_distinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc_nulls_last("n_docs"), desc_nulls_last("n_occ"),
        asc_nulls_first("span"))
      .limit(20)

    // Variant B — hash census (8-byte key on the wire), then a second
    // generate pass re-attaches span text for the top candidates only.
    // The 20th (n_docs, n_occ) value is order-independent under ties, so
    // candidates = everything >= that threshold (superset of the answer);
    // the text tiebreak is settled on the tiny candidate set.
    def variantB() = {
      val census = spansOf()
        .select(col("doc_id"), xxhash64(col("span")).as("h"))
        .groupBy("h")
        .agg(count_distinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
        .filter(col("n_docs") >= 2)
        .localCheckpoint(eager = false)
      val thr = census
        .orderBy(desc_nulls_last("n_docs"), desc_nulls_last("n_occ"))
        .limit(20)
        .agg(min(struct(col("n_docs"), col("n_occ"))).as("t"))
      val cand = census.crossJoin(broadcast(thr))
        .filter(struct(col("n_docs"), col("n_occ")) >= col("t"))
        .select("h", "n_docs", "n_occ")
      spansOf()
        .select(col("span"), xxhash64(col("span")).as("h"))
        .join(broadcast(cand), "h")
        .groupBy("span", "n_docs", "n_occ").agg(count(lit(1)).as("occ_chk"))
        .select("span", "n_docs", "n_occ")
        .orderBy(desc_nulls_last("n_docs"), desc_nulls_last("n_occ"),
          asc_nulls_first("span"))
        .limit(20)
    }

    // parity first
    val a = variantA().collect().toSeq
    val b = variantB().collect().toSeq
    println(s"parity: ${if (a == b) "IDENTICAL" else s"DIFFER\nA=$a\nB=$b"}")

    import java.util.concurrent.atomic.AtomicLong
    val shufW = new AtomicLong(0); val shufRecs = new AtomicLong(0)
    val jobs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    def measure(name: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to iters).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val pre = spark.sparkContext.getPersistentRDDs.keySet
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        jobs.set(0); shufW.set(0); shufRecs.set(0)
        val t0 = System.nanoTime()
        org.apache.spark.sql.GraftBridge.runExactPlan(mk())
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs
          .collect { case (id, rdd) if !pre.contains(id) => rdd }
          .foreach(_.unpersist(blocking = true))
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        println(f"  $name iter: ${dt}%.3f s  jobs=${jobs.get} shufMB=${shufW.get/1048576.0}%.2f shufRec=${shufRecs.get}")
        dt
      }
      println(f"$name warm_min=${times.min}%.3f s")
    }
    measure("A(text-census)", () => variantA())
    measure("B(hash-census)", () => variantB())
    measure("A(text-census)", () => variantA())
    measure("B(hash-census)", () => variantB())
    spark.stop()
  }
}
