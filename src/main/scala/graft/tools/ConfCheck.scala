package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot diagnostic: proves the kNN fold's scoped fallback-threshold
  * clone engages — prints the frame's own session conf and the executed
  * ObjectHashAggregateExec's "number of sort fallback tasks" metric,
  * under a parent session pinned to the 128 default.
  */
object ConfCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
      .config("spark.sql.adaptive.enabled", "false") // keep agg nodes visible to collect
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    // force the fold branch (dedupFirst = false) so BottomKPairs plans
    val df = graft.ops.Similarity.knnGraphQuantized(
      graft.ops.tbl(spark, sfDir, "embeddings"), k = 3, nBits = 4,
      dedupFirst = Some(false))
    println(s"parent session conf: ${spark.conf.get(key)}")
    println(s"frame session conf:  ${df.sparkSession.conf.get(key)}")
    val rows = org.apache.spark.sql.GraftBridge.runExactPlan(df)
    val qe = df.queryExecution
    val aggs = qe.executedPlan.collect {
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
    }
    aggs.foreach { o =>
      val fb = o.metrics.get("numTasksFallBacked").map(_.value)
      println(s"ObjectHashAggregateExec fallbackTasks=${fb.getOrElse(-1L)} " +
        s"(groups=${o.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)})")
    }
    println(s"rows=$rows objectAggs=${aggs.size}")
    spark.stop()
  }
}
