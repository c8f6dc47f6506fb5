package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe: cost of graft.ops.tbl() plan construction (file listing +
  * parquet schema inference) and of an empty-ish analysis, per call —
  * the fixed per-query overhead candidates in the 189-query bench.
  */
object TblProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String, n: Int)(f: => A): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms/call")
    }
    time("tbl(documents)", 20) { graft.ops.tbl(spark, sfDir, "documents") }
    time("tbl(lineitem)", 20) { graft.ops.tbl(spark, sfDir, "lineitem") }
    time("tbl(events) [ts switch]", 20) { graft.ops.tbl(spark, sfDir, "events") }
    time("tbl(documents)+count-analysis", 20) {
      graft.ops.tbl(spark, sfDir, "documents").groupBy("lang").count()
        .queryExecution.executedPlan
    }
    time("full collect tiny agg", 10) {
      graft.ops.tbl(spark, sfDir, "region").groupBy("r_regionkey").count().collect()
    }
    val docSchema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    time("read with explicit schema", 20) {
      spark.read.schema(docSchema).parquet(s"$sfDir/documents.parquet")
    }
    spark.stop()
  }
}
