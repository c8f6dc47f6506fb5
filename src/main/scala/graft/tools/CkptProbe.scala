package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: does an eager localCheckpoint capture the child's
  * HashPartitioning (so a later join/agg on the same key skips its
  * exchange), under AQE, in this Spark build?
  */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 100000).toDF("k").withColumn("v", col("k") % 7)
    val eagerCp = df.repartition(col("v")).localCheckpoint(eager = true)
    println("== eager checkpoint, agg on same key ==")
    eagerCp.groupBy("v").count().explain()
    val lazyCp = df.repartition(col("v")).localCheckpoint(eager = false)
    println("== lazy checkpoint, agg on same key ==")
    lazyCp.groupBy("v").count().explain()
    val pers = df.repartition(col("v")).persist()
    pers.count()
    println("== persist (materialized), agg on same key ==")
    pers.groupBy("v").count().explain()
    println("== persist, join on same key ==")
    pers.join(df.limit(100).withColumnRenamed("k", "k2"), "v").explain()
    spark.stop()
  }
}
