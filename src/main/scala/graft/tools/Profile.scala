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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val times = (0 until iters).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-24s cold=${times.head}%7.3f warm_min=${times.tail.minOption.getOrElse(Double.NaN)}%7.3f  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
