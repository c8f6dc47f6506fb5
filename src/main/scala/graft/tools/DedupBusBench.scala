package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingestion-dedup index benchmark: drives SeenHashIndex.dedupEpoch over N
  * synthetic epochs (M messages each, 25% replayed from the previous
  * epoch) with tiered self-compaction, and prints one JSON line:
  * sustained msg/s through the dedup stage, final run-directory count,
  * and the MEASURED compaction write amplification (cumulative compaction
  * bytes / final index bytes) — the number that separates the r13 tiered
  * scheme (amplification O(log epochs), flat as the run lengthens) from a
  * single-level merge (O(epochs/k), grows without bound).
  *
  * Run: sbt "runMain graft.tools.DedupBusBench [epochs] [rowsPerEpoch] [compactEvery]"
  */
object DedupBusBench {
  def main(args: Array[String]): Unit = {
    val epochs = args.headOption.map(_.toInt).getOrElse(30)
    val rows = args.lift(1).map(_.toLong).getOrElse(200000L)
    val k = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("dedupbench").toString
    val idx = new graft.bus.SeenHashIndex(spark, dir, compactEvery = k)
    val t0 = System.nanoTime()
    var survived = 0L
    var windowT0 = t0
    (0 until epochs).foreach { e =>
      // 75% fresh ids + 25% replay of the previous epoch's head — every
      // epoch exercises both the first-copy and the already-seen path
      val fresh = spark.range(e * rows, e * rows + rows * 3 / 4)
      val prev = math.max(0, e - 1) * rows
      val dup = spark.range(prev, prev + rows / 4)
      val batch = fresh.union(dup)
        .select(format_string("id-%012d", col("id")).as("id"),
          format_string("payload-%012d", col("id")).as("data"))
      survived += idx.dedupEpoch(batch, e).queryExecution.toRdd.count()
      // windowed throughput every 30 epochs: the decay-vs-flat CURVE is
      // the measurement (r19's weak finding was per-epoch cost ∝ index
      // size — visible only in the trend, not the final average)
      if ((e + 1) % 30 == 0) {
        // nudge GC so the ContextCleaner reclaims dead shuffle files
        // between windows (the Profile.scala lesson: ShuffleDependency
        // objects survive until a driver GC, so tens of GB of dead
        // shuffle data otherwise accumulate and later windows measure a
        // fuller disk, not the stage)
        System.gc()
        val now = System.nanoTime()
        val wRate = (30 * rows / ((now - windowT0) / 1e9)).round
        val cRate = ((e + 1) * rows / ((now - t0) / 1e9)).round
        System.err.println(s"[dedupbus] epoch=${e + 1} window_msgs_per_sec=" +
          s"$wRate cumulative_msgs_per_sec=$cRate run_dirs=${idx.epochs().size}")
        windowT0 = now
      }
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    val indexBytes = {
      val root = java.nio.file.Paths.get(dir)
      val st = java.nio.file.Files.walk(root)
      try {
        var total = 0L
        val it = st.iterator()
        while (it.hasNext) {
          val f = it.next()
          if (java.nio.file.Files.isRegularFile(f))
            total += java.nio.file.Files.size(f)
        }
        total
      } finally st.close()
    }
    val msgs = epochs.toLong * rows
    println(s"""{"metric":"dedup_bus","msgs_per_sec":${(msgs / elapsed).round},""" +
      s""""epochs":$epochs,"rows_per_epoch":$rows,"compact_every":$k,""" +
      s""""survived":$survived,"run_dirs":${idx.epochs().size},""" +
      s""""index_bytes":$indexBytes,"compact_bytes":${idx.compactBytesWritten},""" +
      s""""write_amplification":${f"${idx.compactBytesWritten.toDouble / indexBytes}%.2f"},""" +
      s""""seconds":${f"$elapsed%.1f"}}""")
    spark.stop()
  }
}
