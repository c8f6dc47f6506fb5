package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times the LIBRARY path of the LSH/embedding family — the auto-sized
  * nBits form real callers run — at a given scale factor. The DECLARED
  * keys (q_embed_neardup_all etc.) pin nBits=4 so their statically
  * rendered oracle SQL stays hash-exact; that audit form's bucket
  * occupancy explodes quadratically once the corpus outgrows the pinned
  * bucket count (16 buckets/table at 200 k vectors ≈ 12.5 k-row buckets →
  * ~10⁸ candidate pairs per bucket — the documented knob tradeoff, NOT
  * the production path). This probe measures what production runs:
  * autoNBits holds expected occupancy ~constant, so candidates grow
  * linearly with the corpus.
  *
  * Run: sbt "runMain graft.tools.ScaleProbe <sfDir> [iters]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    // optional comma-separated probe-name filter (args(2)): the sf10
    // probes each spill tens of GB — rerunning ALL of them to measure one
    // new probe can fill the disk
    val only: Set[String] = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.ops.tbl(spark, sfDir, "embeddings")
    val n = emb.count()
    val bits = graft.ops.Similarity.autoNBits(n)
    println(s"corpus=$n vectors, autoNBits=$bits")

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      if (only.nonEmpty && !only(name)) return
      val times = (0 until iters).map { _ =>
        val t0 = System.nanoTime()
        val rows = mk.queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val warm = times.tail.map(_._1)
      println(f"$name%-28s cold=${times.head._1}%7.3f " +
        f"warm_min=${warm.minOption.getOrElse(Double.NaN)}%7.3f " +
        f"rows=${times.head._2}  all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    time("lib_neardup_pairs_auto") {
      graft.ops.Similarity.lshNearDupPairs(emb, knownCount = Some(n))
    }
    time("lib_cluster_labels_auto") {
      graft.ops.Dedup.connectedComponents(
        graft.ops.Similarity.lshNearDupPairs(emb, knownCount = Some(n)))
    }
    time("lib_neardup_multiprobe8") {
      // half the tables + 1-bit probing: recall parity with the 16-table
      // exact-probe form is pinned in SimilaritySpec; this probe measures
      // the COST side of the trade (1x bucket build, (nBits+1)x probe rows)
      graft.ops.Similarity.lshNearDupPairsMultiProbe(emb, nTables = 8,
        knownCount = Some(n))
    }
    time("lib_knn_graph_auto") {
      // the declared q_knn_graph pins nBits=4 for its static oracle SQL —
      // this probes the production path: auto-sized buckets hold
      // occupancy ~constant so the candidate distinct grows ~linearly
      graft.ops.Similarity.knnGraphQuantized(emb, knownCount = Some(n))
    }
    // collision-volume census (r18): decomposes the kNN family's sf100
    // residual — collisions = Σ occ·(occ−1) over (table, bucket) is the
    // exact row count the bucket self-join produces, and max_occ exposes
    // bucket skew that autoNBits' EXPECTED-occupancy target cannot see.
    // If collisions/vector grows across decades, the join input itself is
    // super-linear and only an occupancy cap (not a faster reducer) fixes it.
    if (only.isEmpty || only("lib_collision_census")) {
      val buckets = emb.select(col("vec_id"),
          posexplode(graft.expr.LshSignatures(col("embedding"), bits, 16)))
        .select(col("pos").as("tbl"), col("col").as("bkt"))
      def projected(cap: Int) = {
        // collisions after an occupancy cap: buckets above `cap` split
        // into nsub=ceil(occ/cap) hash sub-buckets → ~occ²/nsub pairs
        val nsub = ceil(col("occ").cast("double") / cap)
        sum((col("occ") * (col("occ") - 1)).cast("double") / nsub)
          .cast("long").as(s"proj_cap$cap")
      }
      val r = buckets.groupBy("tbl", "bkt").agg(count(lit(1)).as("occ"))
        .agg(sum(col("occ") * (col("occ") - 1)).as("collisions"),
          max(col("occ")).as("max_occ"),
          expr("approx_percentile(occ, 0.99)").as("p99_occ"),
          count(lit(1)).as("n_buckets"),
          projected(64), projected(128))
        .collect()(0)
      println(s"lib_collision_census collisions=${r.get(0)} " +
        s"max_occ=${r.get(1)} p99_occ=${r.get(2)} n_buckets=${r.get(3)} " +
        s"per_vector=${r.getLong(0) / math.max(n, 1)} " +
        s"proj_cap64=${r.get(4)} proj_cap128=${r.get(5)}")
    }

    time("lib_semdedup_survivors") {
      val dropped = graft.ops.Dedup.connectedComponents(
          graft.ops.Similarity.lshNearDupPairs(emb, knownCount = Some(n)))
        .filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id").as("vec_id"))
      emb.select(col("vec_id")).join(dropped, Seq("vec_id"), "left_anti")
    }
    spark.stop()
  }
}
