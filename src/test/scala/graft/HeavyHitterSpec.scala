package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** q_heavy_hitters (MisraGries sketch-then-verify), q_scd2_history and
  * q_semdedup_prune — the r13 additions' semantic pins beyond the DuckDB
  * hash oracle.
  */
class HeavyHitterSpec extends SparkSpec {

  /** Run the sketch exactly as Spark would: partition the stream, reduce
    * each partition into its own buffer, merge buffers in the given order.
    */
  private def sketchOf(parts: Seq[Seq[String]], k: Int): Map[String, Long] = {
    val agg = new graft.functions.MisraGries(k)
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.reduceLeft(agg.merge))
  }

  test("MisraGries: merged summary keeps every true heavy hitter, " +
      "estimates undercount by at most n/(k+1)") {
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val k = 1 + rnd.nextInt(12)
      // zipf-ish: item i drawn with weight ~ 1/(i+1) → a few genuinely
      // frequent items plus a long tail, the regime MG exists for
      val vocab = (0 until 200).map(i => s"w$i")
      val weights = vocab.indices.map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val n = 500 + rnd.nextInt(2000)
      val stream = Seq.fill(n) {
        val x = rnd.nextDouble() * total
        vocab(cum.indexWhere(x <= _))
      }
      val exact = stream.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      // arbitrary partitioning AND merge order (shuffled parts)
      val nParts = 1 + rnd.nextInt(7)
      val parts = rnd.shuffle(stream.grouped(math.max(1, n / nParts)).toSeq)
      val sk = sketchOf(parts, k)
      assert(sk.size <= k, s"trial $trial: summary exceeded capacity")
      val bound = n.toDouble / (k + 1)
      exact.foreach { case (w, c) =>
        if (c > bound)
          assert(sk.contains(w),
            s"trial $trial: heavy hitter $w (count $c > $bound, k=$k) missing")
      }
      sk.foreach { case (w, est) =>
        val c = exact.getOrElse(w, 0L)
        assert(est <= c, s"trial $trial: $w overcounted ($est > $c)")
        assert(c - est <= bound + 1e-9,
          s"trial $trial: $w undercounted beyond n/(k+1) ($c - $est > $bound)")
      }
    }
  }

  test("q_heavy_hitters equals the brute-force exact computation") {
    val k = 50
    val toks = graft.ops.tbl(spark, sfDir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
    val exact = toks.groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .join(toks.groupBy("lang").agg(count(lit(1)).as("total")), "lang")
      .filter(col("cnt") * (k + 1) > col("total"))
      .select("lang", "token", "cnt", "total")
      .collect().map(_.toSeq).toSet
    val got = query("q_heavy_hitters").collect().map(_.toSeq).toSet
    assert(got.nonEmpty, "fixture produced no heavy hitters — test is vacuous")
    assert(got == exact)
  }

  test("q_scd2_history: dense versions, chained validity, one open row per key") {
    val rows = query("q_scd2_history")
      .select(col("o_custkey"), col("version"),
        // ISO strings: Row.getTimestamp is Java-8-API-sensitive and
        // TIMESTAMP_NTZ won't cast to long; lexicographic order matches
        // time order for a fixed ISO format
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("is_current"))
      .collect()
    val orders = graft.ops.tbl(spark, sfDir, "orders")
      .filter(col("o_orderdate").isNotNull).count()
    assert(rows.length == orders, "one SCD2 row per dated change")
    rows.groupBy(_.getLong(0)).foreach { case (key, hist0) =>
      val hist = hist0.sortBy(_.getInt(1))
      assert(hist.map(_.getInt(1)).toSeq == (1 to hist.length),
        s"key $key: versions not dense")
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(3) == b.getString(2),
            s"key $key: valid_to(v${a.getInt(1)}) != valid_from(v${b.getInt(1)})")
          assert(a.getString(2) <= a.getString(3),
            s"key $key: v${a.getInt(1)} interval runs backwards")
        case _ => ()
      }
      assert(hist.count(_.getBoolean(4)) == 1, s"key $key: open rows != 1")
      assert(hist.last.getBoolean(4) && hist.last.isNullAt(3),
        s"key $key: last version must be the open one")
    }
  }

  test("q_semdedup_prune keeps exactly one representative per cluster") {
    val survivors = query("q_semdedup_prune").collect().map(_.getLong(0)).toSet
    val corpus = graft.ops.tbl(spark, sfDir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(corpus))
    // dropped count = Σ (cluster_size − 1) over the declared cluster key
    val clusters = query("q_embed_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expectedDropped = clusters.map(_._2 - 1).sum
    assert((corpus.size - survivors.size).toLong == expectedDropped)
    // every cluster's min-id member survives; every other member is gone
    clusters.foreach { case (clusterId, _) =>
      assert(survivors.contains(clusterId),
        s"cluster $clusterId: representative (min id) was dropped")
    }
  }
}
