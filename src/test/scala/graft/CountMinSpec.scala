package graft

import graft.functions.{CountMin, CountMinSketch}

/** Count–min sketch (graft.functions.CountMin) — the constant-state
  * frequency-estimate path. Three angles: the sketch algebra (one-sided
  * estimates, elementwise merge), the declared query's guarantees on the
  * real fixture (est ≥ exact for every probed key, error under the ε·N
  * ceiling), and the plan shape the aggregate exists to buy (partial
  * ObjectHashAggregate before the exchange).
  */
class CountMinSpec extends SparkSpec {

  test("estimate is one-sided (≥ true count) and exact when collision-free") {
    val agg = new CountMinSketch
    // three distinct keys with counts 3 / 2 / 1
    val xs = Seq(11L, 11L, 11L, -7L, -7L, Long.MaxValue)
    val sk = xs.foldLeft(agg.zero)(agg.reduce)
    assert(CountMin.estimate(sk, 11L) >= 3L)
    assert(CountMin.estimate(sk, -7L) >= 2L)
    assert(CountMin.estimate(sk, Long.MaxValue) >= 1L)
    // 3 keys in 4×1024 cells: no row can collide all three, so exact
    assert(CountMin.estimate(sk, 11L) == 3L)
    // an unseen key reads 0 unless it collides in every row — with 3
    // occupied cells per row the min over 4 rows is 0 here
    assert(CountMin.estimate(sk, 999L) == 0L)
  }

  test("merge is elementwise add: merged sketch = sketch of concatenated input") {
    val agg = new CountMinSketch
    val a = Seq(1L, 2L, 2L, 3L)
    val b = Seq(2L, 3L, 4L)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    val whole = (a ++ b).foldLeft(agg.zero)(agg.reduce)
    assert(merged.sameElements(whole))
    assert(CountMin.estimate(merged, 2L) >= 3L)
  }

  test("idxCol mirrors idx bit-for-bit across the key space") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val keys = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue + 1, 42L,
      -987654321098765L, 31337L)
    val viaSql = keys.toDF("x")
      .select((0 until CountMin.Depth).map(i =>
        CountMin.idxCol(i, col("x")).as(s"i$i")): _*)
      .collect()
    keys.zip(viaSql).foreach { case (x, row) =>
      (0 until CountMin.Depth).foreach { i =>
        assert(row.getInt(i) == CountMin.idx(i, x), s"row $i key $x")
      }
    }
  }

  test("q_cms_freq_est: est ≥ exact on every probe, error under 3·N/Width") {
    import org.apache.spark.sql.functions.{col, explode, length, split}
    val rows = query("q_cms_freq_est").collect()
    assert(rows.length == 20)
    val n = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0).count()
    val ceiling = 3L * n / CountMin.Width
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: one-sided bound violated")
      assert(est - exact <= ceiling,
        s"${r.getString(0)}: err ${est - exact} > ceiling $ceiling (N=$n)")
    }
  }

  test("sketch build plans partial aggregation (map-side combine)") {
    // The declared key persists the built sketch before probing (the
    // IndexFrames build-then-probe shape), so the build agg is no longer
    // in the returned plan — pin the build-side shape directly: partial +
    // final ObjectHashAggregate around the exchange, ONE 32 KB row per
    // partition on the wire.
    import org.apache.spark.sql.functions.{col, conv, explode, length, md5, split}
    val build = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .select(conv(md5(col("token")).substr(1, 15), 16, 10).cast("long").as("x"))
      .agg(graft.functions.CountMinSketch.agg(col("x")).as("sketch"))
    val plan = build.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}
