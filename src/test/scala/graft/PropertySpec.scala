package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.bus.{Msg, SeparatorTransform}

/** ScalaCheck properties over generated inputs (SURVEY.md §5 item 3):
  * the reference asserts transform send∘receive = identity on fixed
  * fixtures (/root/reference/transform_test.go:14-56); here the same laws
  * hold for arbitrary payloads and separators, plus dedup idempotence and
  * minhash signature invariance. Uses raw ScalaCheck (the scalatest bridge
  * artifact is not in the offline cache).
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val payloadGen: Gen[String] =
    Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)
  private val sepGen: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.asciiPrintableChar).map(_.mkString))

  test("separator transform: send then receive is identity for any payload/sep") {
    check(Prop.forAll(Gen.listOfN(6, payloadGen), sepGen) { (payloads, sep) =>
      val t = SeparatorTransform.utf8(sep)
      val df = payloads.zipWithIndex.map { case (p, i) => Msg.utf8(f"m$i%03d", p) }.toDF()
      val round = t.onReceive(t.onSend(df)).as[Msg].collect()
        .sortBy(_.id).map(_.dataUtf8).toSeq
      round == payloads
    }, n = 15)
  }

  test("separator transform: receive strips exactly one trailing separator") {
    check(Prop.forAll(payloadGen, sepGen) { (p, sep) =>
      if (p.endsWith(sep)) true
      else {
        val t = SeparatorTransform.utf8(sep)
        val df = Seq(Msg.utf8("a", p + sep + sep)).toDF()
        t.onReceive(df).as[Msg].head().dataUtf8 == p + sep
      }
    }, n = 15)
  }

  test("window-dedup is idempotent: dedup(dedup(x)) = dedup(x)") {
    val rowsGen = Gen.listOfN(40, Gen.zip(
      Gen.choose(1L, 5L), Gen.oneOf("a", "b"), Gen.choose(0L, 30L)))
    check(Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.zipWithIndex
          .map { case ((u, t, s), i) =>
            (i.toLong, u, t, new java.sql.Timestamp(s * 1000))
          }
          .toDF("event_id", "user_id", "event_type", "ts")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "event_type")
          .orderBy(asc("ts"), asc("event_id"))
        def dedup(d: org.apache.spark.sql.DataFrame) =
          d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        val once = dedup(df).collect().sortBy(_.getLong(0)).toSeq
        val twice = dedup(dedup(df)).collect().sortBy(_.getLong(0)).toSeq
        once == twice
      }
    }, n = 10)
  }

  test("minhash signatures of identical docs collide on every hash") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.identifier)) { words =>
      val text = words.mkString(" ")
      val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val sigs = df.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id")
        .agg(array((0 until 8).map(h => min(xxhash64(lit(h), col("tok")))): _*).as("sig"))
        .select("sig").as[Seq[Long]].collect()
      sigs(0) == sigs(1)
    }, n = 10)
  }

  test("substring-span dedup flags exactly the cross-doc repeated positions") {
    // random corpora over a 5-token vocabulary (overlaps guaranteed):
    // the hashed-span pipeline must flag exactly the (doc, pos) pairs a
    // driver-side string-tuple reference flags
    val docGen = Gen.listOfN(8, Gen.choose(3, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("t0", "t1", "t2", "t3", "t4"))))
    check(Prop.forAll(docGen) { docs =>
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val spans = graft.ops.Dedup.shingleHashStreamPos(df, 3)
        .as[(Long, Int, Long)].collect().toSeq
      val truth = docs.zipWithIndex.flatMap { case (ts, i) =>
        ts.sliding(3).zipWithIndex.map { case (s, p) => (i.toLong, p, s.mkString(" ")) }
      }
      val dupStr = truth.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= 2).keySet
      val dupHash = spans.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= 2).keySet
      val got = spans.filter(s => dupHash(s._3)).map(s => (s._1, s._2)).toSet
      val want = truth.filter(t => dupStr(t._3)).map(t => (t._1, t._2)).toSet
      Prop(got == want) :| s"flagged positions diverge: got $got want $want"
    }, n = 10)
  }

  test("hashSample nests and is rate-monotone for arbitrary rate pairs") {
    val docs = graft.ops.tbl(spark, sfDir, "documents")
      .select("doc_id", "text").cache()
    docs.count()
    val rateGen = Gen.choose(0, 100).map(_ / 100.0)
    check(Prop.forAll(rateGen, rateGen) { (r1, r2) =>
      val (lo, hi) = if (r1 <= r2) (r1, r2) else (r2, r1)
      val sLo = graft.ops.Scale.hashSample(docs, lo, Seq("text"))
        .select("doc_id").as[Long].collect().toSet
      val sHi = graft.ops.Scale.hashSample(docs, hi, Seq("text"))
        .select("doc_id").as[Long].collect().toSet
      sLo.subsetOf(sHi) && sLo.size <= sHi.size
    }, n = 10)
    docs.unpersist()
  }

  test("saltedSum equals direct groupBy for arbitrary data and salt counts") {
    val rowsGen = Gen.listOfN(80, Gen.zip(Gen.choose(1L, 6L), Gen.choose(-100, 100)))
    val saltsGen = Gen.choose(2, 12)
    check(Prop.forAll(rowsGen, saltsGen) { (rows, nSalts) =>
      rows.isEmpty || {
        val df = rows.zipWithIndex
          .map { case ((k, v), i) => (k, v.toDouble, i.toLong) }
          .toDF("k", "v", "rid")
        val direct = df.groupBy("k").agg(sum("v"), count(lit(1)))
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
        val salted = graft.ops.Scale.saltedSum(df, "k", "v", nSalts, Seq("k", "rid"))
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
        salted == direct
      }
    }, n = 10)
  }

  test("UTF-8 payload round-trips through Msg bytes for any string") {
    check(Prop.forAll { (s: String) =>
      Msg.utf8("id", s).dataUtf8 == new String(
        s.getBytes(StandardCharsets.UTF_8), StandardCharsets.UTF_8)
    }, n = 50)
  }

  test("clipped quantization stats bound inlier error; outliers can't destroy resolution") {
    // 200 inlier vectors uniform in [0,1] + 2 planted outliers at ±50.
    // Exact min/max stats spread [-50,50] over 256 codes → inlier step
    // ~0.39; clipped (p1/p99) stats keep the range ≈[0,1] → step ~0.004.
    // Property: reconstructing each INLIER value from its clipped code has
    // max error ≤ 2·(clipped range)/256 (the 2× covers percentile_approx
    // slack + edge clamping), and is strictly tighter than the exact-stats
    // reconstruction — i.e. clipping bought back the resolution the
    // outliers destroyed.
    val dim = 4
    val rnd = new scala.util.Random(42)
    val inliers = (0L until 200L).map(i =>
      (i, Array.fill(dim)(rnd.nextDouble().toFloat)))
    val outliers = Seq(
      (900L, Array.fill(dim)(50.0f)), (901L, Array.fill(dim)(-50.0f)))
    val emb = (inliers ++ outliers).toDF("vec_id", "embedding")

    def reconErr(stats: org.apache.spark.sql.DataFrame): Double = {
      val rng = stats.collect()
        .map(r => r.getInt(0) -> (r.getFloat(1).toDouble, r.getFloat(2).toDouble)).toMap
      val codes = graft.ops.Similarity.quantizeScalar(emb, stats)
        .as[(Long, Int, Long)].collect()
        .map { case (id, pos, c) => (id, pos) -> c }.toMap
      // in-range inliers only: a value below the clip floor clamps to code
      // 0 by design (error = its distance to the range, not a resolution
      // question) — the resolution property is about values the range covers
      inliers.iterator.flatMap { case (id, v) =>
        v.iterator.zipWithIndex.collect {
          case (x, pos) if x >= rng(pos)._1 && x <= rng(pos)._2 =>
            val (mn, mx) = rng(pos)
            val xhat = mn + (codes((id, pos)) + 0.5) * (mx - mn) / 256.0
            math.abs(x - xhat)
        }
      }.max
    }
    val exactErr = reconErr(graft.ops.Similarity.quantizeStats(emb))
    val clipped = graft.ops.Similarity.quantizeStats(emb, clipLo = 0.01, clipHi = 0.99)
    val clippedErr = reconErr(clipped)
    val maxClippedRange = clipped.collect()
      .map(r => r.getFloat(2).toDouble - r.getFloat(1).toDouble).max
    assert(maxClippedRange < 1.5, s"p1/p99 range must hug the inliers: $maxClippedRange")
    assert(clippedErr <= 2.0 * maxClippedRange / 256.0 + 1e-9,
      s"inlier reconstruction error $clippedErr exceeds the per-code bound")
    assert(clippedErr < exactErr / 10,
      s"clipping must restore resolution: clipped=$clippedErr exact=$exactErr")
  }

  test("sampled quantization stats are deterministic and nested within exact ranges") {
    val emb = graft.ops.tbl(spark, sfDir, "embeddings")
    def rngMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) -> (r.getFloat(1), r.getFloat(2))).toMap
    val exact = rngMap(graft.ops.Similarity.quantizeStats(emb))
    val s1 = rngMap(graft.ops.Similarity.quantizeStats(emb, sampleFraction = 0.5))
    // hash sample is partition-independent: same vectors → same ranges
    val s2 = rngMap(graft.ops.Similarity.quantizeStats(
      emb.repartition(7), sampleFraction = 0.5))
    assert(s1 == s2, "hash-sampled stats must not depend on partitioning")
    s1.foreach { case (pos, (mn, mx)) =>
      val (emn, emx) = exact(pos)
      assert(mn >= emn && mx <= emx, s"sampled range must nest in exact at dim $pos")
    }
  }
}
