package graft

import org.apache.spark.sql.functions._

/** ScalaTest oracles for the non-SQL-expressible window queries
  * (SURVEY.md §2-B: q_sliding_window, q_session_window, q_approx_distinct).
  */
class TimeWindowSpec extends SparkSpec {

  import spark.implicits._

  test("q_sliding_window matches hand-rolled 2-day/1-day expansion") {
    val got = query("q_sliding_window")
      .select(col("win_start").cast("timestamp").cast("date").cast("string"),
        col("event_type"), col("cnt"))
      .as[(String, String, Long)].collect().toSeq

    // hand-rolled: each event belongs to windows starting at
    // day(ts) and day(ts)-1 (2-day width sliding 1 day)
    val ev = graft.ops.tbl(spark, sfDir, "events")
      .select(date_trunc("day", col("ts")).as("d0"), col("event_type"))
    val want = ev.select(explode(array(col("d0"), date_sub(col("d0"), 1).cast("timestamp"))).as("win_start"), col("event_type"))
      .groupBy("win_start", "event_type").agg(count(lit(1)).as("cnt"))
      .select(col("win_start").cast("date").cast("string"), col("event_type"), col("cnt"))
      .as[(String, String, Long)].collect().toSeq

    assert(got.sorted == want.sorted)
  }

  test("q_session_window matches gaps-and-islands formulation") {
    val got = query("q_session_window")
      .as[(Long, Long, Long, Long)].collect().toSeq

    // gaps-and-islands: session breaks where gap > 30 min within user
    val ev = graft.ops.tbl(spark, sfDir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("s")
    val want = ev
      .withColumn("prev", lag(col("s"), 1).over(w))
      .withColumn("brk", when(col("prev").isNull || col("s") - col("prev") > 1800, 1).otherwise(0))
      .withColumn("sess", sum(col("brk")).over(w))
      .groupBy("user_id", "sess")
      .agg(min(col("s")).as("start_s"), max(col("s")).as("max_s"), count(lit(1)).as("cnt"))
      .select(col("user_id"), col("start_s"), (col("max_s") + 1800).as("end_s"), col("cnt"))
      .as[(Long, Long, Long, Long)].collect().toSeq

    assert(got.sorted == want.sorted)
  }

  test("q_session_gaps session counts agree with q_session_window") {
    val gaps = query("q_session_gaps")
      .select($"user_id", $"session_cnt")
      .as[(Long, Long)].collect().toMap
    val windows = query("q_session_window")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(gaps == windows,
      "the relational gaps-and-islands count must equal session_window's")
  }

  test("q_hll_union: register-table estimator within 5% of exact, " +
      "total = union of days") {
    // The query's output is the integer HLL register state (oracle-
    // checked vs DuckDB); this spec pins the ESTIMATOR — the one float
    // presentation-layer step deliberately kept out of the hash-checked
    // output. At fixture cardinality (n ≪ m = 4096) the sketch sits in
    // the linear-counting regime: est = m·ln(m / (m − set_buckets)).
    val m = 4096.0
    val rows = query("q_hll_union")
      .select(col("day").cast("string"), col("set_buckets"),
        col("reg_max"), col("events"))
      .as[(Option[String], Long, Long, Long)].collect()
    val (totalRow, dayRows) = rows.partition(_._1.isEmpty)
    assert(totalRow.length == 1 && dayRows.nonEmpty)
    def lc(setBuckets: Long): Double = m * math.log(m / (m - setBuckets))
    val exactByDay = graft.ops.tbl(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("string").as("day"))
      .agg(countDistinct(col("user_id")).as("u"))
      .as[(String, Long)].collect().toMap
    dayRows.foreach { case (day, sb, _, _) =>
      val exact = exactByDay(day.get)
      assert(math.abs(lc(sb) - exact) / exact < 0.05,
        s"day $day: LC estimate ${lc(sb)} vs exact $exact")
    }
    val exactTotal = graft.ops.tbl(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(math.abs(lc(totalRow.head._2) - exactTotal) / exactTotal < 0.05,
      s"union LC estimate ${lc(totalRow.head._2)} vs exact $exactTotal")
    // union register state dominates every day's (max-merge property)
    assert(totalRow.head._2 >= dayRows.map(_._2).max)
    assert(totalRow.head._3 >= dayRows.map(_._3).max)
    // events tally exactly
    assert(dayRows.map(_._4).sum == totalRow.head._4)
  }

  test("q_approx_distinct within 5% of exact per event_type") {
    val approx = query("q_approx_distinct")
      .select(col("event_type"), col("approx_users")).as[(String, Long)]
      .collect().toMap
    val exact = graft.ops.tbl(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("q_stats_moments matches driver-side reference math within 1e-9") {
    // r12 semantics: moments of the floor(value·10⁴)-quantized integers,
    // exact power sums + one fixed IEEE tail (the hash-oracle recipe).
    // The reference accumulates the power sums in BigInt (exact), converts
    // once to double (correctly-rounded, same as the engine's decimal→
    // double cast), and applies the identical tail — so the comparison is
    // effectively bit-level; tolerances only absorb expression-tree
    // re-association if the query's tail is ever refactored.
    val got = query("q_stats_moments")
      .as[(String, Double, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val data = graft.ops.tbl(spark, sfDir, "events")
      .select(col("event_type"), col("value"), col("user_id"))
      .as[(String, Double, Long)].collect()
      .groupBy(_._1)
    data.foreach { case (et, rows) =>
      val xs = rows.map(r => BigInt(math.floor(r._2 * 10000.0).toLong))
      val us = rows.map(r => BigInt(r._3))
      val n = xs.length.toDouble
      val s1 = xs.sum.toDouble
      val s2 = xs.map(x => x * x).sum.toDouble
      val s3 = xs.map(x => x * x * x).sum.toDouble
      val s4 = xs.map(x => x * x * x * x).sum.toDouble
      val su = us.sum.toDouble
      val suu = us.map(u => u * u).sum.toDouble
      val sxu = xs.zip(us).map { case (x, u) => x * u }.sum.toDouble
      val m2 = s2 - s1 * s1 / n
      val m3 = s3 - 3.0 * s1 * s2 / n + 2.0 * s1 * s1 * s1 / (n * n)
      val m4 = s4 - 4.0 * s1 * s3 / n + 6.0 * s1 * s1 * s2 / (n * n) -
        3.0 * s1 * s1 * s1 * s1 / (n * n * n)
      val varS = m2 / (n - 1.0) / 1.0e8
      val sd = math.sqrt(m2 / (n - 1.0)) / 10000.0
      val skew = math.sqrt(n) * m3 / (m2 * math.sqrt(m2))
      val kurt = n * m4 / (m2 * m2) - 3.0
      val corrRef = (sxu - s1 * su / n) /
        (math.sqrt(m2) * math.sqrt(suu - su * su / n))
      val (gsd, gvr, gskew, gkurt, gcorr) = got(et)
      assert(math.abs(gsd - sd) < 1e-9, s"$et sd: $gsd vs $sd")
      assert(math.abs(gvr - varS) < 1e-9, s"$et var: $gvr vs $varS")
      assert(math.abs(gskew - skew) < 1e-9, s"$et skew: $gskew vs $skew")
      assert(math.abs(gkurt - kurt) < 1e-9, s"$et kurt: $gkurt vs $kurt")
      assert(math.abs(gcorr - corrRef) < 1e-9, s"$et corr: $gcorr vs $corrRef")
    }
  }

  test("q_zscore_outliers matches driver-side reference classification") {
    val got = query("q_zscore_outliers")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val data = graft.ops.tbl(spark, sfDir, "events")
      .select(col("event_type"), col("value")).as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    data.foreach { case (et, vs) =>
      // exact integer power sums (BigInt — double accumulation of x²
      // would round above 2^53), then the engines' fixed IEEE derivation
      val xq = vs.map(v => math.floor(v * 10000.0).toLong)
      val n = xq.length.toDouble
      val sx = xq.foldLeft(BigInt(0))(_ + _).toDouble
      val sxx = xq.foldLeft(BigInt(0))((a, x) => a + BigInt(x) * BigInt(x)).toDouble
      val mean = sx / n
      val sd = math.sqrt((n * sxx - sx * sx) / (n * (n - 1.0)))
      val zs = xq.map(x => math.abs((x.toDouble - mean) / sd))
      val (cnt, nOut, maxZ) = got(et)
      assert(cnt == xq.length.toLong, s"$et cnt")
      assert(nOut == zs.count(_ > 3.0).toLong, s"$et outliers")
      assert(math.abs(maxZ - zs.max) < 1e-9, s"$et max |z|")
    }
  }

  test("q_robust_outliers matches driver-side median/MAD reference classification") {
    val got = query("q_robust_outliers")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val data = graft.ops.tbl(spark, sfDir, "events")
      .select(col("event_type"), col("value")).as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    data.foreach { case (et, vs) =>
      val xq = vs.map(v => math.floor(v * 10000.0).toLong).sorted
      val n = xq.length
      val med = xq((n + 1) / 2 - 1)
      val ads = xq.map(x => math.abs(x - med)).sorted
      val mad = ads((n + 1) / 2 - 1)
      val mzs = xq.map(x => math.abs(0.6745 * (x - med).toDouble / mad.toDouble))
      val (cnt, gMed, gMad, nOut, maxMz) = got(et)
      assert(cnt == n.toLong && gMed == med && gMad == mad, s"$et med/mad")
      assert(nOut == mzs.count(_ > 3.5).toLong, s"$et outliers")
      assert(math.abs(maxMz - mzs.max) < 1e-12, s"$et max |mz|")
    }
  }

  test("percentileSummary approx within 2% of exact rank, median exact; q_percentiles picks exact discrete ranks") {
    val data = graft.ops.tbl(spark, sfDir, "events")
      .select(col("event_type"), col("value")).as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // the GK-sketch library surface (the 100 TB path, no cross-engine
    // oracle): rank error bounded vs the sorted array
    val got = graft.ops.TimeWindows
      .percentileSummary(graft.ops.tbl(spark, sfDir, "events"))
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    data.foreach { case (et, vs) =>
      val (p50a, p95a, med) = got(et)
      // exact interpolated median reference
      val n = vs.length
      val exactMed = if (n % 2 == 1) vs(n / 2) else (vs(n / 2 - 1) + vs(n / 2)) / 2.0
      assert(math.abs(med - exactMed) < 1e-9, s"$et median")
      // approx values must land within ±2% of the target rank
      def rankOf(x: Double): Double = vs.count(_ <= x).toDouble / n
      assert(math.abs(rankOf(p50a) - 0.5) <= 0.02, s"$et p50 rank ${rankOf(p50a)}")
      assert(math.abs(rankOf(p95a) - 0.95) <= 0.02, s"$et p95 rank ${rankOf(p95a)}")
    }
    // the DECLARED key (hash-oracled since r13): the value at 1-based
    // sorted index ⌈q·n⌉, checked against the same sorted arrays
    val decl = query("q_percentiles")
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    data.foreach { case (et, vs) =>
      val n = vs.length
      val (med, p95, cnt) = decl(et)
      assert(cnt == n.toLong, s"$et cnt")
      assert(med == vs((n + 1) / 2 - 1), s"$et med_exact pick")
      assert(p95 == vs((19 * n + 19) / 20 - 1), s"$et p95_exact pick")
    }
  }

  test("q_tumbling_window counts sum to total events") {
    val total = query("q_tumbling_window").agg(sum("cnt")).as[Long].head()
    val n = graft.ops.tbl(spark, sfDir, "events").count()
    assert(total == n)
  }
}
