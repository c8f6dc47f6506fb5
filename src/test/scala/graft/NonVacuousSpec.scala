package graft

import java.nio.file.Files

/** Anti-vacuity guards for the three oracle keys whose natural fixture
  * answer can be (and at some scales was) EMPTY: q_anti_join, q_except,
  * q_edit_distance. A hash-match on 0 rows proves only that both engines
  * agree the result is empty — a sign-flipped predicate would also pass.
  * Each key gets (a) a PLANTED synthetic table where the exact non-empty
  * answer is known by construction, and (b) a fixture canary asserting the
  * driver's verify-scale fixtures yield rows > 0, so the oracle hash-match
  * is never vacuous again (and fixture drift that re-empties a key fails
  * HERE, loudly, instead of silently weakening the correctness gate).
  */
class NonVacuousSpec extends SparkSpec {

  import spark.implicits._

  /** Both scales the correctness driver touches, when present. */
  private val verifyDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(p => new java.io.File(p).isDirectory)

  test("q_anti_join: planted order-less / low-value-only customers surface") {
    val dir = Files.createTempDirectory("antij").toString
    Seq(
      (1L, "cust_no_orders", "SEG", 0L, "addr"),
      (2L, "cust_low_only", "SEG", 0L, "addr"),
      (3L, "cust_has_big", "SEG", 0L, "addr"))
      .toDF("c_custkey", "c_name", "c_mktsegment", "c_nationkey", "c_address")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(
      (10L, 2L, "O", 1000.0),      // low-value: does NOT shield cust 2
      (11L, 3L, "O", 450000.5),    // above the 450000 threshold
      (12L, 3L, "F", 20.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val got = SparkEntry.queries("q_anti_join")(spark, dir)
      .select("c_custkey").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L),
      s"anti-join must keep the order-less AND the low-value-only customer: $got")
  }

  test("q_except: planted never-active customers survive the subtraction") {
    val dir = Files.createTempDirectory("exceptp").toString
    Seq(
      (1L, "active", "SEG", 0L, "addr"),
      (2L, "silent_a", "SEG", 0L, "addr"),
      (3L, "silent_b", "SEG", 0L, "addr"))
      .toDF("c_custkey", "c_name", "c_mktsegment", "c_nationkey", "c_address")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (100L, t0, 1L, "click", 1.0), // cust 1 is active (twice: EXCEPT dedups)
      (101L, t0, 1L, "view", 2.0),
      (102L, t0, 999L, "click", 3.0)) // non-customer id must NOT leak into output
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q_except")(spark, dir)
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 3L),
      s"EXCEPT must keep exactly the event-less customers, deduped+sorted: $got")
  }

  test("q_edit_distance: a planted within-threshold pair is found with its exact distance") {
    val dir = Files.createTempDirectory("editd").toString
    val t = ("the quick brown fox " * 10).trim      // 199 chars
    val tNear = t.replace("quick", "quack")         // 10 substitutions → dist 10
    val rows = Seq(
      (5L, t, "en", "s", t.length.toLong),
      (6L, tNear, "en", "s", tNear.length.toLong),
      // same length bucket, far in content (>60 edits)
      (7L, ("z y x w v u t s r q " * 10).trim, "en", "s", 199L),
      // outside the declared doc_id < 40 cap: must be ignored even as a copy
      (45L, t, "en", "s", t.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q_edit_distance")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 6L, 10L)),
      s"exactly the planted pair at its true distance (cap excludes doc 45): $got")
  }

  test("q_media_phash_neardup: the planted image cluster yields its distance-0 trio") {
    import org.apache.spark.sql.functions.col
    // ids 7/132/382 are bit-identical planted PNGs (MediaOps
    // mediaFromDocuments); 257 is a downscale of the same picture. The
    // d=0 trio is GUARANTEED; the resized member's pairs additionally
    // appear iff its dHash drift stays ≤ 3 bits (spec-pinned property,
    // not re-asserted here).
    val pairs = SparkEntry.queries("q_media_phash_neardup")(spark, sfDir)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    for (p <- Seq((7L, 132L), (7L, 382L), (132L, 382L)))
      assert(pairs.contains((p._1, p._2, 0L)),
        s"planted identical pair $p missing (got $pairs)")
  }

  test("q_boilerplate_scrub: fixture scrub is non-vacuous AND non-total at verify scales") {
    // rows>0 is trivially true for this key (one row per doc), so the
    // vacuity axis is the SCRUB itself: assert some doc loses tokens
    // (shared 4-gram spans exist at fixture vocab density) and some doc
    // KEEPS tokens (the scrub is a partial rewrite, not a text wipe) —
    // an identity rewrite and an everything-matches rewrite both hash-match
    // a matching oracle, and both would make the key meaningless.
    assert(verifyDirs.nonEmpty)
    for (d <- verifyDirs) {
      val out = SparkEntry.queries("q_boilerplate_scrub")(spark, d)
        .select("n_removed", "n_tokens").as[(Long, Long)].collect()
      assert(out.exists(_._1 > 0), s"scrub removed nothing anywhere at $d")
      assert(out.exists { case (rm, n) => rm == 0 || rm < n },
        s"scrub wiped every document at $d")
    }
  }

  test("fixture canary: all three keys return rows > 0 at every driver verify scale") {
    assert(verifyDirs.nonEmpty)
    for (d <- verifyDirs; key <- Seq("q_anti_join", "q_except", "q_edit_distance",
        "q_media_phash_neardup")) {
      val n = SparkEntry.queries(key)(spark, d).count()
      assert(n > 0,
        s"$key is VACUOUS at $d (0 rows) — reshape the predicate or the " +
          "fixture drifted; an empty-vs-empty oracle hash-match proves nothing")
    }
  }
}
