package graft

import java.nio.file.Files

/** Edge-case coverage for the text/generator family on degenerate documents
  * the fixtures don't contain (0- and 1-token texts) — guards the
  * sequence/slice shingle sites against descending sequence(1, 0) blowups.
  */
class TextEdgeSpec extends SparkSpec {

  private lazy val tinyDir: String = {
    val dir = Files.createTempDirectory("textedge").toString
    import spark.implicits._
    Seq(
      (1L, "solo", "en", "s1", 4L),
      (2L, "", "en", "s1", 0L),
      (3L, "two tokens here now", "en", "s2", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_top_bigrams yields no bigrams for 0/1-token docs and does not throw") {
    val rows = SparkEntry.queries("q_top_bigrams")(spark, tinyDir).collect()
    val bgs = rows.map(_.getString(0)).toSet
    assert(bgs == Set("two tokens", "tokens here", "here now"))
  }

  test("q_doc_fingerprint handles short docs (shingle window > token count)") {
    val rows = SparkEntry.queries("q_doc_fingerprint")(spark, tinyDir).collect()
    assert(rows.length == 3) // every doc fingerprinted, incl. empty text
  }

  test("q_quality_repetition on degenerate docs (no zero division)") {
    // empty text splits to [""] — 1 token, 1 distinct, rep_ratio 0
    val rows = SparkEntry.queries("q_quality_repetition")(spark, tinyDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1L) == ((1L, 1L, 0.0)) && rows(2L) == ((1L, 1L, 0.0)))
    assert(rows(3L)._1 == 4L && rows(3L)._2 == 4L && rows(3L)._3 == 0.0)
  }

  test("q_decontaminate flags a planted benchmark shingle, misses clean docs") {
    // doc 5 (the "benchmark", id < 20) and doc 25 share the shingle
    // "alpha beta gamma"; doc 30 is clean
    val dir = Files.createTempDirectory("decon").toString
    import spark.implicits._
    Seq(
      (5L, "alpha beta gamma delta", "en", "s1", 22L),
      (25L, "prefix alpha beta gamma suffix", "en", "s2", 30L),
      (30L, "totally unrelated text here", "en", "s3", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(25L -> 1L), s"expected only doc 25 flagged once: $got")
  }

  test("q_pii_scrub redacts the synthesized email and digit runs") {
    val rows = SparkEntry.queries("q_pii_scrub")(spark, tinyDir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // "s1@en.example.com user 1" -> email redacted, no 3+ digit run
    assert(rows(1L) == (("[EMAIL] user 1", 1L, 0L)), rows(1L).toString)
  }

  test("q_token_count on degenerate docs") {
    val rows = SparkEntry.queries("q_token_count")(spark, tinyDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 1L && rows(2L) == 1L && rows(3L) == 4L)
  }
}
