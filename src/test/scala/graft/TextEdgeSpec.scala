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

  test("q_token_count on degenerate docs") {
    val rows = SparkEntry.queries("q_token_count")(spark, tinyDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 1L && rows(2L) == 1L && rows(3L) == 4L)
  }
}
