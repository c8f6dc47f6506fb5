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

  test("q_chunk_windows: overlap invariant, short docs whole, edge cases safe") {
    // degenerate docs: one chunk each, chunk_text = whole doc
    val tiny = SparkEntry.queries("q_chunk_windows")(spark, tinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
    assert(tiny.toSeq == Seq((1L, 0L, "solo"), (2L, 0L, ""),
      (3L, 0L, "two tokens here now")))

    // real corpus: consecutive chunks overlap by w−stride tokens, the
    // reassembled stride-prefixes + last chunk reconstruct the covered doc
    val byDoc = query("q_chunk_windows").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { cs =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0L, "first chunk starts at token 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 == a._3 + 16, "starts advance by the stride")
          // overlap: b's first (w−stride)=16 tokens equal a's last 16
          val aToks = a._5.split(" ")
          val bToks = b._5.split(" ")
          assert(bToks.take(aToks.length - 16).toSeq == aToks.drop(16).toSeq,
            "consecutive chunks must share the overlap region")
        case _ => ()
      }
      sorted.foreach(c => assert(c._4 == c._5.split(" ", -1).length,
        "n_chunk_tokens matches the emitted chunk text"))
    }
  }

  test("q_token_count on degenerate docs") {
    val rows = SparkEntry.queries("q_token_count")(spark, tinyDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 1L && rows(2L) == 1L && rows(3L) == 4L)
  }

  private def strip(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(graft.ops.TextOps.stripMarkup(org.apache.spark.sql.functions.col("t")))
      .as[String].head()
  }

  test("stripMarkup: quoted '>' inside attributes does not end the tag") {
    assert(strip("""pre <a href="x>y" title='a>b'>link</a> post""") ==
      "pre link post")
    // and the same inside a script tag's attribute: the block still goes
    // whole, payload included
    assert(strip("""a <script src="t.js>x">track()</script> b""") == "a b")
  }

  test("stripMarkup: adjacent and multiple script/style blocks each go whole") {
    assert(strip("x <script>a()</script><script>b()</script> y") == "x y")
    assert(strip("x <script>a()</script><style>p { color: red }</style> y") == "x y")
  }

  test("stripMarkup: comments (with bare '>'), entities, newlines in tags") {
    assert(strip("a <!-- nav > breadcrumb --> b") == "a b")
    assert(strip("T &amp; &#65; &#x41; U") == "T U")
    // newline INSIDE a tag: char classes match it without dotall (this
    // case is Scala-pinned because a \n literal renders differently in
    // Spark lit() vs a DuckDB '' string — see HtmlPrefixes scaladoc)
    assert(strip("a <p\nclass=\"wide\">b</p> c") == "a b c")
  }

  test("stripMarkup: a block terminates only at its OWN close tag") {
    // mismatched pair: no </script> anywhere, so there is no script BLOCK —
    // the tags strip singly and the payload SURVIVES (a combined
    // <(script|style)>…</(script|style)> alternation used to swallow it)
    assert(strip("a <script>keep me</style> b") == "a keep me b")
    assert(strip("a <style>.x { } </script> b") == "a .x { } b")
    // a stray </style> INSIDE a properly closed script block does not
    // terminate it early: the block still goes whole
    assert(strip("a <script>x</style>y</script> b") == "a b")
    assert(strip("a <style>p{}</script>q</style> b") == "a b")
  }

  test("stripMarkup: self-closing, DOCTYPE, unclosed-tag survival") {
    assert(strip("a <br/><img src='pix>els.png'/> b") == "a b")
    assert(strip("<!DOCTYPE html>a") == "a")
    // an unclosed tag is not markup by the grammar: it survives as text
    assert(strip("a </p>trail<p") == "a trail<p")
  }

  test("containmentPairs flags a quote-inside-article pair symmetric Jaccard misses") {
    import spark.implicits._
    // doc 1 = the "quote" (8 tokens, 6 shingles), doc 2 = an "article"
    // fully containing it plus enough novel text that J = 6/34 ≈ 0.18 —
    // far below the 0.6 jaccard tier; containment(1→2) = 1.0. doc 3 is
    // unrelated.
    val quote = "the quick brown fox jumps over the dog"
    val article = ("breaking news today " + quote + " reporters said more " +
      "words follow here and keep following with fresh material every line " +
      "until the vocabulary is clearly bigger than the quoted fragment")
    val dir = Files.createTempDirectory("containment").toString
    Seq((1L, quote, "en", "s", quote.length.toLong),
        (2L, article, "en", "s", article.length.toLong),
        (3L, "completely different text about sailing ships across oceans", "en", "s", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cont = SparkEntry.queries("q_jaccard_containment")(spark, dir)
      .select("contained_id", "container_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont == Set((1L, 2L)),
      s"expected exactly the quote⊂article direction, got $cont")
    // the symmetric tier must NOT pair them (that's the blind spot)
    val sym = SparkEntry.queries("q_jaccard_shingles")(spark, dir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!sym.contains((1L, 2L)),
      "planted pair must be invisible to symmetric Jaccard for the test to mean anything")
  }

  test("q_ngram_novelty: every non-first copy in an exact-dup group scores 0 novelty") {
    // First-appearance credit goes to the min doc_id of each shingle, so a
    // doc whose text is an exact copy of an earlier doc can have NO novel
    // shingles — the planted-dup generator fixture provides the groups.
    import spark.implicits._
    val dir = Files.createTempDirectory("novelty").toString
    graft.tools.DataGen.generate(spark, 0.04, dir)
    val novelty = SparkEntry.queries("q_ngram_novelty")(spark, dir)
      .select("doc_id", "n_novel").as[(Long, Long)].collect().toMap
    val dupGroups = graft.ops.tbl(spark, dir, "documents")
      .groupBy("text")
      .agg(org.apache.spark.sql.functions.collect_list("doc_id").as("ids"))
      .filter(org.apache.spark.sql.functions.size($"ids") > 1)
      .select("ids").as[Seq[Long]].collect()
    assert(dupGroups.nonEmpty, "fixture planted no exact-dup groups — vacuous")
    dupGroups.foreach { ids =>
      ids.sorted.tail.foreach { id =>
        assert(novelty(id) == 0L,
          s"doc $id duplicates doc ${ids.min} but reports ${novelty(id)} novel shingles")
      }
    }
  }

  test("q_bigram_surprisal: 0/1-token docs emit no row; all-unique bigrams score 1 each") {
    // solo and empty docs have no bigram ⇒ absent from the per-doc frame
    // (batch lag semantics — no row, not a zero row); doc 3's three
    // bigrams are all unique and each start token begins exactly one
    // bigram, so every surprisal is bitlen(1 div 1) = 1.
    val rows = SparkEntry.queries("q_bigram_surprisal")(spark, tinyDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet == Set(3L), s"only the 4-token doc has bigrams: $rows")
    assert(rows(3L) == ((3L, 3L, 1.0)))
  }

  test("q_importance_weights: target = whole corpus makes every weight exactly 0") {
    // tinyDir is all-en, so the target distribution IS the raw
    // distribution: tcs=rcs per bucket and tt=rt ⇒ the likelihood ratio
    // is exactly 1 in every bucket ⇒ f(1)−f(1)=0 — the self-calibration
    // invariant of the signed bitlen form (a float-log formulation would
    // leave ±ulp residue here).
    val rows = SparkEntry.queries("q_importance_weights")(spark, tinyDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) == ((1L, 0L, 0.0)) && rows(2L) == ((1L, 0L, 0.0)))
    assert(rows(3L) == ((4L, 0L, 0.0)))
  }

  test("q_importance_weights: target-exclusive vocabulary ranks target-like docs above the rest") {
    // DSIR directional sanity: docs built from target(en)-side tokens must
    // out-score a doc whose vocabulary never appears in the target slice.
    import spark.implicits._
    val dir = Files.createTempDirectory("dsir").toString
    Seq(
      (1L, "alpha beta alpha beta", "en", "s1", 21L),
      (2L, "alpha beta beta alpha", "en", "s1", 21L),
      (3L, "zulu yankee zulu yankee", "de", "s2", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = SparkEntry.queries("q_importance_weights")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(w(1L) > w(3L) && w(2L) > w(3L),
      s"en-vocab docs must out-score the de-only-vocab doc: $w")
  }

  test("q_zipf_slope: exact banded OLS on a hand-computed source, NULL on a degenerate one") {
    // s_many vocab: a:4 b:2 c:1 d:1 → ranks 1..4 (tiebreak tok ASC puts
    // c before d); x=bitlen(rank)=(1,2,2,3), y=bitlen(cnt)=(3,2,1,1)
    // → n=4 sx=8 sy=7 sxx=18 sxy=12 → slope=(48-56)/(72-64)=-1.0 exactly,
    // intercept=(7·18-8·12)/8=3.75. s_one has ONE vocab entry → the OLS
    // denominator n·sxx-sx² is 0 → NULL via nullif, not a crash.
    import spark.implicits._
    val dir = Files.createTempDirectory("zipf").toString
    Seq(
      (1L, "a a a a b b c d", "en", "s_many", 15L),
      (2L, "tok tok tok", "en", "s_one", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_zipf_slope")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows("s_many") == ((4L, Some(-1.0), Some(3.75))),
      s"hand-computed OLS mismatch: ${rows("s_many")}")
    assert(rows("s_one") == ((1L, None, None)),
      s"degenerate source must yield NULL slope/intercept: ${rows("s_one")}")
  }

  test("q_bpe_merges: character-based pairs (multi-byte safe), frequency-weighted, 1-char words excluded") {
    // "ab"×3 dominates; "héllo" contributes hé/él/ll/lo once each (é is
    // one CHARACTER — a byte-based substring would split it); "x" (len 1)
    // generates nothing. Tiebreak on equal counts is pair ASC in BINARY
    // UTF-8 order (both engines): hé (0x68…) < ll < lo < él (0xC3…).
    import spark.implicits._
    val dir = Files.createTempDirectory("bpe").toString
    Seq(
      (1L, "ab ab ab", "en", "s1", 8L),
      (2L, "héllo x", "en", "s1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_bpe_merges")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.head == (("ab", 3L)), s"argmax merge must be ab×3: ${rows.head}")
    assert(rows.toSet == Set(("ab", 3L), ("hé", 1L), ("él", 1L),
      ("ll", 1L), ("lo", 1L)), s"pair set mismatch: ${rows.toSeq}")
    assert(rows.map(_._1).toSeq == Seq("ab", "hé", "ll", "lo", "él"),
      s"tie order must be (cnt DESC, pair ASC): ${rows.map(_._1).toSeq}")
  }
}
