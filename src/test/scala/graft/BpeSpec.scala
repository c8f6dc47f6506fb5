package graft

import java.nio.file.Files
import graft.ops.Bpe

/** BPE training pinned against the hand-computable classic corpus
  * (Sennrich et al. 2016 §3.2 shape, no end-of-word marker):
  * {low:5, lower:2, newest:6, widest:3}. Each expected merge is
  * re-derived in the comment next to its assertion.
  */
class BpeSpec extends SparkSpec {

  private lazy val corpusDir: String = {
    val dir = Files.createTempDirectory("bpe-train").toString
    import spark.implicits._
    // word frequencies via repetition: low×5, lower×2, newest×6, widest×3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq((1L, text, "en", "s1", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("trainMerges learns the classic merge sequence deterministically") {
    val docs = graft.ops.tbl(spark, corpusDir, "documents")
    val rules = Bpe.trainMerges(docs, nMerges = 4)
    // iter 1 pairs: es 9 (newest 6 + widest 3), st 9, we 8 (newest 6 +
    //   lower 2), lo 7, ow 7, ne 6, ew 6, wi 3, id 3, de 3, er 2.
    //   max 9: (e,s) vs (s,t) → a ASC picks (e,s).
    assert(rules(0)._2 -> rules(0)._3 == "e" -> "s" && rules(0)._4 == 9L)
    // iter 2: newest = n,e,w,es,t; widest = w,i,d,es,t → (es,t) 9 is the
    //   unique max (st and the newest-side we are gone).
    assert(rules(1)._2 -> rules(1)._3 == "es" -> "t" && rules(1)._4 == 9L)
    // iter 3: remaining max 7: (l,o) vs (o,w) → a ASC picks (l,o).
    assert(rules(2)._2 -> rules(2)._3 == "l" -> "o" && rules(2)._4 == 7L)
    // iter 4: (lo,w) 7 beats ne/ew/w-est at 6.
    assert(rules(3)._2 -> rules(3)._3 == "lo" -> "w" && rules(3)._4 == 7L)
  }

  test("trainMergesBatched ≡ trainMerges merge-for-merge on the classic corpus") {
    val docs = graft.ops.tbl(spark, corpusDir, "documents")
    val seq10 = Bpe.trainMerges(docs, nMerges = 10)
    // every batch width must reproduce the sequential artifact exactly —
    // the merge table IS the tokenizer, so "close" is not a thing
    for (cap <- Seq(1, 2, 8)) {
      val bat = Bpe.trainMergesBatched(docs, nMerges = 10, batchCap = cap)
      assert(bat == seq10, s"batchCap=$cap diverged:\n$bat\nvs\n$seq10")
    }
  }

  test("trainMergesBatched stops the batch where a created pair could win") {
    import spark.implicits._
    // Adversarial corpus: snapshot ranking is (m,n)=10, (a,m)=9, (d,e)=9.
    // Merging (m,n) CREATES (a,mn)=9, which sequentially beats (d,e) on
    // the a-ASC tiebreak — so a naive batcher that skips the incompatible
    // (a,m) and accepts the disjoint (d,e) in round 1 would emit the
    // wrong merge order. The prefix rule stops at (a,m) instead.
    val dir = Files.createTempDirectory("bpe-adv").toString
    val text = (Seq.fill(9)("amn") ++ Seq.fill(1)("mn") ++
      Seq.fill(9)("de")).mkString(" ")
    Seq((1L, text, "en", "s1", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = graft.ops.tbl(spark, dir, "documents")
    val seq4 = Bpe.trainMerges(docs, nMerges = 4)
    // sequential: (m,n)=10, then created (a,mn)=9 outranks (d,e)=9
    assert(seq4.map(r => (r._2, r._3)).take(2) == Seq("m" -> "n", "a" -> "mn"))
    val bat4 = Bpe.trainMergesBatched(docs, nMerges = 4, batchCap = 8)
    assert(bat4 == seq4, s"batched diverged on created-pair dominance:\n$bat4\nvs\n$seq4")
  }

  test("applyMerge is leftmost-greedy and non-overlapping (aaa → [aa, a])") {
    import spark.implicits._
    val vocab = Seq((1L, Seq("a", "a", "a"))).toDF("freq", "syms")
    val out = Bpe.applyMerge(vocab, "a", "a")
      .collect().head.getSeq[String](1)
    assert(out == Seq("aa", "a"), s"greedy fold violated: $out")
  }

  test("encodeWord replays the learned merges (engine fold ≡ scala fold)") {
    val docs = graft.ops.tbl(spark, corpusDir, "documents")
    val rules = Bpe.trainMerges(docs, nMerges = 4).map(r => (r._2, r._3))
    assert(Bpe.encodeWord("newest", rules) == Seq("n", "e", "w", "est"))
    assert(Bpe.encodeWord("lowest", rules) == Seq("low", "est"))
    // the engine-side fold agrees: encode the same word via applyMerge
    import spark.implicits._
    var v = Seq((1L, "lowest".map(_.toString))).toDF("freq", "syms")
    rules.foreach { case (a, b) => v = Bpe.applyMerge(v, a, b) }
    assert(v.collect().head.getSeq[String](1) == Seq("low", "est"))
  }

  test("q_bpe_encode census equals the driver-side encoder word-by-word") {
    val docs = graft.ops.tbl(spark, corpusDir, "documents")
    val rules = Bpe.trainMerges(docs, nMerges = 10).map(r => (r._2, r._3))
    // expected: encode each word with the scala fold, weight by frequency
    val freqs = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val expTokens = freqs.map { case (w, f) =>
      Bpe.encodeWord(w, rules).length * f }.sum
    val row = SparkEntry.queries("q_bpe_encode")(spark, corpusDir)
      .collect().head
    assert(row.getString(0) == "s1" && row.getLong(1) == 16L &&
      row.getLong(2) == expTokens &&
      row.getDouble(3) == expTokens.toDouble / 16.0,
      s"census mismatch: $row (expected n_tokens=$expTokens)")
  }

  test("wordVocab drops empty split artifacts (no phantom symbols)") {
    import spark.implicits._
    // double space → split yields a "" word; sequence(1,0) is DESCENDING
    // in Spark, so an unguarded vocab would emit two "" symbols for it
    val docs = Seq((1L, "a  b", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val v = Bpe.wordVocab(docs).collect()
      .map(r => r.getSeq[String](1).mkString("|") -> r.getLong(0)).toMap
    assert(v == Map("a" -> 1L, "b" -> 1L), s"vocab polluted: $v")
  }

  test("q_bpe_train declared key returns the merge table in merge order") {
    val rows = SparkEntry.queries("q_bpe_train")(spark, corpusDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val first = rows.head
    assert(first.getLong(0) == 0L && first.getString(1) == "e" &&
      first.getString(2) == "s" && first.getString(3) == "es" &&
      first.getLong(4) == 9L)
  }
}
