package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) composed
  * from engine primitives — the iterative capstone over q_bpe_merges
  * (which is exactly ONE iteration's candidate table).
  *
  * Scale shape — why BPE training is feasible at 100 TB:
  *   - the corpus token stream collapses ONCE to the word-vocab frame
  *     (map-side-combined wordcount); every subsequent round runs over
  *     unique words weighted by frequency, cost independent of corpus
  *     token count;
  *   - each round moves exactly ONE (a, b, cnt) row to the driver (the
  *     argmax merge rule) — the loop's driver traffic is O(nMerges);
  *   - the merge application is a codegen'd aggregate() fold over each
  *     word's symbol array (leftmost-greedy, the BPE contract) — a narrow
  *     projection, no shuffle; the re-count is the same bounded pair agg.
  *
  * Determinism: the argmax tiebreak is (cnt DESC, a ASC, b ASC) in binary
  * UTF-8 order, so the merge sequence — the tokenizer artifact itself —
  * is a pure function of the corpus, independent of partition layout.
  */
object Bpe {

  /** Corpus → word-vocab frame: one row per unique whitespace word with
    * its frequency and its initial symbol sequence (one symbol per
    * CHARACTER — multi-byte safe via substring, not byte slicing).
    */
  def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      // empty words (split artifacts of repeated/leading whitespace) carry
      // no pairs AND would trip sequence(1, 0) — which Spark evaluates
      // DESCENDING as [1, 0], yielding two phantom "" symbols
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), initialSyms(col("w")).as("syms"))

  /** One symbol per CHARACTER (multi-byte safe). Callers must guarantee
    * length ≥ 1 (see the wordVocab guard).
    */
  def initialSyms(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(1), length(w)), i => substring(w, i, lit(1)))

  /** Adjacent-symbol pair counts over the vocab frame, weighted by word
    * frequency — the merge-candidate table of one BPE iteration.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
          |  i -> struct(element_at(syms, i) AS a,
          |              element_at(syms, i + 1) AS b))""".stripMargin))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).cast("long").as("cnt"))

  /** Rewrite every word's symbol array applying the merge (a, b) → a+b,
    * leftmost-first and non-overlapping (the greedy fold: a freshly
    * merged symbol can itself left-match the NEXT pair occurrence only
    * if it literally equals `a`, which is the BPE re-scan semantics).
    */
  def applyMerge(vocab: DataFrame, a: String, b: String): DataFrame =
    vocab.withColumn("syms",
      aggregate(col("syms"), expr("slice(syms, 1, 0)"),
        (acc, s) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s)))))

  /** Train `nMerges` merge rules. Returns (merge_idx, a, b, cnt) in merge
    * order; stops early when no pair remains. The vocab frame is
    * localCheckpointed per round so the fold chain never re-plans from
    * the corpus scan.
    */
  def trainMerges(docs: DataFrame, nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = wordVocab(docs).localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
        .collect().headOption
      top match {
        case Some(r) =>
          val (a, b, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
          rules += ((i, a, b, cnt))
          vocab = applyMerge(vocab, a, b).localCheckpoint()
          i += 1
        case None => exhausted = true
      }
    }
    rules.toSeq
  }

  /** Corpus-scale encode: apply an ordered merge-rule list to a frame
    * carrying a `syms` array column — each rule is one codegen'd
    * aggregate() fold, chained as projections (no shuffle, no UDF). Run
    * it over the VOCAB frame and join counts back, never over the raw
    * token stream.
    */
  def encodeVocab(vocab: DataFrame, rules: Seq[(String, String)]): DataFrame =
    rules.foldLeft(vocab) { case (v, (a, b)) => applyMerge(v, a, b) }

  /** Encode one word with an ordered merge-rule list (test/debug helper;
    * the distributed encoder is encodeVocab).
    */
  def encodeWord(word: String, rules: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    rules.foreach { case (a, b) =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      syms.foreach { s =>
        if (out.nonEmpty && out.last == a && s == b) {
          out.remove(out.length - 1); out += (a + b)
        } else out += s
      }
      syms = out.toSeq
    }
    syms
  }
}
