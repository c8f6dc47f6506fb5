package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Composed-pipeline invariants: monotone shrinkage per stage, planted
  * near-dups removed, and determinism.
  */
class PipelineSpec extends SparkSpec {

  import spark.implicits._

  test("pipeline_full counts ≤ pipeline_clean counts per language") {
    val clean = query("q_pipeline_clean")
      .select("lang", "doc_cnt").as[(String, Long)].collect().toMap
    val full = query("q_pipeline_full")
      .select("lang", "doc_cnt").as[(String, Long)].collect().toMap
    full.foreach { case (lang, n) =>
      assert(n <= clean.getOrElse(lang, 0L), s"$lang grew after near-dup removal")
    }
  }

  test("pipeline removes planted exact and near duplicates, keeps originals") {
    val good = (0 until 30).map(j => s"tok_$j").mkString(" ") // 30 tokens: passes gate
    val near = ((0 until 29).map(j => s"tok_$j") :+ "ALTERED").mkString(" ")
    val short = "too short" // fails quality gate
    val rows = Seq(
      (1L, good, "en", "s", 100L),
      (2L, good, "en", "s", 100L), // exact dup of 1
      (3L, near, "en", "s", 100L), // near dup of 1
      (4L, short, "en", "s", 9L),
      (5L, (100 until 135).map(j => s"other_$j").mkString(" "), "fr", "s", 100L))
    val dir = Files.createTempDirectory("pipe").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val clean = SparkEntry.queries("q_pipeline_clean")(spark, dir)
      .select("lang", "doc_cnt").as[(String, Long)].collect().toMap
    assert(clean == Map("en" -> 2L, "fr" -> 1L),
      "quality gate drops doc 4; exact dedup drops doc 2; near-dup 3 survives clean")

    val full = SparkEntry.queries("q_pipeline_full")(spark, dir)
      .select("lang", "doc_cnt").as[(String, Long)].collect().toMap
    assert(full == Map("en" -> 1L, "fr" -> 1L),
      "near-dup removal drops doc 3, keeps lower-id original doc 1")
  }

  test("fuzzyDecontaminate drops the planted paraphrase, keeps clean docs") {
    // a benchmark item's PARAPHRASE shares no exact n-grams but sits next
    // to it in embedding space: plant a corpus embedding at cosine ≈0.997
    // to the bench vector and three orthogonal clean ones; the composed
    // stage must drop exactly the paraphrase (LSH candidates + exact
    // re-score → precision 1.0, so a bucket collision alone cannot evict
    // a clean doc).
    val dim = 8
    def unit(i: Int): Seq[Float] =
      (0 until dim).map(j => if (j == i) 1.0f else 0.0f)
    val bench = Seq((0L, unit(0))).toDF("vec_id", "embedding")
    val emb = Seq(
      (10L, (0 until dim).map(j => if (j == 0) 0.99f else 0.01f)), // paraphrase
      (11L, unit(2)), (12L, unit(3)), (13L, unit(4))
    ).toDF("vec_id", "embedding")
    val docs = Seq(
      (10L, "paraphrased benchmark item", "en"),
      (11L, "clean one", "en"),
      (12L, "clean two", "en"),
      (13L, "clean three", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = graft.ops.Pipeline
      .fuzzyDecontaminate(docs, emb, bench, nBits = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 12L, 13L),
      s"planted paraphrase must drop, clean docs survive: $out")
  }

  test("pipeline is deterministic across runs") {
    val a = query("q_pipeline_full").collect().toSeq
    val b = query("q_pipeline_full").collect().toSeq
    assert(a == b)
  }

  test("stratifiedSample keeps the exact hash-selected docs, independent of partitioning") {
    import spark.implicits._
    val docs = graft.ops.tbl(spark, sfDir, "documents")
    def kept(parts: Int) = graft.ops.Pipeline
      .stratifiedSample(docs.repartition(parts), "lang", cap = 20L)
      .select("doc_id").as[Long].collect().toSet
    val k3 = kept(3)
    // partition-independence: the SAME docs survive under any layout
    assert(k3 == kept(13))
    // selection replicates the documented hash rule exactly (per-million)
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val expect = docs.select("doc_id", "lang").as[(Long, String)].collect()
      .filter { case (id, lang) =>
        val ppm = math.min(1000000L, math.max(1L, 20000000L / totals(lang)))
        id % 1000003L * 2654435761L % 4294967296L % 1000000L < ppm
      }.map(_._1).toSet
    assert(k3 == expect)
  }

  test("stratifiedSample: null-stratum rows are sampled, not dropped") {
    import spark.implicits._
    val df = Seq((1L, "en"), (2L, "en"), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "lang")
    // cap ≥ every stratum total → ppm = 1e6 → everything survives,
    // INCLUDING the null stratum (the totals join is null-safe)
    val kept = graft.ops.Pipeline.stratifiedSample(df, "lang", cap = 100L)
    assert(kept.count() == 4, "null-lang docs must survive the totals join")
    assert(kept.filter(col("lang").isNull).count() == 2)
  }

  test("stratifiedSample: over-capped stratum keeps ~total/1e6 docs, never zero rate") {
    import spark.implicits._
    // total (1.2M) > cap·1e6 (1·1e6): the old percent-granularity rate
    // floored to 0 and silently DELETED the stratum; per-million + clamp
    // keeps rate=1ppm — the stratum survives, overshooting the cap
    val n = 1200000L
    val df = spark.range(n).select(col("id").as("doc_id"), lit("en").as("lang"))
    val out = graft.ops.Pipeline.stratifiedSample(df, "lang", cap = 1L)
    val ppm = out.select("sample_ppm").distinct().as[Long].collect()
    assert(ppm.isEmpty || ppm.sameElements(Array(1L)))
    // exact expected set under the documented hash rule at 1 ppm
    val expect = (0L until n).count(id =>
      id % 1000003L * 2654435761L % 4294967296L % 1000000L < 1L)
    assert(out.count() == expect,
      s"clamped 1-ppm rate must keep the hash-selected $expect docs")
  }

  test("weightedSample: keep rate tracks weight, and rates nest as supersets") {
    import spark.implicits._
    val docs = graft.ops.tbl(spark, sfDir, "documents")
    def kept(ppmPerUnit: Long): Set[Long] =
      graft.ops.Pipeline.weightedSample(docs, "n_chars", ppmPerUnit)
        .select("doc_id").as[Long].collect().toSet
    val (lo, mid, hi) = (kept(200L), kept(800L), kept(3200L))
    // nested: a doc kept at a low rate stays kept at every higher rate
    // (the per-doc hash bucket is fixed; only the threshold moves)
    assert(lo.subsetOf(mid) && mid.subsetOf(hi),
      s"samples must nest: ${lo.size} ⊆ ${mid.size} ⊆ ${hi.size}")
    assert(lo.size < mid.size && mid.size < hi.size)
    // rate tracks weight: among kept-at-200ppm docs, mean n_chars must
    // exceed the corpus mean (longer docs are oversampled by design)
    val all = docs.select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val corpusMean = all.values.sum.toDouble / all.size
    val keptMean = lo.map(all).sum.toDouble / lo.size
    assert(keptMean > corpusMean,
      f"weighted keep must oversample long docs: kept mean $keptMean%.0f vs corpus $corpusMean%.0f")
  }

  test("semanticPrune drops exactly the non-representative cluster members") {
    import spark.implicits._
    val docs = graft.ops.tbl(spark, sfDir, "documents")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pruned = graft.ops.Pipeline.semanticPrune(docs, emb, nBits = 4)
      .select("doc_id").as[Long].collect().toSet
    // reference drop set straight from the cluster machinery
    val dropped = graft.ops.Dedup.connectedComponents(
        graft.ops.Similarity.lshNearDupPairs(emb, nBits = 4))
      .filter(org.apache.spark.sql.functions.col("doc_id") =!=
        org.apache.spark.sql.functions.col("cluster_id"))
      .select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(pruned == all -- dropped)
    assert(dropped.nonEmpty, "fixture planted no semantic near-dups — vacuous")
  }

  test("q_split_leakage finds planted cross-split duplicates with exact per-split counts") {
    // The sf0.01 driver fixture has ZERO exact-dup groups (the hash-oracle
    // pass there is a 0-row match), so exercise the operator's non-empty
    // path on DataGen's planted-dup fixture (sf0.04 plants pairs) and
    // recheck every reported group against a driver-side recount.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("leak").toString
    graft.tools.DataGen.generate(spark, 0.04, dir)
    val out = SparkEntry.queries("q_split_leakage")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty, "planted duplicates must produce at least one cross-split group")
    // driver-side recount: group the raw fixture by text, recompute splits
    val byText = graft.ops.Pipeline.splitAssign(
        graft.ops.tbl(spark, dir, "documents"))
      .select($"doc_id", $"text", $"split")
      .as[(Long, String, String)].collect()
      .groupBy(_._2).values
      .map { g =>
        val splits = g.map(_._3)
        (g.map(_._1).min, g.size.toLong,
          splits.count(_ == "train").toLong,
          splits.count(_ == "val").toLong,
          splits.count(_ == "test").toLong,
          splits.distinct.size)
      }
      .filter(_._6 > 1)
      .map { case (id, n, tr, va, te, _) => (id, n, tr, va, te) }
      .toSeq.sortBy(_._1)
    assert(out.toSeq == byText,
      "reported leakage groups must equal the driver-side recount")
  }
}
