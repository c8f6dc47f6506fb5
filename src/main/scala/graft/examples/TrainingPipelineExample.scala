package graft.examples

import java.nio.file.Files

import graft.Graft
import graft.ops.{Pipeline, Scale}

/** End-to-end training-data curation pipeline, composed from the engine's
  * operators — the flow a 100 TB corpus runs, demonstrated on the fixture:
  *
  *   read → markup strip → rule gate (Gopher/C4) → quality gate → exact dedup →
  *   MinHash-LSH near-dup removal → SemDeDup semantic cluster prune →
  *   semantic benchmark decontamination →
  *   PII scrub → per-lang stratified cap → deterministic sample →
  *   train/val/test split → (split, lang)-partitioned parquet write
  *
  * Every stage is a narrow filter, keyed window or bucketed join; the
  * output layout partition-prunes downstream reads. Run:
  *   sbt "runMain graft.examples.TrainingPipelineExample [sfDir] [outDir]"
  */
object TrainingPipelineExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      Files.createTempDirectory("corpus_out").toString + "/corpus")
    val spark = Graft.session("local[4]", shufflePartitions = 4,
      appName = "training-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    val raw = graft.ops.tbl(spark, sfDir, "documents")

    // All stages are the engine's OWN reusable operators — the example
    // demonstrates exactly what the declared queries verify, not a copy.

    // 0. extraction: strip any markup from the raw text (stateless
    //    projection — the fixture is plain text, so this is a no-op pass
    //    that shows where a web corpus plugs in; see q_html_strip)
    val extracted = raw.withColumn("text",
      graft.ops.TextOps.stripMarkup(org.apache.spark.sql.functions.col("text")))

    // 1. quality gate: the Gopher/C4-style rule gate (per-rule booleans,
    //    exact-integer math — see q_quality_rules) composed with the
    //    bounded-token-count gate; both are narrow filters, no shuffle
    val ruled = graft.ops.TextOps.qualityRules(extracted)
      .filter(org.apache.spark.sql.functions.col("keep"))
      .drop("n_words", "mean_word_len", "stop_hits", "sym_cnt",
        "r_len", "r_wlen", "r_stop", "r_sym", "keep")
    val quality = Pipeline.qualityGate(ruled)

    // 2. exact dedup: keep the lowest doc_id per identical text (keyed window)
    val exact = Pipeline.exactDedup(quality)

    // 3. near-dup removal: drop the higher id of each MinHash-LSH pair
    val neardup = Pipeline.nearDupRemoval(exact)

    // The fixture's embedding table stands in for both embedding frames
    // below: vec_id < 100 plays the held-out benchmark suite, vec_id >=
    // 100 the corpus side (vec_id aligns 1:1 with doc_id; docs without a
    // corpus embedding row pass through stages 3a/3b untouched).
    val allEmb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpusEmb = allEmb.filter(
      org.apache.spark.sql.functions.col("vec_id") >= 100)
    val benchEmb = allEmb.filter(
      org.apache.spark.sql.functions.col("vec_id") < 100)

    // 3a. SemDeDup-style semantic prune: collapse the CORPUS's own
    //    embedding-space near-dup clusters to one representative —
    //    catches the translations/heavy paraphrases MinHash shingles
    //    miss (see q_semdedup_prune). Corpus frame only: pruning against
    //    the benchmark frame is 3b's job, with different semantics
    //    (drop EVERY match, keep no representative).
    val semPruned = Pipeline.semanticPrune(neardup, corpusEmb)

    // 3b. semantic decontamination: drop docs whose embedding nearly
    //    matches a held-out benchmark item — paraphrases defeat the
    //    n-gram tier; in embedding space they are near-dups (see
    //    q_decontaminate_fuzzy).
    val deconned = Pipeline.fuzzyDecontaminate(semPruned, corpusEmb, benchEmb)

    // 4. PII scrub: redact emails/digit runs, keep the audit hit count
    //    (stateless projection — free to compose anywhere in the flow)
    val scrubbed = Pipeline.scrubStage(deconned)

    // 5. per-language cap: rate-based stratified sampling (no corpus
    //    shuffle — see q_stratified_sample), then a deterministic 50%
    //    content-hash sample (replay-stable, nested subsets)
    val balanced = Pipeline.stratifiedSample(scrubbed, "lang", cap = 400L)
      .drop("stratum_total", "sample_ppm")
    val sampled = Scale.hashSample(balanced, 0.5, Seq("text"))

    // 6. reproducible train/val/test split (same doc → same split, any
    //    cluster/partitioning — see q_split_assign)
    val assigned = Pipeline.splitAssign(sampled)

    // 7. partitioned write: downstream per-split/per-lang reads prune dirs
    Scale.partitionedWrite(assigned, outDir, Seq("split", "lang"))

    val nNeardup = neardup.count()
    val nDecon = deconned.count()
    val counts = Seq(
      "raw" -> raw.count(), "rule_gate" -> ruled.count(),
      "quality" -> quality.count(),
      "exact_dedup" -> exact.count(), "neardup_removed" -> nNeardup,
      "sem_pruned" -> semPruned.count(),
      "decontaminated" -> nDecon,
      "sampled" -> sampled.count(),
      "written" -> spark.read.parquet(outDir).count())
    counts.foreach { case (stage, n) => println(f"$stage%-16s $n%6d docs") }
    println(f"  decon audit: ${semPruned.count() - nDecon}%d docs flagged as semantic " +
      f"matches of ${benchEmb.count()}%d benchmark items (removed pre-scrub)")
    assigned.groupBy("split").count().orderBy("split").collect()
      .foreach(r => println(f"  split ${r.getString(0)}%-6s ${r.getLong(1)}%6d docs"))
    println(s"corpus written to $outDir (partitioned by split, lang)")
    spark.stop()
  }
}
