package graft.examples

import java.nio.file.Files

import graft.Graft
import graft.ops.{Pipeline, Scale}

/** End-to-end training-data curation pipeline, composed from the engine's
  * operators — the flow a 100 TB corpus runs, demonstrated on the fixture:
  *
  *   read → quality gate → exact dedup → MinHash-LSH near-dup removal →
  *   PII scrub → deterministic sample → train/val/test split →
  *   (split, lang)-partitioned parquet write
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

    // Stages 1-4 and 6 are Pipeline's OWN stage helpers — the example
    // demonstrates exactly what the declared queries verify, not a copy.

    // 1. quality gate: bounded token count (narrow filter, no shuffle)
    val quality = Pipeline.qualityGate(raw)

    // 2. exact dedup: keep the lowest doc_id per identical text (keyed window)
    val exact = Pipeline.exactDedup(quality)

    // 3. near-dup removal: drop the higher id of each MinHash-LSH pair
    val neardup = Pipeline.nearDupRemoval(exact)

    // 4. PII scrub: redact emails/digit runs, keep the audit hit count
    //    (stateless projection — free to compose anywhere in the flow)
    val scrubbed = Pipeline.scrubStage(neardup)

    // 5. deterministic 50% sample: content-hash threshold (replay-stable)
    val sampled = Scale.hashSample(scrubbed, 0.5, Seq("text"))

    // 6. reproducible train/val/test split (same doc → same split, any
    //    cluster/partitioning — see q_split_assign)
    val assigned = Pipeline.splitAssign(sampled)

    // 7. partitioned write: downstream per-split/per-lang reads prune dirs
    Scale.partitionedWrite(assigned, outDir, Seq("split", "lang"))

    val counts = Seq(
      "raw" -> raw.count(), "quality" -> quality.count(),
      "exact_dedup" -> exact.count(), "neardup_removed" -> neardup.count(),
      "sampled" -> sampled.count(),
      "written" -> spark.read.parquet(outDir).count())
    counts.foreach { case (stage, n) => println(f"$stage%-16s $n%6d docs") }
    assigned.groupBy("split").count().orderBy("split").collect()
      .foreach(r => println(f"  split ${r.getString(0)}%-6s ${r.getLong(1)}%6d docs"))
    println(s"corpus written to $outDir (partitioned by split, lang)")
    spark.stop()
  }
}
