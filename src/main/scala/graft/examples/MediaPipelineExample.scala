package graft.examples

import org.apache.spark.sql.functions._

import graft.Graft
import graft.multimodal.MediaOps

/** End-to-end MEDIA curation pipeline, composed from the engine's
  * multimodal operators — the flow a 100 TB media lake runs, demonstrated
  * on the synthesized fixture:
  *
  *   read → modality split → real decode (quality gate: decodability +
  *   dims) → perceptual dedup per modality (image dHash census + Hamming
  *   tier, audio spectral fingerprint, video frame-mix fingerprint) →
  *   feature extraction on the survivors → quantized kNN graph over the
  *   feature vectors (the semdedup/ANN-base primitive)
  *
  * Scale properties the composition preserves: payload bytes stay
  * executor-local through every stage (the only things that ever shuffle
  * are 8-byte fingerprints and 64-float feature vectors), the codec work
  * is one mapPartitions pass per stage, and the dedup census is
  * map-side-combined. Run:
  *   sbt "runMain graft.examples.MediaPipelineExample [sfDir]"
  */
object MediaPipelineExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Graft.session("local[4]", shufflePartitions = 4,
      appName = "media-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val media = MediaOps.mediaFromDocuments(spark, sfDir)
    val total = media.count()

    // 1. decode gate: only images that REALLY decode (and aren't tiny)
    //    survive — decoded_ok=false rows are corrupt or foreign payloads
    val decoded = MediaOps.decodeImages(media)
      .filter(d => d.decoded_ok && d.n_pixels >= 32L * 32L)
    val okImages = decoded.map(_.media_id).collect().toSet

    // 2. perceptual dedup per modality: exact-hash census keeps the
    //    cluster minimum (canonical) per fingerprint
    val imgHashes = MediaOps.perceptualHash(media)
    val imgCanon = imgHashes.toDF().filter(col("decoded_ok"))
      .groupBy("phash").agg(min("media_id").as("media_id"))
    val imgNear = MediaOps.phashNearDupPairs(imgHashes, maxHamming = 3)
    val audCanon = MediaOps.audioFingerprint(media).toDF()
      .filter(col("decoded_ok"))
      .groupBy("ahash").agg(min("media_id").as("media_id"))
    val vidCanon = MediaOps.videoFingerprint(media).toDF()
      .filter(col("decoded_ok"))
      .groupBy("vhash").agg(min("media_id").as("media_id"))
    val canonical = imgCanon.select("media_id")
      .unionByName(audCanon.select("media_id"))
      .unionByName(vidCanon.select("media_id"))

    // 3. features for the deduped survivors, then the kNN graph over the
    //    (quantized) feature space — the input a SemDeDup-style semantic
    //    prune or an ANN index build consumes
    val feats = MediaOps.extractFeatures(media).toDF()
      .join(canonical, "media_id")
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val knn = graft.ops.Similarity.knnGraphQuantized(feats, k = 3)

    println(s"media rows:            $total")
    println(s"decodable images:      ${okImages.size}")
    println(s"canonical after dedup: ${canonical.count()} " +
      s"(img ${imgCanon.count()}, aud ${audCanon.count()}, vid ${vidCanon.count()})")
    println(s"image near-dup pairs (Hamming<=3): ${imgNear.count()}")
    println(s"kNN-graph edges:       ${knn.count()}")
    spark.stop()
  }
}
