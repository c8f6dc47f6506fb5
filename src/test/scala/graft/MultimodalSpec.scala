package graft

import org.apache.spark.sql.functions._

import graft.multimodal._

/** Invariants for the multimodal pipeline: the decode internals are a
  * deterministic codec stub, so these pin the Spark-side contract — schema,
  * batching, partitioning, determinism, and the bridge into similarity.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def media = MediaOps.mediaFromDocuments(spark, sfDir)

  test("media view: payload is binary, metadata typed, ids unique") {
    val df = media.toDF()
    val sch = df.schema
    assert(sch("content").dataType.typeName == "binary")
    assert(sch("media_type").dataType.typeName == "string")
    assert(sch("duration_ms").dataType.typeName == "long")
    assert(df.count() == df.select("media_id").distinct().count())
    assert(df.filter(col("media_type").startsWith("video/")).count() > 0)
    assert(df.filter(col("media_type").startsWith("image/")).count() > 0)
  }

  test("decodeImages is deterministic, image-only, and batch-shaped") {
    val a = MediaOps.decodeImages(media).collect().sortBy(_.media_id).toSeq
    val b = MediaOps.decodeImages(media, parallelism = 7).collect().sortBy(_.media_id).toSeq
    assert(a == b, "partitioning must not change decode output")
    assert(a.nonEmpty)
    a.foreach { d =>
      assert(d.width >= 32 && d.height >= 32)
      assert(d.n_pixels == d.width.toLong * d.height)
      assert(d.mean_luma >= 0.0 && d.mean_luma <= 1.0)
    }
    // videos are filtered out before decode
    val vids = media.filter(col("media_type").startsWith("video/"))
      .select("media_id").as[Long].collect().toSet
    assert(a.map(_.media_id).toSet.intersect(vids).isEmpty)
  }

  test("resize bounds both dims and preserves aspect monotonically") {
    val out = MediaOps.resize(media, maxSide = 64).collect()
    out.foreach { m =>
      assert(m.width <= 64 && m.height <= 64 && m.width >= 1 && m.height >= 1)
    }
    // resize twice is stable (idempotent at same maxSide)
    val twice = MediaOps.resize(MediaOps.resize(media, 64), 64)
      .collect().map(m => (m.media_id, m.width, m.height)).sortBy(_._1).toSeq
    assert(twice == out.map(m => (m.media_id, m.width, m.height)).sortBy(_._1).toSeq)
  }

  test("sampleFrames emits n frames per video with in-range timestamps") {
    val frames = MediaOps.sampleFrames(media, 4).collect()
    val vids = media.filter(col("media_type").startsWith("video/")).count()
    assert(frames.length == vids * 4)
    frames.groupBy(_.media_id).foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
      fs.foreach(f => assert(f.frame_ms >= 0 && f.frame_bytes.nonEmpty))
    }
  }

  test("chunkAudio covers the duration, audio-only, stable under repartition") {
    val chunks = MediaOps.chunkAudio(media, chunkMs = 500L).collect()
    assert(chunks.nonEmpty)
    val audioIds = media.filter(col("media_type").startsWith("audio/"))
      .select("media_id").as[Long].collect().toSet
    assert(chunks.map(_.media_id).toSet == audioIds)
    chunks.groupBy(_.media_id).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.chunk_idx)
      assert(sorted.head.start_ms == 0L)
      // chunks tile the duration with no gaps
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.end_ms == b.start_ms)
        case _ => ()
      }
      sorted.foreach { c =>
        assert(c.rms >= 0.0 && c.rms <= 1.0 && c.n_samples > 0)
      }
    }
    val reparted = MediaOps.chunkAudio(media.repartition(7), 500L)
      .collect().sortBy(c => (c.media_id, c.chunk_idx)).toSeq
    assert(reparted == chunks.sortBy(c => (c.media_id, c.chunk_idx)).toSeq)
  }

  test("extractFeatures yields unit-norm fixed-dim vectors") {
    val feats = MediaOps.extractFeatures(media, dim = 64).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features.length == 64)
      val n = math.sqrt(f.features.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"media ${f.media_id} norm $n")
    }
  }

  test("q_media_features_topk returns 3 neighbors per probe, deterministic") {
    val a = query("q_media_features_topk").collect().toSeq
    val b = query("q_media_features_topk").collect().toSeq
    assert(a == b)
    val byProbe = a.groupBy(_.getLong(0))
    assert(byProbe.keySet == (0L until 5L).toSet)
    byProbe.values.foreach(rows => assert(rows.length == 3))
  }

  test("metadata-only pipeline prunes the payload column from the scan") {
    val q = media.toDF().filter(col("media_type").startsWith("video/"))
      .select("media_id", "media_type")
    val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("ReadSchema") && !scan.contains("text"),
      "payload source column must be pruned from a metadata-only query")
  }
}
