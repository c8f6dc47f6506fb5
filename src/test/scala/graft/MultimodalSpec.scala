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
    // the fixture is real MJPEG-AVI: every sampled frame is a REAL demuxed
    // JPEG that ImageIO decodes at the container-declared dims
    assert(frames.forall(_.decoded_ok), "fixture videos must demux")
    val dims = media.filter(col("media_type").startsWith("video/"))
      .select("media_id", "width", "height").as[(Long, Int, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    frames.foreach { f =>
      val img = ImageCodec.decode(f.frame_bytes)
      assert(img.isDefined, s"frame of ${f.media_id} must be a decodable JPEG")
      assert((img.get.getWidth, img.get.getHeight) == dims(f.media_id),
        s"frame dims must match the AVI header for ${f.media_id}")
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
    assert(scan.contains("ReadSchema") && !scan.contains("content"),
      "payload binary column must be pruned from a metadata-only query")
  }

  // --- real-codec assertions (JDK ImageIO / javax.sound) ---

  private def item(id: Long, mt: String, bytes: Array[Byte]): MediaItem =
    MediaItem(id, mt, bytes, -1, -1, -1L, new java.sql.Timestamp(0L))

  test("decodeImages computes the exact Rec.601 luminance of a known PNG") {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000) // black: 0
    img.setRGB(1, 0, 0xffffff) // white: 1
    img.setRGB(0, 1, 0xff0000) // red:   0.299
    img.setRGB(1, 1, 0x0000ff) // blue:  0.114
    val ds = Seq(item(1L, "image/png", ImageCodec.encodePng(img))).toDS()
    val d = MediaOps.decodeImages(ds).collect().head
    assert(d.width == 2 && d.height == 2 && d.n_pixels == 4L && d.decoded_ok)
    val expected = (0.0 + 1.0 + 0.299 + 0.114) / 4
    assert(math.abs(d.mean_luma - expected) < 1e-12,
      s"PNG roundtrip is lossless; got ${d.mean_luma}, want $expected")
  }

  test("resize really rescales pixels: payload re-decodes at the new dims") {
    val img = new java.awt.image.BufferedImage(60, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 60) img.setRGB(x, y, (x * 4) << 16 | (y * 8))
    val ds = Seq(item(2L, "image/png", ImageCodec.encodePng(img))).toDS()
    val out = MediaOps.resize(ds, maxSide = 16).collect().head
    assert(out.width == 16 && out.height == 8)
    val redecoded = ImageCodec.decode(out.content)
    assert(redecoded.exists(i => i.getWidth == 16 && i.getHeight == 8),
      "resized payload must be a real PNG at the scaled dims")
  }

  test("chunkAudio computes true RMS from decoded PCM samples") {
    val wav = AudioCodec.encodeWavPcm16(Array.fill(2000)(0.5), hz = 4000)
    val ds = Seq(item(3L, "audio/wav", wav)).toDS()
    val chunks = MediaOps.chunkAudio(ds, chunkMs = 250L).collect().sortBy(_.chunk_idx)
    assert(chunks.length == 2) // 2000 samples @4kHz = 500 ms
    chunks.foreach { c =>
      assert(c.n_samples == 1000)
      assert(math.abs(c.rms - 0.5) < 1e-3, // 16-bit quantization tolerance
        s"constant 0.5 signal must have RMS 0.5, got ${c.rms}")
    }
  }

  test("WAV codec roundtrip preserves samples to 16-bit precision") {
    val samples = Array.tabulate(512)(i => math.sin(i * 0.1) * 0.8)
    val decoded = AudioCodec.decodeWavPcm16(AudioCodec.encodeWavPcm16(samples, 8000))
    assert(decoded.isDefined)
    val (back, hz) = decoded.get
    assert(hz == 8000 && back.length == 512)
    // quantization (1/2 LSB) + 32767-encode/32768-decode scale mismatch
    samples.zip(back).foreach { case (a, b) => assert(math.abs(a - b) <= 2.0 / 32768) }
  }

  test("image features are content-based: encoding-invariant, luma-faithful") {
    // the SAME pixels encoded two ways (PNG vs BMP) must produce IDENTICAL
    // features — true for a decoded-pixel descriptor, impossible for any
    // statistic over the compressed bytes
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, (x * 32) << 16 | (y * 32) << 8)
    val png = ImageCodec.encodePng(img)
    val bmp = { // BMP is uncompressed — a maximally different byte layout
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", baos)
      baos.toByteArray
    }
    assert(!java.util.Arrays.equals(png, bmp))
    val ds = Seq(item(10L, "image/png", png), item(11L, "image/bmp", bmp)).toDS()
    val f = MediaOps.extractFeatures(ds, dim = 64).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    assert(f(10L) == f(11L), "same pixels, same features, any encoding")
    // luma fidelity: an all-black image puts all mass in bucket 0
    val black = Seq(item(12L, "image/png", ImageCodec.encodePng(
      new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)))).toDS()
    val fb = MediaOps.extractFeatures(black, dim = 64).collect().head.features
    assert(fb(0) == 1.0f && fb.drop(1).forall(_ == 0.0f))
  }

  test("corrupt payloads degrade to the fallback, never fail the partition") {
    // an image-typed row with undecodable bytes must yield a fallback
    // record (metadata dims or byte-derived), not a task failure — at
    // 100 TB a single corrupt blob must not kill a 10^6-row partition
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val ds = Seq(
      item(20L, "image/png", junk), // claims PNG, is garbage
      item(21L, "audio/wav", junk)) // claims WAV, is garbage
      .toDS()
    val imgs = MediaOps.decodeImages(ds).collect()
    assert(imgs.length == 1 && imgs.head.media_id == 20L)
    assert(imgs.head.width >= 32 && imgs.head.mean_luma >= 0.0 &&
      imgs.head.mean_luma <= 1.0)
    // fabricated stats must be FILTERABLE: the fallback record is marked
    assert(!imgs.head.decoded_ok)
    val chunks = MediaOps.chunkAudio(ds, 500L).collect()
    assert(chunks.nonEmpty && chunks.forall(c => c.rms >= 0.0 && c.rms <= 1.0))
    val resized = MediaOps.resize(ds, 16).collect()
    assert(resized.length == 2 && resized.forall(m => m.width <= 16 || m.height <= 16))
    val feats = MediaOps.extractFeatures(ds).collect()
    assert(feats.length == 2 && feats.forall(_.features.length == 64))
  }

  test("fixture payloads are genuinely decodable media") {
    val rows = media.collect()
    val images = rows.filter(_.media_type.startsWith("image/"))
    val audios = rows.filter(_.media_type.startsWith("audio/"))
    val videos = rows.filter(_.media_type.startsWith("video/"))
    assert(images.nonEmpty && audios.nonEmpty && videos.nonEmpty)
    images.foreach(m => assert(ImageCodec.decode(m.content).isDefined,
      s"media ${m.media_id}: image payload must decode with ImageIO"))
    audios.foreach(m => assert(AudioCodec.decodeWavPcm16(m.content).isDefined,
      s"media ${m.media_id}: audio payload must decode as PCM16 WAV"))
    videos.foreach { m =>
      val s = VideoCodec.demux(m.content)
      assert(s.isDefined, s"media ${m.media_id}: video payload must demux as AVI")
      assert(s.get.nFrames >= 4 && s.get.width == m.width &&
        s.get.height == m.height && s.get.durationMs == m.duration_ms)
    }
  }

  // --- real-video-codec assertions (RIFF/MJPEG demux) ---

  test("AVI mux/demux roundtrip is byte-exact per frame, timing intact") {
    // known JPEG frames in → demux → the SAME bytes out (the demuxer
    // slices, never transcodes), geometry and µs/frame from the headers
    val imgs = (0 until 3).map { i =>
      val im = new java.awt.image.BufferedImage(20, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 20) im.setRGB(x, y, (i * 80) << 16 | (x * 12) << 8 | y * 20)
      VideoCodec.encodeJpeg(im)
    }
    val avi = VideoCodec.muxMjpegAvi(imgs, 20, 12, fps = 5)
    val s = VideoCodec.demux(avi).get
    assert(s.width == 20 && s.height == 12 && s.nFrames == 3)
    assert(s.usPerFrame == 200000L && s.durationMs == 600L)
    (0 until 3).foreach { i =>
      assert(java.util.Arrays.equals(VideoCodec.frameBytes(avi, s, i), imgs(i)),
        s"frame $i must roundtrip byte-exact")
    }
    // timestamp→frame seek: each frame owns [i·200ms, (i+1)·200ms)
    assert(s.frameIndexAt(0L) == 0 && s.frameIndexAt(199L) == 0)
    assert(s.frameIndexAt(200L) == 1 && s.frameIndexAt(599L) == 2)
    assert(s.frameIndexAt(10000L) == 2, "past-the-end seek clamps to last")
  }

  test("sampleFrames decodes EXACT pixel content of a known fixture video") {
    // a solid-gray MJPEG frame survives JPEG (DC-only block) — pin the
    // decoded luminance EXACTLY against a direct decode of the same bytes
    val gray = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) gray.setRGB(x, y, 0x808080)
    val jpeg = VideoCodec.encodeJpeg(gray)
    val avi = VideoCodec.muxMjpegAvi(Seq(jpeg, jpeg), 16, 16, fps = 4)
    val ds = Seq(item(30L, "video/avi", avi)).toDS()
    val frames = MediaOps.sampleFrames(ds, 2).collect().sortBy(_.frame_idx)
    assert(frames.length == 2 && frames.forall(_.decoded_ok))
    assert(frames.map(_.frame_ms).toSeq == Seq(0L, 250L))
    val expected = ImageCodec.meanLuma(ImageCodec.decode(jpeg).get)
    frames.foreach { f =>
      val img = ImageCodec.decode(f.frame_bytes).get
      assert(img.getWidth == 16 && img.getHeight == 16)
      assert(ImageCodec.meanLuma(img) == expected,
        "sampled frame bytes ARE the muxed JPEG: luminance must match exactly")
    }
    // and the gray luma itself is what JPEG preserved: 0x80/255 ± quantization
    assert(math.abs(expected - 128.0 / 255.0) < 0.01)
  }

  test("non-AVI video payloads degrade to the marked byte-slice fallback") {
    val junk = Array.tabulate[Byte](100)(i => (i * 13).toByte)
    val ds = Seq(item(31L, "video/mp4", junk)).toDS()
    val frames = MediaOps.sampleFrames(ds, 4).collect()
    assert(frames.length == 4 && frames.forall(f => !f.decoded_ok))
    assert(frames.forall(_.frame_bytes.nonEmpty))
  }

  test("ImageCodec.decode rejects decompression bombs from the header alone") {
    // a VALID 8×8 PNG whose IHDR is patched to declare 40000×40000
    // (1.6 G pixels): decoding would allocate ~6.4 GB before any catch —
    // an OutOfMemoryError that escapes `catch Exception` and can kill the
    // executor JVM. The header sniff must return None without attempting
    // the read. IHDR layout: length(4) "IHDR"(4) w(4) h(4) ... crc(4);
    // the CRC is recomputed over type+data so the header itself parses.
    val png = ImageCodec.synthPng(7L, 8, 8)
    def putBE(v: Int, off: Int): Unit = {
      png(off) = ((v >> 24) & 0xff).toByte; png(off + 1) = ((v >> 16) & 0xff).toByte
      png(off + 2) = ((v >> 8) & 0xff).toByte; png(off + 3) = (v & 0xff).toByte
    }
    putBE(40000, 16); putBE(40000, 20) // IHDR width, height
    val crc = new java.util.zip.CRC32
    crc.update(png, 12, 17) // "IHDR" + 13 data bytes
    putBE(crc.getValue.toInt, 29)
    val t0 = System.nanoTime()
    assert(ImageCodec.decode(png).isEmpty, "bomb payload must degrade to None")
    assert((System.nanoTime() - t0) < 5e9, "rejection must come from the header, not a decode attempt")
    // and an unpatched payload still decodes fine through the same path
    assert(ImageCodec.decode(ImageCodec.synthPng(7L, 8, 8)).exists(i =>
      i.getWidth == 8 && i.getHeight == 8))
  }

  // little-endian u32 append, for hand-crafting corrupt RIFF payloads
  private def le32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  test("demux terminates on a chunk size field >= 2^31 (no spin, no rewind)") {
    // a size of 0xFFFFFFF8 is -8 as an Int: a cursor advanced in Int
    // arithmetic would stall in place forever. The walk must clamp in Long
    // and finish — degrading to None, never hanging the executor task.
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); le32(out, 1000L)
    out.write("AVI ".getBytes("US-ASCII"))
    out.write("00dc".getBytes("US-ASCII")); le32(out, 0xFFFFFFF8L)
    out.write(Array.fill[Byte](64)(0x11))
    val t0 = System.nanoTime()
    assert(VideoCodec.demux(out.toByteArray).isEmpty)
    assert((System.nanoTime() - t0) < 5e9, "corrupt-size demux must return promptly")
  }

  test("demux survives deeply nested LIST headers (no StackOverflowError)") {
    // ~200k nested LISTs would blow a recursive walker's stack — and
    // StackOverflowError is an Error, escaping a `catch Exception` and
    // failing the task despite the never-throws contract. The iterative
    // walk returns None (no frames) on heap-bounded state.
    val depth = 200000
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); le32(out, 4L + depth * 12L)
    out.write("AVI ".getBytes("US-ASCII"))
    (0 until depth).foreach { i =>
      out.write("LIST".getBytes("US-ASCII"))
      le32(out, (depth - i) * 12L - 8L)
      out.write("rec ".getBytes("US-ASCII"))
    }
    assert(VideoCodec.demux(out.toByteArray).isEmpty)
  }

  test("sampleFrames sniffs JPEG SOI per frame: non-JPEG chunks are decoded_ok=false") {
    // a structurally valid AVI whose '00dc' payload is NOT a JPEG (e.g. an
    // uncompressed DIB stream): demux succeeds and the real frame bytes
    // come through, but decoded_ok must reflect decodability, not the
    // container's say-so
    val notJpeg = Array.tabulate[Byte](48)(i => (i * 7 + 3).toByte)
    val avi = VideoCodec.muxMjpegAvi(Seq(notJpeg, notJpeg), 8, 8, fps = 4)
    val frames = MediaOps.sampleFrames(Seq(item(32L, "video/avi", avi)).toDS(), 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 2)
    // demux path, not the byte-slice fallback: the emitted bytes are the
    // exact muxed chunk and timing comes from the stream header
    assert(frames.forall(f => java.util.Arrays.equals(f.frame_bytes, notJpeg)))
    assert(frames.map(_.frame_ms).toSeq == Seq(0L, 250L))
    assert(frames.forall(f => !f.decoded_ok), "non-JPEG frames must not claim decodability")
  }

  // --- content-based feature assertions ---

  test("audio features are spectral: a pure tone peaks in its Goertzel band") {
    // tone at band k's center frequency ω = π(k+0.5)/dim rad/sample
    val dim = 64
    val k = 10
    val w = math.Pi * (k + 0.5) / dim
    val samples = Array.tabulate(4000)(i => 0.7 * math.sin(w * i))
    val e = AudioCodec.bandEnergies(samples, dim)
    assert(e.indexOf(e.max) == k, s"tone must peak at band $k, got ${e.indexOf(e.max)}")
    // descriptor is over DECODED samples: WAV-encoding the tone changes the
    // bytes but not the spectrum (16-bit quantization tolerance)
    val viaWav = MediaOps.extractFeatures(
      Seq(item(40L, "audio/wav", AudioCodec.encodeWavPcm16(samples, 8000))).toDS(),
      dim = dim).collect().head.features
    assert(viaWav.indexOf(viaWav.max) == k)
    e.zip(viaWav).foreach { case (a, b) => assert(math.abs(a - b) < 1e-3) }
  }

  test("video features come from decoded frames, and a planted near-dup image ranks first") {
    // video: features of an AVI of solid-gray frames == features of the
    // gray still image (both are luma histograms over decoded pixels)
    val gray = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) gray.setRGB(x, y, 0x808080)
    val avi = VideoCodec.muxMjpegAvi(Seq(VideoCodec.encodeJpeg(gray)), 16, 16, 4)
    val still = ImageCodec.encodePng(gray)
    val f = MediaOps.extractFeatures(Seq(
      item(50L, "video/avi", avi), item(51L, "image/png", still)).toDS())
      .collect().map(r => r.media_id -> r.features.toSeq).toMap
    assert(f(50L) == f(51L),
      "same pixels via video demux or still decode must embed identically")

    // planted near-duplicate: A' = A with a few pixels nudged must rank
    // nearest to A under cosine over the features, beating distinct B/C
    def mk(fill: Int => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(24, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 24) im.setRGB(x, y, fill(y * 24 + x))
      ImageCodec.encodePng(im)
    }
    val a = mk(i => (i * 3) % 256 << 16 | (i * 7) % 256)
    val aDup = mk(i => if (i % 97 == 0) 0xffffff else (i * 3) % 256 << 16 | (i * 7) % 256)
    val b = mk(i => 0x00ff00)
    val c = mk(i => (255 - i % 256) << 8 | i % 256 << 16)
    val feats = MediaOps.extractFeatures(Seq(
      item(60L, "image/png", a), item(61L, "image/png", aDup),
      item(62L, "image/png", b), item(63L, "image/png", c)).toDS())
      .collect().map(r => r.media_id -> r.features).toMap
    def cos(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    val sims = Seq(61L, 62L, 63L).map(id => id -> cos(feats(60L), feats(id)))
    assert(sims.maxBy(_._2)._1 == 61L,
      s"planted near-dup must rank first by cosine: $sims")
  }

  test("dHash64 is resize- and re-encode-invariant, discriminates content, crops break it") {
    val png = ImageCodec.synthPng(42L, 64, 48)
    val img = ImageCodec.decode(png).get
    val h0 = ImageCodec.dHash64(img)
    // lossless re-encode (identical pixels): hash EXACTLY equal
    val reenc = ImageCodec.decode(ImageCodec.encodePng(img)).get
    assert(ImageCodec.dHash64(reenc) == h0, "lossless re-encode must not change the hash")
    // 2x bilinear upscale: ROBUST, not exact — interpolation flips a few
    // near-threshold comparisons (measured 3 bits on this fixture)
    val scaled = ImageCodec.decode(
      ImageCodec.encodePng(ImageCodec.scaleTo(img, 128, 96))).get
    val rdist = java.lang.Long.bitCount(h0 ^ ImageCodec.dHash64(scaled))
    assert(rdist <= 4, s"2x resize must stay within a few bits, got $rdist")
    // different content hashes differently (Hamming distance well off 0)
    val other = ImageCodec.decode(ImageCodec.synthPng(43L, 64, 48)).get
    val dist = java.lang.Long.bitCount(h0 ^ ImageCodec.dHash64(other))
    assert(dist >= 8, s"distinct synth images must differ in many bits, got $dist")
    // a hard crop shifts the luma grid: expected to break (documented)
    val crop = img.getSubimage(8, 8, 48, 32)
    assert(ImageCodec.dHash64(crop) != h0)
  }

  test("perceptualHash clusters a planted re-encoded dup; fallbacks never join pixel clusters") {
    val png = ImageCodec.synthPng(7L, 40, 30)
    val img = ImageCodec.decode(png).get
    // pixel-identical re-encode: the exact-hash tier's guaranteed collision
    val reenc = ImageCodec.encodePng(img)
    val hashes = MediaOps.perceptualHash(Seq(
        item(1L, "image/png", png),
        item(2L, "image/png", reenc),
        item(3L, "image/png", ImageCodec.synthPng(8L, 40, 30)),
        item(4L, "image/png", Array[Byte](1, 2, 3)), // corrupt
        item(5L, "audio/wav", png)). // wrong modality: filtered out
        toDS())
      .collect().map(h => h.media_id -> h).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L, 4L))
    assert(hashes(1L).decoded_ok && hashes(2L).decoded_ok && hashes(3L).decoded_ok)
    assert(hashes(1L).phash == hashes(2L).phash, "planted dup must collide")
    assert(hashes(1L).phash != hashes(3L).phash, "distinct content must not")
    assert(!hashes(4L).decoded_ok, "corrupt payload takes the marked fallback")
  }

  test("phashNearDupPairs finds a planted resized dup with exact recall over <=3-bit pairs") {
    val png = ImageCodec.synthPng(11L, 64, 48)
    val img = ImageCodec.decode(png).get
    // 2x upscale: a genuine near-dup (measured a few bits away, <= 3)
    val resized = ImageCodec.encodePng(ImageCodec.scaleTo(img, 128, 96))
    val items = Seq(
      item(1L, "image/png", png),
      item(2L, "image/png", resized),
      item(3L, "image/png", ImageCodec.synthPng(12L, 64, 48)),
      item(4L, "image/png", Array[Byte](9, 9))) // corrupt: excluded
    val hashes = MediaOps.perceptualHash(items.toDS())
    val pairs = MediaOps.phashNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"planted resize pair must surface: ${pairs.toSeq}")
    // exact contract: the pair set IS the brute-force <=3 set over ok rows
    val hs = hashes.collect().filter(_.decoded_ok).map(h => h.media_id -> h.phash)
    val brute = (for {
      (ai, ah) <- hs; (bi, bh) <- hs if ai < bi
      d = java.lang.Long.bitCount(ah ^ bh) if d <= 3
    } yield (ai, bi, d.toLong)).toSet
    assert(pairs.toSet == brute, s"banding must lose nothing: ${pairs.toSeq} vs $brute")
  }

  test("audioHash64 is volume- and re-encode-invariant, content-discriminating") {
    val wav = AudioCodec.synthWav(21L, 8000, 4000)
    val (samples, hz) = AudioCodec.decodeWavPcm16(wav).get
    val h0 = AudioCodec.audioHash64(samples)
    // lossless re-encode: 16-bit PCM roundtrips exactly -> exact hash
    val reenc = AudioCodec.decodeWavPcm16(
      AudioCodec.encodeWavPcm16(samples, hz)).get._1
    assert(AudioCodec.audioHash64(reenc) == h0)
    // half volume: within-frame band comparisons are gain-invariant; the
    // 16-bit requantization can flip only near-tie bits
    val half = AudioCodec.decodeWavPcm16(
      AudioCodec.encodeWavPcm16(samples.map(_ * 0.5), hz)).get._1
    val vdist = java.lang.Long.bitCount(h0 ^ AudioCodec.audioHash64(half))
    assert(vdist <= 2, s"volume change must stay within near-tie bits, got $vdist")
    // a different tone hashes far away
    val other = AudioCodec.decodeWavPcm16(AudioCodec.synthWav(22L, 8000, 4000)).get._1
    val dist = java.lang.Long.bitCount(h0 ^ AudioCodec.audioHash64(other))
    assert(dist >= 8, s"distinct tones must differ in many bits, got $dist")
  }

  test("audioFingerprint: audio-only, real decode flag, fallback for corrupt payloads") {
    val wav = AudioCodec.synthWav(5L, 4000, 4000)
    val hashes = MediaOps.audioFingerprint(Seq(
        item(1L, "audio/wav", wav),
        item(2L, "audio/wav", wav), // exact dup
        item(3L, "audio/wav", Array[Byte](0, 1, 2)), // corrupt
        item(4L, "image/png", wav)). // wrong modality: filtered out
        toDS())
      .collect().map(h => h.media_id -> h).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L))
    assert(hashes(1L).decoded_ok && hashes(1L).ahash == hashes(2L).ahash)
    assert(!hashes(3L).decoded_ok)
  }

  test("videoFingerprint: re-mux-invariant, order-sensitive, corrupt payloads fall back") {
    // a real MJPEG-AVI; re-muxing the SAME frame JPEGs must hash equal,
    // the REVERSED clip must not (order-sensitive mix)
    val avi = VideoCodec.synthMjpegAvi(31L, 32, 32, 5, 10)
    val st = VideoCodec.demux(avi).get
    val frames = (0 until st.nFrames).map(i => VideoCodec.frameBytes(avi, st, i))
    val remux = VideoCodec.muxMjpegAvi(frames, 32, 32, 10)
    val rev = VideoCodec.muxMjpegAvi(frames.reverse, 32, 32, 10)
    val hs = MediaOps.videoFingerprint(Seq(
        item(1L, "video/avi", avi),
        item(2L, "video/avi", remux),
        item(3L, "video/avi", rev),
        item(4L, "video/avi", Array[Byte](1, 2, 3))).toDS())
      .collect().map(h => h.media_id -> h).toMap
    assert(hs(1L).decoded_ok && hs(1L).vhash == hs(2L).vhash,
      "container re-mux of identical frames must collide")
    assert(hs(1L).vhash != hs(3L).vhash, "reversed clip must not collide")
    assert(!hs(4L).decoded_ok, "non-demuxable payload takes the fallback")
  }

  test("ahash/vhash near-dup wrappers: planted pair found, fallback rows excluded") {
    // the typed audio/video faces of the Hamming tier (r20 unwired-helper
    // sweep): their one piece of logic beyond delegation is the
    // decoded_ok filter — a FALLBACK hash (synthetic, content-hash
    // derived) colliding near a real fingerprint must never pair
    import spark.implicits._
    val base = 0x0fedcba987654321L
    val aud = Seq(
      graft.multimodal.AudioHash(1L, base, decoded_ok = true),
      graft.multimodal.AudioHash(2L, base ^ 3L, decoded_ok = true), // d=2
      graft.multimodal.AudioHash(3L, base ^ 1L, decoded_ok = false), // d=1 but fallback
      graft.multimodal.AudioHash(4L, ~base, decoded_ok = true)).toDS()
    val aPairs = MediaOps.ahashNearDupPairs(aud)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(aPairs == Set((1L, 2L)),
      s"audio tier must pair (1,2) only — fallback row 3 excluded: $aPairs")
    val vid = Seq(
      graft.multimodal.VideoHash(1L, base, decoded_ok = true),
      graft.multimodal.VideoHash(2L, base ^ (1L << 40), decoded_ok = true),
      graft.multimodal.VideoHash(3L, base, decoded_ok = false),
      graft.multimodal.VideoHash(4L, ~base, decoded_ok = true)).toDS()
    val vPairs = MediaOps.vhashNearDupPairs(vid)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(vPairs == Set((1L, 2L)),
      s"video tier must pair (1,2) only — fallback row 3 excluded: $vPairs")
  }

  test("hammingNearDupPairs (generic core): exact <=d set on synthetic hashes, all band positions") {
    import spark.implicits._
    // one flip in each of the 4 band positions (pinning every band's
    // key extraction), plus a d=4 row with one flip PER band — no band
    // untouched, so candidate generation alone would drop it, which is
    // exactly right because d=4 > maxHamming — and a far-away row
    val base = 0x0123456789abcdefL
    val rows = Seq(
      (1L, base),
      (2L, base ^ 1L), // band 0, d=1
      (3L, base ^ (1L << 17)), // band 1, d=1
      (4L, base ^ (1L << 33) ^ (1L << 34)), // band 2, d=2
      (5L, base ^ (1L << 63) ^ (1L << 62) ^ (1L << 61)), // band 3, d=3
      (6L, base ^ 1L ^ (1L << 17) ^ (1L << 33) ^ (1L << 49)), // d=4: out
      (7L, ~base)) // far away
      .toDF("media_id", "h")
    val got = MediaOps.hammingNearDupPairs(rows, "h", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = Seq(1L -> base, 2L -> (base ^ 1L), 3L -> (base ^ (1L << 17)),
      4L -> (base ^ (1L << 33) ^ (1L << 34)),
      5L -> (base ^ (1L << 63) ^ (1L << 62) ^ (1L << 61)),
      6L -> (base ^ 1L ^ (1L << 17) ^ (1L << 33) ^ (1L << 49)), 7L -> ~base)
    val brute = (for {
      (ai, ah) <- hs; (bi, bh) <- hs if ai < bi
      d = java.lang.Long.bitCount(ah ^ bh) if d <= 3
    } yield (ai, bi, d.toLong)).toSet
    assert(got == brute, s"generic tier must equal brute force: $got vs $brute")
    assert(!got.exists(p => p._1 == 1L && p._2 == 6L), "d=4 pair stays out")
  }

  test("q_media_phash_dup: canonical ids are cluster minima over decoded images only") {
    val rows = query("q_media_phash_dup").collect()
    assert(rows.nonEmpty)
    val decoded = MediaOps.perceptualHash(media).collect()
      .filter(_.decoded_ok)
    assert(rows.map(_.getLong(1)).sum == decoded.length,
      "census must cover every decoded image exactly once")
    val byHash = decoded.groupBy(_.phash)
    rows.foreach { r =>
      assert(r.getLong(2) == byHash(r.getLong(0)).map(_.media_id).min,
        s"canonical_id must be the cluster min for hash ${r.getLong(0)}")
    }
  }
}
