package graft.multimodal

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batched multimodal operators over MediaItem datasets.
  *
  * Execution shape (the part that must be real at 100 TB):
  *   - every operator is `mapPartitions` over a typed Dataset: one
  *     decoder/codec instance per partition, amortized across the batch —
  *     the Scala analog of a vectorized pandas-batch UDF;
  *   - payload bytes flow executor-local only; nothing collects to the
  *     driver;
  *   - metadata-only pipelines (filters on media_type/width/duration)
  *     never touch `content` — Parquet column pruning skips the heavy
  *     column entirely;
  *   - repartition knob on decode: media payloads are large and skewed, so
  *     decode fans out to `parallelism` partitions sized for executor
  *     memory, independent of the upstream file layout.
  *
  * STUB NOTE: this container ships no image/audio/video codecs, so the
  * byte→pixels/samples step inside each operator is a clearly-marked
  * deterministic fake (`FakeCodec`). The Spark-side contract — schemas,
  * encoders, partitioning, per-partition batching — is real and tested;
  * swapping FakeCodec for a real codec changes no plumbing.
  */
object MediaOps {

  /** Deterministic stand-in for a real media codec. Derives stable pseudo
    * content properties from the payload bytes, so pipelines are testable
    * end-to-end without native decoders.
    */
  object FakeCodec {
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      // ??? real impl: ImageIO/libjpeg decode — container has no codecs.
      val h = java.util.Arrays.hashCode(bytes)
      (math.floorMod(h, 1024) + 32, math.floorMod(h >> 10, 1024) + 32)
    }

    def meanLuma(bytes: Array[Byte]): Double = {
      // ??? real impl: average pixel luminance after decode.
      if (bytes.isEmpty) 0.0
      else bytes.iterator.map(b => (b & 0xff).toDouble).sum / bytes.length / 255.0
    }

    def decodeSamples(bytes: Array[Byte], from: Int, until: Int): Array[Double] = {
      // ??? real impl: PCM decode + resample of the byte range. Fake:
      // centered byte amplitudes in [-1, 1], stable per position.
      (from until math.min(until, bytes.length)).map { i =>
        ((bytes(i) & 0xff) - 128) / 128.0
      }.toArray
    }

    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      // ??? real impl: vision/audio encoder forward pass. Fake: bucketed
      // byte histogram, L2-normalized — deterministic and non-degenerate.
      val acc = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        acc((bytes(i) & 0xff) % dim) += 1f
        i += 1
      }
      val n = math.sqrt(acc.iterator.map(x => x.toDouble * x.toDouble).sum)
      if (n > 0) acc.map(x => (x / n).toFloat) else acc
    }
  }

  /** Decode image payloads to (dims, pixel stats). One codec instance per
    * partition; payloads repartitioned to bound per-task memory.
    */
  def decodeImages(media: Dataset[MediaItem], parallelism: Int = 0): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parted = if (parallelism > 0) media.repartition(parallelism) else media
    parted
      .filter(col("media_type").startsWith("image/"))
      .mapPartitions { it =>
        // per-partition: real impl allocates the native decoder HERE, once.
        it.map { m =>
          val (w0, h0) = if (m.width > 0 && m.height > 0) (m.width, m.height)
            else FakeCodec.decodeDims(m.content)
          DecodedImage(m.media_id, w0, h0, w0.toLong * h0,
            FakeCodec.meanLuma(m.content))
        }
      }
  }

  /** Resize: recompute target dims preserving aspect, emit new MediaItem
    * with updated metadata (payload re-encode is part of the codec stub).
    */
  def resize(media: Dataset[MediaItem], maxSide: Int): Dataset[MediaItem] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w0, h0) = if (m.width > 0 && m.height > 0) (m.width, m.height)
          else FakeCodec.decodeDims(m.content)
        val scale = math.min(1.0, maxSide.toDouble / math.max(w0, h0))
        val (w1, h1) = (math.max(1, (w0 * scale).toInt), math.max(1, (h0 * scale).toInt))
        // ??? real impl: decode → scale → re-encode payload. Fake keeps bytes.
        m.copy(width = w1, height = h1)
      }
    }
  }

  /** Extract a fixed-dim feature vector per media item — the bridge into
    * the similarity/ANN operators (graft.ops.Similarity).
    */
  def extractFeatures(media: Dataset[MediaItem], dim: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition: real impl loads the encoder weights HERE, once.
      it.map(m => MediaFeatures(m.media_id, FakeCodec.embed(m.content, dim)))
    }
  }

  /** Sample up to `n` frames per video payload at uniform timestamps. Frame
    * extraction is flatMap-shaped: output cardinality is bounded (n per
    * item), executor-local, never driver-side.
    */
  def sampleFrames(media: Dataset[MediaItem], n: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type").startsWith("video/"))
      .mapPartitions { it =>
        it.flatMap { m =>
          val dur = if (m.duration_ms > 0) m.duration_ms else 1000L
          (0 until n).iterator.map { i =>
            val ts = dur * i / n
            // ??? real impl: seek+decode the frame at ts. Fake: a stable
            // byte slice keyed by frame index.
            val len = math.max(1, m.content.length / n)
            val off = math.min(i * len, math.max(0, m.content.length - len))
            Frame(m.media_id, i, ts,
              java.util.Arrays.copyOfRange(m.content, off, math.min(off + len, m.content.length)))
          }
        }
      }
  }

  /** Split audio payloads into fixed-duration chunks and compute per-chunk
    * signal stats (RMS) — the audio-modality batch op (flatMap-shaped like
    * sampleFrames: bounded fan-out, executor-local decode).
    */
  def chunkAudio(media: Dataset[MediaItem], chunkMs: Long): Dataset[AudioChunk] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type").startsWith("audio/"))
      .mapPartitions { it =>
        // per-partition: real impl allocates the audio decoder HERE, once.
        it.flatMap { m =>
          val dur = if (m.duration_ms > 0) m.duration_ms else math.max(1L, m.content.length.toLong)
          val nChunks = ((dur + chunkMs - 1) / chunkMs).toInt
          (0 until nChunks).iterator.map { i =>
            val startMs = i * chunkMs
            val endMs = math.min(dur, (i + 1) * chunkMs)
            // byte range proportional to the time range
            val from = (m.content.length.toLong * startMs / dur).toInt
            val until = math.max(from + 1, (m.content.length.toLong * endMs / dur).toInt)
            val samples = FakeCodec.decodeSamples(m.content, from, until)
            val rms =
              if (samples.isEmpty) 0.0
              else math.sqrt(samples.iterator.map(s => s * s).sum / samples.length)
            AudioChunk(m.media_id, i, startMs, endMs, samples.length, rms)
          }
        }
      }
  }

  /** Build a MediaItem dataset from the documents fixture (payload = UTF-8
    * bytes), so the multimodal pipeline is exercisable on shipped testdata.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.ops.tbl(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 5 === 0, lit("video/fake"))
          .when(col("doc_id") % 5 === 1, lit("audio/fake"))
          .otherwise(concat(lit("image/fake-"), col("lang"))).as("media_type"),
        encode(col("text"), "UTF-8").as("content"),
        lit(-1).as("width"), lit(-1).as("height"),
        // timed media carries a (fake) duration; images stay unknown
        when(col("doc_id") % 5 <= 1, col("n_chars") * 10).otherwise(lit(-1L))
          .cast("long").as("duration_ms"),
        lit(new Timestamp(0L)).as("captured_at"))
      .as[MediaItem]
  }
}
