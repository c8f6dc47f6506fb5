package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Pure-JDK MJPEG-in-AVI video codec: a minimal RIFF muxer/demuxer plus
  * frame seek. AVI is a RIFF container — the same family as the WAV payloads
  * [[AudioCodec]] already parses — and an MJPEG stream's frames are plain
  * JPEGs, which `javax.imageio` decodes natively. Together that gives a real
  * video path (demux → seek → decode actual pixels) with zero non-JDK
  * dependencies.
  *
  * Layout written by [[muxMjpegAvi]] (all sizes little-endian u32):
  * {{{
  * RIFF <sz> "AVI "
  *   LIST <sz> "hdrl"
  *     "avih" 56   main header (µs/frame, total frames, streams=1, w, h)
  *     LIST <sz> "strl"
  *       "strh" 56 stream header ("vids"/"MJPG", scale=1, rate=fps, length)
  *       "strf" 40 BITMAPINFOHEADER (w, h, 24bpp, "MJPG")
  *   LIST <sz> "movi"
  *     "00dc" <sz> <jpeg bytes> [pad to even]  × nFrames
  * }}}
  *
  * The demuxer is tolerant: it walks every chunk, takes geometry from
  * `strf`, timing from `avih`/`strh`, and collects any `##dc`/`##db`
  * payload as a frame — so externally-produced MJPEG AVIs (with `idx1`
  * indexes, extra `JUNK` chunks, `INFO` lists, …) parse too; unknown chunks
  * are skipped by size.
  */
object VideoCodec {

  /** A demuxed MJPEG stream: geometry, frame timing, and each frame's
    * (offset, length) into the original payload — frames are NOT copied at
    * demux time; [[frameBytes]] slices lazily so seek-only access never
    * materializes the frames it skips.
    */
  final case class MjpegStream(
      width: Int,
      height: Int,
      usPerFrame: Long,
      frames: IndexedSeq[(Int, Int)]) {
    def nFrames: Int = frames.length
    def durationMs: Long = nFrames.toLong * usPerFrame / 1000L
    /** Frame index whose display interval contains `tsMs` (clamped). */
    def frameIndexAt(tsMs: Long): Int =
      if (usPerFrame <= 0 || nFrames == 0) 0
      else math.min(nFrames - 1, math.max(0L, tsMs * 1000L / usPerFrame)).toInt
    /** Actual timestamp of frame `idx`, ms. */
    def frameMs(idx: Int): Long = idx.toLong * usPerFrame / 1000L
  }

  // --- little-endian primitives over Array[Byte] ---

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], p: Int): String =
    if (p + 4 > b.length) ""
    else new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private final class LeWriter {
    val out = new ByteArrayOutputStream()
    def bytes(a: Array[Byte]): this.type = { out.write(a); this }
    def ascii(s: String): this.type = { out.write(s.getBytes("US-ASCII")); this }
    def u32(v: Long): this.type = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      this
    }
    def u16(v: Int): this.type = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff); this
    }
    def result(): Array[Byte] = out.toByteArray
  }

  /** Mux pre-encoded JPEG frames into a single-stream MJPEG AVI. */
  def muxMjpegAvi(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    val usPerFrame = 1000000L / fps

    val strh = new LeWriter()
      .ascii("vids").ascii("MJPG").u32(0) // fccType, fccHandler, flags
      .u16(0).u16(0) // priority, language
      .u32(0) // initial frames
      .u32(1).u32(fps) // scale, rate → rate/scale = fps
      .u32(0).u32(jpegFrames.length) // start, length (frames)
      .u32(0).u32(0xffffffffL) // suggested buffer, quality (-1 = default)
      .u32(0) // sample size (0 = varies per frame)
      .u16(0).u16(0).u16(width).u16(height) // rcFrame
      .result()
    val strf = new LeWriter()
      .u32(40).u32(width).u32(height) // biSize, w, h
      .u16(1).u16(24) // planes, bpp
      .ascii("MJPG").u32(width.toLong * height * 3) // compression, image size
      .u32(0).u32(0).u32(0).u32(0) // x/y ppm, clr used, clr important
      .result()
    val strl = new LeWriter()
      .ascii("strl")
      .ascii("strh").u32(strh.length).bytes(strh)
      .ascii("strf").u32(strf.length).bytes(strf)
      .result()
    val avih = new LeWriter()
      .u32(usPerFrame).u32(0).u32(0).u32(0) // µs/frame, maxBps, padding, flags
      .u32(jpegFrames.length).u32(0).u32(1).u32(0) // frames, initial, streams, bufSize
      .u32(width).u32(height)
      .u32(0).u32(0).u32(0).u32(0) // reserved
      .result()
    val hdrl = new LeWriter()
      .ascii("hdrl")
      .ascii("avih").u32(avih.length).bytes(avih)
      .ascii("LIST").u32(strl.length).bytes(strl)
      .result()
    val movi = {
      val w = new LeWriter().ascii("movi")
      jpegFrames.foreach { f =>
        w.ascii("00dc").u32(f.length).bytes(f)
        if ((f.length & 1) == 1) w.out.write(0) // chunks align to even offsets
      }
      w.result()
    }
    val riffBody = new LeWriter()
      .ascii("AVI ")
      .ascii("LIST").u32(hdrl.length).bytes(hdrl)
      .ascii("LIST").u32(movi.length).bytes(movi)
      .result()
    new LeWriter().ascii("RIFF").u32(riffBody.length).bytes(riffBody).result()
  }

  /** Demux an MJPEG AVI payload. Returns None (never throws) for non-AVI /
    * truncated / frameless bytes, so a corrupt payload degrades instead of
    * failing a 10^6-row partition. The chunk walk is ITERATIVE (explicit
    * segment stack, not recursion — nested-LIST depth is attacker-
    * controlled) and advances in Long arithmetic: a size field ≥ 2^31 must
    * clamp to the segment end, not wrap negative and stall or rewind the
    * cursor.
    */
  def demux(bytes: Array[Byte]): Option[MjpegStream] =
    try {
      if (bytes.length < 24 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
      val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
      var width = -1
      var height = -1
      var usPerFrame = 0L
      val frames = Vector.newBuilder[(Int, Int)]
      // Preorder walk with an explicit continuation stack: entering a LIST
      // pushes the remainder of the current segment and narrows to the list
      // body, so chunks are still visited in document order (first-wins
      // fields like strf keep their semantics).
      var p = 12
      var until = end
      var stack = List.empty[(Int, Int)]
      var done = false
      while (!done) {
        if (p + 8 > until) {
          stack match {
            case (a, b) :: t => p = a; until = b; stack = t
            case Nil => done = true
          }
        } else {
          val id = fourcc(bytes, p)
          val sz = u32(bytes, p + 4) // u32: 0..2^32-1, never negative
          val body = p + 8
          val bodyEnd = math.min(until.toLong, body.toLong + sz).toInt
          // next sibling offset in Long; ≥ p+8 always, clamp to segment end
          val next = math.min(until.toLong, body.toLong + sz + (sz & 1L)).toInt
          id match {
            case "RIFF" | "LIST" =>
              if (bodyEnd - body > 4) {
                stack = (next, until) :: stack
                p = body + 4 // skip the list type fourcc
                until = bodyEnd
              } else p = next
            case _ =>
              id match {
                case "avih" if sz >= 4 => usPerFrame = u32(bytes, body)
                case "strh" if sz >= 28 && fourcc(bytes, body) == "vids" =>
                  // rate/scale is the authoritative fps if avih was absent
                  val scale = u32(bytes, body + 20)
                  val rate = u32(bytes, body + 24)
                  if (usPerFrame <= 0 && rate > 0) usPerFrame = 1000000L * scale / rate
                case "strf" if sz >= 12 && width < 0 =>
                  width = u32(bytes, body + 4).toInt
                  height = u32(bytes, body + 8).toInt
                case _ if id.length == 4 &&
                  (id.endsWith("dc") || id.endsWith("db")) &&
                  id.take(2).forall(_.isDigit) =>
                  if (bodyEnd - body > 0) frames += ((body, bodyEnd - body))
                case _ => () // JUNK, idx1, INFO, … — skip by size
              }
              p = next
          }
        }
      }
      val fs = frames.result()
      if (fs.isEmpty || width <= 0 || height <= 0) None
      else Some(MjpegStream(width, height,
        if (usPerFrame > 0) usPerFrame else 1000000L / 25, fs))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Slice frame `idx`'s JPEG bytes out of the payload. */
  def frameBytes(bytes: Array[Byte], s: MjpegStream, idx: Int): Array[Byte] = {
    val (off, len) = s.frames(idx)
    java.util.Arrays.copyOfRange(bytes, off, off + len)
  }

  /** Encode a BufferedImage as baseline JPEG (ImageIO's built-in writer). */
  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    // JPEG writer requires an opaque color model
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = c.createGraphics(); try g.drawImage(img, 0, 0, null) finally g.dispose()
        c
      }
    javax.imageio.ImageIO.write(rgb, "jpg", baos)
    baos.toByteArray
  }

  /** Deterministic fixture video: `nFrames` seeded gradient frames (the
    * same per-pixel mix as [[ImageCodec.synthPng]], shifted per frame so
    * consecutive frames differ), JPEG-encoded and muxed at `fps`.
    */
  def synthMjpegAvi(seed: Long, w: Int, h: Int, nFrames: Int, fps: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var z = seed + f * 0x632be59bd9b4e019L +
            x * 0x9e3775cb97f4a7c5L + y * 0xc2b2ae3d27d4eb4fL
          z = (z ^ (z >>> 31)) * 0x7fb5d329728ea185L
          z ^= z >>> 29
          img.setRGB(x, y, (z & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      encodeJpeg(img)
    }
    muxMjpegAvi(frames, w, h, fps)
  }
}
