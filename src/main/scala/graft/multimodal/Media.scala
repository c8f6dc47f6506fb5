package graft.multimodal

import java.sql.Timestamp

/** Multimodal column model: media payloads are opaque `binary` columns with
  * typed, prunable metadata — never parsed structs of pixels. At 100 TB the
  * payload column stays untouched (Parquet column pruning skips it) unless
  * an operator explicitly decodes, and decode runs batched per partition.
  *
  * The reference has no media surface (its payload is already opaque bytes,
  * /root/reference/msg.go:18); this module is part of the mandated
  * LLM-pipeline extension.
  */
final case class MediaItem(
    media_id: Long,
    media_type: String, // "image/png", "audio/wav", "video/mp4", ...
    content: Array[Byte], // opaque payload; decode is an explicit op
    width: Int, // -1 = unknown
    height: Int,
    duration_ms: Long, // -1 = unknown
    captured_at: Timestamp)

/** Decoded-image record produced by ImageOps.decode. `decoded_ok` = the
  * pixel stats come from a REAL codec decode; false marks the degraded
  * fallback (fabricated dims/luma from corrupt or non-decodable bytes), so
  * downstream size filters and luma-based quality gates can exclude
  * fabricated stats instead of silently blending them with genuine ones.
  */
final case class DecodedImage(
    media_id: Long,
    width: Int,
    height: Int,
    n_pixels: Long,
    mean_luma: Double,
    decoded_ok: Boolean)

/** Per-media feature vector (fixed dim), ready for the similarity ops. */
final case class MediaFeatures(
    media_id: Long,
    features: Array[Float])

/** Perceptual 64-bit image hash (dHash over decoded luminance).
  * `decoded_ok` = the hash comes from real decoded pixels; false marks the
  * degraded content-bytes fallback for non-decodable payloads, which must
  * never cluster with genuine pixel hashes.
  */
final case class ImageHash(
    media_id: Long,
    phash: Long,
    decoded_ok: Boolean)

/** Perceptual 64-bit audio fingerprint (AudioCodec.audioHash64 over
  * decoded PCM). Same fallback contract as [[ImageHash]].
  */
final case class AudioHash(
    media_id: Long,
    ahash: Long,
    decoded_ok: Boolean)

/** Perceptual 64-bit video fingerprint (order-sensitive mix of sampled
  * frames' dHashes). Same fallback contract as [[ImageHash]].
  */
final case class VideoHash(
    media_id: Long,
    vhash: Long,
    decoded_ok: Boolean)

/** One sampled frame of a video payload. `frame_idx` is the SAMPLE index
  * (0..n-1 of the requested uniform timestamps); `frame_ms` is the actual
  * timestamp of the decoded frame. `decoded_ok` = the bytes are a real
  * demuxed frame (a JPEG, for MJPEG streams); false marks the degraded
  * byte-slice fallback for payloads no demuxer recognizes.
  */
final case class Frame(
    media_id: Long,
    frame_idx: Int,
    frame_ms: Long,
    frame_bytes: Array[Byte],
    decoded_ok: Boolean)

/** One fixed-duration chunk of an audio payload with its signal stats. */
final case class AudioChunk(
    media_id: Long,
    chunk_idx: Int,
    start_ms: Long,
    end_ms: Long,
    n_samples: Int,
    rms: Double)
