package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. Payloads in a REAL
  * public format ([[Codecs]]: PPM P6, uncompressed 24-bit BMP) are
  * genuinely decoded — width/height come from the parsed header, and
  * `codec` names the format. Anything else falls back to the
  * documented metadata STUB (`DecodeStub` derives deterministic fake
  * dimensions from the payload digest; `codec` = "stub") — no
  * compressed-format codec ships in this container, and the fallback
  * keeps the pipeline total (C12) instead of failing on alien bytes.
  * The Spark-side plumbing — binary column, schema, partition-batched
  * decode boundary, row shape — is identical on both paths; swapping
  * in a JNI/FFM codec for JPEG/audio extends only `Codecs.decode`'s
  * dispatch, never the plan shape.
  */
final case class MediaMeta(
    doc_id: Long,
    codec: String,
    byte_len: Int,
    digest: String,
    width: Int,
    height: Int,
    n_frames: Int,
    frame_offsets: Seq[Int])

/** decoded-audio statistics: amplitude sums / extremes / sign
  * crossings over genuinely decoded PCM16 samples — the audio twin of
  * [[ImageStats]]; `zero_crossings` is counted over the interleaved
  * stream (a deterministic decode witness, not a per-channel DSP
  * feature — the oracle replays the same definition)
  */
final case class AudioStats(
    doc_id: Long,
    codec: String,
    sample_rate: Int,
    channels: Int,
    n_samples: Int,
    duration_ms: Int,
    sum_abs: Long,
    max_abs: Int,
    zero_crossings: Int)

/** decoded-image statistics: per-channel pixel sums over genuinely
  * decoded RGB data — values a header-only (or fake) decoder cannot
  * produce, which is what the oracle gate checks
  */
final case class ImageStats(
    doc_id: Long,
    codec: String,
    width: Int,
    height: Int,
    n_pixels: Int,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long)

object DecodeStub {

  /** ??? in spirit — a deterministic stand-in for the real codec:
    * "dimensions" are read from the digest bytes, "frames" are sampled
    * every 100 payload bytes (capped at 5), mimicking a fixed-stride
    * video frame sampler.
    */
  def decode(payload: Array[Byte]): (Int, Int, Int, Seq[Int]) = {
    val digest = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    val width = 1 + ((digest(0) & 0xff) << 2)
    val height = 1 + ((digest(1) & 0xff) << 2)
    val nFrames = payload.length / 100 + 1
    val offsets = (0 until math.min(nFrames, 5)).map(_ * 100)
    (width, height, nFrames, offsets)
  }
}

object Multimodal {

  /** frame sampling + per-frame feature extraction, Column-composed:
    * the payload is windowed at a fixed stride (the frame sampler) and
    * each frame maps to a deterministic "feature" — here the sha256 of
    * the window, standing in for a real descriptor exactly like
    * DecodeStub stands in for a codec. Schema and batch shape are the
    * real thing: (doc_id, frame_idx, frame_offset, frame_digest), one
    * row per sampled frame, computed in whole-stage codegen with no
    * shuffle. Windows are character-based so the DuckDB oracle can
    * reproduce them (DuckDB lacks BLOB substring); a byte-based codec
    * would swap `substring` for its binary twin with the same plan.
    */
  val FrameStride = 100
  val MaxFrames = 5

  def frameFeatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val nFrames = least(
      floor(length(col(textCol)) / FrameStride).cast("int") + 1,
      lit(MaxFrames))
    docs.select(col(idCol), col(textCol),
        explode(sequence(lit(0), nFrames - 1)).as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        (col("frame_idx") * FrameStride).as("frame_offset"),
        sha2(col(textCol).substr(col("frame_idx") * FrameStride + 1,
          lit(FrameStride)), 256).as("frame_digest"))
  }

  /** docs(doc_id, text) → MediaMeta, treating the UTF-8 bytes of
    * `text` as the opaque payload. The decode runs per-partition
    * (mapPartitions) — the batch boundary a real codec needs (library
    * init once per partition, vectorized hand-off), mirroring the
    * `mapInPandas` shape on the Python edge.
    */
  def decodeMeta(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val digest = java.security.MessageDigest.getInstance("SHA-256")
            .digest(bytes).map("%02x".format(_)).mkString
          Codecs.decode(bytes) match {
            case Some(img) =>
              // a real still image: one frame, pixel data as frame 0
              MediaMeta(id, img.codec, bytes.length, digest,
                img.width, img.height, 1, Seq(0))
            case None =>
              val (w, h, n, offs) = DecodeStub.decode(bytes)
              MediaMeta(id, "stub", bytes.length, digest, w, h, n, offs)
          }
        }
      }
  }

  /** Synthetic-but-REAL encoded fixture images: one valid PPM/BMP per
    * doc, dimensions and pixel bytes a closed-form function of doc_id
    * (pixel i of the RGB buffer = (doc_id + i) mod 256, w = 4 +
    * id mod 5, h = 3 + id mod 3 — widths include non-multiples of 4
    * so BMP row padding is actually exercised). Both engines can
    * derive the EXPECTED decoded statistics from the formula, while
    * only a real decoder can recover them from the encoded bytes — that
    * asymmetry is what makes the oracle a genuine codec gate.
    */
  def syntheticImages(docs: DataFrame, fmt: String,
      idCol: String = "doc_id"): DataFrame = {
    require(fmt == "ppm" || fmt == "bmp", s"unknown fixture format $fmt")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (4 + id % 5).toInt
      val h = (3 + id % 3).toInt
      val rgb = Array.tabulate(w * h * 3)(i => ((id + i) % 256).toByte)
      val payload =
        if (fmt == "ppm") Codecs.encodePpm(w, h, rgb)
        else Codecs.encodeBmp(w, h, rgb)
      (id, payload)
    }.toDF(idCol, "payload")
  }

  /** decode + per-channel statistics over a binary payload column —
    * the real-decoder twin of [[decodeMeta]]: the mapPartitions batch
    * boundary is the same, but width/height/sums exist only if the
    * actual pixel array was parsed out of the actual header. Rows
    * whose payload doesn't decode surface as codec='unknown' with
    * zeroed stats (per-row error capture, never a task failure).
    */
  def decodeImage(images: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[ImageStats] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          Codecs.decode(payload) match {
            case Some(img) =>
              var (sr, sg, sb) = (0L, 0L, 0L)
              var i = 0
              while (i < img.pixels.length) {
                sr += img.pixels(i) & 0xff
                sg += img.pixels(i + 1) & 0xff
                sb += img.pixels(i + 2) & 0xff
                i += 3
              }
              ImageStats(id, img.codec, img.width, img.height,
                img.width * img.height, sr, sg, sb)
            case None => ImageStats(id, "unknown", 0, 0, 0, 0L, 0L, 0L)
          }
        }
      }
  }

  /** Synthetic-but-REAL encoded fixture audio: one valid RIFF/WAVE
    * PCM16 clip per doc — sample rate 8000 Hz, channels = 1 + id mod 2
    * (stereo rows exercise interleaved frames), 50 + id mod 37 frames,
    * interleaved sample i = ((id·31 + i·17) mod 4001) − 2000. The
    * encoder inserts an odd-sized LIST chunk before `data`
    * ([[Codecs.encodeWav]]), so decoding REQUIRES chunk-walking with
    * the even-offset pad rule — same asymmetry as the image fixtures:
    * both engines derive the expected stats from the formula, but only
    * a real container parser recovers them from the bytes.
    */
  def syntheticAudio(docs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val channels = (1 + id % 2).toInt
      val n = (50 + id % 37).toInt * channels
      val samples = Array.tabulate(n)(i =>
        ((id * 31 + i.toLong * 17) % 4001 - 2000).toShort)
      (id, Codecs.encodeWav(8000, channels, samples))
    }.toDF(idCol, "payload")
  }

  /** decode + amplitude statistics over a binary WAV payload column —
    * the audio twin of [[decodeImage]]: same mapPartitions batch
    * boundary, stats exist only if the PCM frames were genuinely
    * parsed out of the RIFF chunk list. Undecodable rows surface as
    * codec='unknown' with zeroed stats (C12), never a task failure.
    */
  def decodeAudio(clips: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[AudioStats] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          Codecs.decodeAudio(payload) match {
            case Some(a) =>
              var sumAbs = 0L; var maxAbs = 0; var zc = 0
              var i = 0
              while (i < a.samples.length) {
                val v = math.abs(a.samples(i).toInt)
                sumAbs += v
                if (v > maxAbs) maxAbs = v
                if (i > 0 &&
                  (a.samples(i) < 0) != (a.samples(i - 1) < 0)) zc += 1
                i += 1
              }
              val frames = a.samples.length / a.channels
              AudioStats(id, a.codec, a.sampleRate, a.channels,
                a.samples.length, (frames * 1000L / a.sampleRate).toInt,
                sumAbs, maxAbs, zc)
            case None =>
              AudioStats(id, "unknown", 0, 0, 0, 0, 0L, 0, 0)
          }
        }
      }
  }
}
