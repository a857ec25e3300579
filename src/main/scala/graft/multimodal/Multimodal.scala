package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. The decode itself is a
  * STUB (no image/audio codecs ship in this container): `DecodeStub`
  * derives deterministic fake dimensions from the payload bytes. The
  * Spark-side plumbing — binary column, schema, partition-batched
  * decode boundary, row shape — is real and tested; swapping
  * `DecodeStub.decode` for a JNI/FFM codec (or moving the stage to
  * `mapInPandas` on a PySpark edge) changes no plan shape.
  */
final case class MediaMeta(
    doc_id: Long,
    byte_len: Int,
    digest: String,
    width: Int,
    height: Int,
    n_frames: Int,
    frame_offsets: Seq[Int])

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
          val (w, h, n, offs) = DecodeStub.decode(bytes)
          MediaMeta(id, bytes.length, digest, w, h, n, offs)
        }
      }
  }
}
