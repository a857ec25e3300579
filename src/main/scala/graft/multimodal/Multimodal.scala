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
