package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed partition-local with Dataset mapPartitions (the Scala
  * analogue of `mapInPandas` batch UDFs).
  *
  * The actual image/audio decode is STUBBED (`decodeBytes` — the container
  * ships no media libs): it derives deterministic fake dimensions from the
  * byte stream. Everything around it — binary column handling, encoder
  * schema, partition-local batch iteration, no shuffle — is the real
  * production shape: at 100 TB this runs as a pure scan-side map with
  * per-partition batching, which is exactly how a decoder pool would sit.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, content_hash: String,
                       width: Int, height: Int, n_frames: Int)

  /** STUB decoder: replace with a real codec behind the same signature.
    * Deterministic from bytes so tests and oracles can pin it.
    */
  def decodeBytes(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length.toLong
    val width = (1 + n % 1024).toInt
    val height = (1 + (n * 7) % 768).toInt
    val frames = (1 + n % 16).toInt
    (width, height, frames)
  }

  private def md5Hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(b)
    d.map("%02x".format(_)).mkString
  }

  /** Attach decoded metadata to a binary payload column, partition-local. */
  def decodeMeta(spark: SparkSession, df: DataFrame,
                 idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, f) = decodeBytes(r.payload)
          MediaMeta(r.doc_id, r.payload.length.toLong, md5Hex(r.payload),
            w, h, f)
        }
      }
  }
}
