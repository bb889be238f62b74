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

  /** Scan-local byte-level feature extraction over a binary payload — the
    * feature-extract step of a multimodal pipeline (histogram + entropy
    * are the decode-free signals used for corruption/format screening).
    * Pure Column expressions (hex + higher-order functions): no UDF, no
    * shuffle, engine-portable (the DuckDB oracle reproduces it exactly).
    *
    * Appends: n_bytes, h0..h15 (high-nibble histogram — 16 coarse bins
    * over the byte distribution) and byte_entropy (Shannon entropy over
    * those bins in bits, rounded 6 for cross-engine log parity).
    */
  def withByteFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val prepared = df
      .withColumn("n_bytes", octet_length(col(payloadCol)).cast("long"))
      .withColumn("_hist",
        column(ByteHistogram16(expression(col(payloadCol)))))
    val withBins = (0 until 16).foldLeft(prepared) { (acc, v) =>
      acc.withColumn(s"h$v", element_at(col("_hist"), v + 1))
    }
    val entropyTerms: Seq[Column] = (0 until 16).map { v =>
      val p = col(s"h$v").cast("double") / col("n_bytes").cast("double")
      when(col(s"h$v") > 0, -p * log(2.0, p)).otherwise(lit(0.0))
    }
    withBins
      .withColumn("byte_entropy",
        when(col("n_bytes") === 0, lit(0.0))
          .otherwise(round(entropyTerms.reduce(_ + _), 6)))
      .drop("_hist")
  }

  /** Composed hex + higher-order-function form of [[withByteFeatures]]
    * (16 filter passes over the nibble array; kept as the semantic
    * cross-check of the native expression).
    */
  def withByteFeaturesHof(df: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.Column
    val hx = lower(hex(col(payloadCol)))
    val n = (length(hx) / 2).cast("long")
    val hexChars = "0123456789abcdef"
    val prepared = df
      .withColumn("n_bytes", n)
      // high nibble of byte i = hex char at 1-based position 2i-1
      .withColumn("_nibbles", transform(sequence(lit(1L), greatest(n, lit(1L))),
        i => substring(hx, (i * 2 - 1).cast("int"), lit(1))))
    val withBins = (0 until 16).foldLeft(prepared) { (acc, v) =>
      acc.withColumn(s"h$v",
        when(col("n_bytes") === 0, lit(0L)).otherwise(
          size(filter(col("_nibbles"), c => c === lit(hexChars(v).toString)))
            .cast("long")))
    }
    val entropyTerms: Seq[Column] = (0 until 16).map { v =>
      val p = col(s"h$v").cast("double") / col("n_bytes").cast("double")
      when(col(s"h$v") > 0, -p * log(2.0, p)).otherwise(lit(0.0))
    }
    withBins
      .withColumn("byte_entropy",
        when(col("n_bytes") === 0, lit(0.0))
          .otherwise(round(entropyTerms.reduce(_ + _), 6)))
      .drop("_nibbles")
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
