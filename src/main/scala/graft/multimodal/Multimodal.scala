package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed partition-local with Dataset mapPartitions (the Scala
  * analogue of `mapInPandas` batch UDFs).
  *
  * Real-codec formats (JPEG/WAV/MP4) are not decodable here — the
  * container ships no media libs — so the engine defines GRAW, a
  * minimal raw gray8 container it REALLY parses (magic + BE header +
  * pixel planes), with real kernels downstream (nearest-neighbor
  * resize, frame select, pixel stats: [[thumbnailPipeline]], oracle
  * q107). Arbitrary non-GRAW blobs keep the legacy deterministic
  * metadata derivation (`decodeBytes` fallback — q42's pinnable
  * contract). Either way the shape is the production one: a pure
  * scan-side map with per-partition batching, no shuffle — exactly how
  * a decoder pool sits at 100 TB.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, content_hash: String,
                       width: Int, height: Int, n_frames: Int)

  /** Decoder: GRAW payloads (see [[encodeGraw]]) are REALLY parsed —
    * magic check + big-endian header fields; anything else falls back
    * to the legacy deterministic derivation from the byte length (the
    * container ships no codecs for real formats, so arbitrary blobs
    * keep a pinnable stand-in — q42's contract).
    */
  def decodeBytes(payload: Array[Byte]): (Int, Int, Int) =
    parseGraw(payload).getOrElse {
      val n = payload.length.toLong
      val width = (1 + n % 1024).toInt
      val height = (1 + (n * 7) % 768).toInt
      val frames = (1 + n % 16).toInt
      (width, height, frames)
    }

  // --------------------------------------------------------------------
  // GRAW: the minimal REAL container this engine can decode without
  // external codecs — 'G' 'R', width (u16 BE), height (u16 BE), frame
  // count (u8), then width*height*frames gray8 pixels, frame-major.
  // Everything downstream of the parser (resize, frame select, pixel
  // stats) is a real kernel over real pixel bytes.
  // --------------------------------------------------------------------

  val GrawHeader = 7

  /** Deterministic GRAW synthesis from a byte source (the testdata has
    * no media column, so payloads derive from the document's utf-8
    * bytes): dims from the byte count, pixels the source bytes cycled.
    * Mirrored arithmetic in the q107 oracle.
    */
  def encodeGraw(src: Array[Byte]): Array[Byte] = {
    val n = src.length
    require(n > 0, "cannot synthesize GRAW from an empty source")
    val w = 8 + n % 57
    val h = 8 + (n * 3) % 41
    val f = 1 + n % 4
    val pixels = w * h * f
    val out = new Array[Byte](GrawHeader + pixels)
    out(0) = 'G'.toByte; out(1) = 'R'.toByte
    out(2) = (w >> 8).toByte; out(3) = w.toByte
    out(4) = (h >> 8).toByte; out(5) = h.toByte
    out(6) = f.toByte
    var p = 0
    while (p < pixels) { out(GrawHeader + p) = src(p % n); p += 1 }
    out
  }

  /** (width, height, frames) when the payload is well-formed GRAW. */
  def parseGraw(payload: Array[Byte]): Option[(Int, Int, Int)] =
    if (payload.length >= GrawHeader &&
        payload(0) == 'G'.toByte && payload(1) == 'R'.toByte) {
      val w = ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
      val h = ((payload(4) & 0xff) << 8) | (payload(5) & 0xff)
      val f = payload(6) & 0xff
      if (w > 0 && h > 0 && f > 0 &&
          payload.length == GrawHeader + w * h * f) Some((w, h, f))
      else None
    } else None

  /** Nearest-neighbor resize of one gray8 frame — the real thumbnail
    * kernel: source pixel (x*w/tw, y*h/th) for each target cell.
    */
  def nearestResize(frame: Array[Byte], w: Int, h: Int,
                    tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        out(y * tw + x) = frame(sy * w + x * w / tw)
        x += 1
      }
      y += 1
    }
    out
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

  case class Thumb(doc_id: Long, width: Int, height: Int, n_frames: Int,
                   byte_len: Long, mean_luma: Double)

  /** Full decode → thumbnail pipeline over a text-derived GRAW payload,
    * partition-local end to end: synthesize the container from the
    * document's utf-8 bytes, REALLY parse its header back, nearest-
    * resize frame 0 to `tw`×`th`, and report the thumbnail's mean
    * luma (6-dp — an exact integer sum over tw*th pixels divided once,
    * so engines agree bit-for-bit). The per-row work is the production
    * decoder-pool shape: a pure scan-side map, no shuffle, batch
    * iteration inside the partition.
    */
  def thumbnailPipeline(spark: SparkSession, df: DataFrame, idCol: String,
                        textCol: String, tw: Int = 8,
                        th: Int = 8): Dataset[Thumb] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        to_binary(col(textCol), lit("utf-8")).as("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val graw = encodeGraw(r.payload)
          val (w, h, f) = parseGraw(graw).getOrElse(
            throw new IllegalStateException(
              s"GRAW round-trip failed for doc ${r.doc_id}"))
          val frame0 = java.util.Arrays.copyOfRange(
            graw, GrawHeader, GrawHeader + w * h)
          val thumb = nearestResize(frame0, w, h, tw, th)
          val sum = thumb.foldLeft(0L)((a, b) => a + (b & 0xff))
          Thumb(r.doc_id, w, h, f, graw.length.toLong,
            BigDecimal(sum.toDouble / (tw * th))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
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
