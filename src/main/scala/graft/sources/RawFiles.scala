package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.Charset
import java.nio.file.{Files, Paths}
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Driver-side raw feed plumbing shared by the schema-first readers.
  *
  * The reference's feed files are small (a day's rates, a month's trades);
  * acquisition and unzip happen at the driver — the reference does the same
  * (in-process bytes, /root/reference/pyield/anbima/taxas.py:141-146) — and
  * parsing then runs distributed via Spark's CSV/JSON readers over a
  * Dataset[String]. For genuinely large feeds the same readers accept paths
  * and scale out (binaryFile/mapPartitions would replace the driver unzip).
  */
object RawFiles {

  def readBytes(path: String): Array[Byte] =
    Files.readAllBytes(Paths.get(path))

  def isZip(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      (bytes(2) == 3 || bytes(2) == 5 || bytes(2) == 7)

  /** First entry of a ZIP archive. */
  def unzipFirst(bytes: Array[Byte]): Array[Byte] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      val entry = zin.getNextEntry
      require(entry != null, "empty ZIP")
      zin.readAllBytes()
    } finally zin.close()
  }

  /** All entries of a ZIP archive as (name, bytes). */
  def unzipAll(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) out += entry.getName -> zin.readAllBytes()
        entry = zin.getNextEntry
      }
      out.toSeq
    } finally zin.close()
  }

  /** Unwrap (possibly nested once) zip and decode to text. */
  def decodeMaybeZip(bytes: Array[Byte], charset: String): String = {
    val raw = if (isZip(bytes)) unzipFirst(bytes) else bytes
    new String(raw, Charset.forName(charset))
  }

  /** Distributed CSV parse of in-memory text: drop `skipLines` physical
    * lines, then hand the remainder (header first) to Spark's CSV reader.
    */
  def csvFromText(spark: SparkSession, text: String, sep: String,
                  skipLines: Int, nullValue: String): DataFrame = {
    import spark.implicits._
    val lines = text.split("\r?\n").iterator.drop(skipLines)
      .filter(_.nonEmpty).toSeq
    val ds: Dataset[String] = spark.createDataset(lines)
    spark.read
      .option("sep", sep)
      .option("header", "true")
      .option("nullValue", nullValue)
      .option("mode", "PERMISSIVE")
      .csv(ds)
  }
}
