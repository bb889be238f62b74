package graft.sources

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** B3 Price Report XML reader (S3 in SURVEY §2.1) — the nested
  * ZIP→ZIP→XML settlement/trading bulletin.
  *
  * Semantics mirror /root/reference/pyield/b3/boletim.py:110-504:
  *   - outer ZIP holds an inner ZIP (or directly the XML); the LAST xml
  *     entry (sorted by name) is the current one;
  *   - each `PricRpt` element becomes one row: every descendant element
  *     whose local name is one of the 38 schema tags contributes its text
  *     (last occurrence wins); `TradDt` comes from a `Dt` element whose
  *     parent is `TradDt`; rows without ticker+date are dropped;
  *   - all values parse as strings then cast non-strict (null on failure);
  *     output sorted by `TckrSymb`.
  *
  * Scale shape: one day's PR is ~2 MB, so a single file parses at the
  * driver; [[lerMany]] distributes WHOLE FILES across executors with
  * mapPartitions — the natural layout for a year of bulletins (files are
  * the parallelism unit; no intra-file split needed).
  */
object B3Boletim {

  /** (pdf id, xml tag, spark type) — boletim.py:57-100. */
  val Colunas: Seq[(String, DataType)] = Seq(
    "TradDt" -> DateType, "TckrSymb" -> StringType, "Id" -> StringType,
    "Prtry" -> StringType, "MktIdrCd" -> StringType,
    "DaysToSttlm" -> LongType, "TradQty" -> LongType,
    "MktDataStrmId" -> StringType, "NtlFinVol" -> DoubleType,
    "IntlFinVol" -> DoubleType, "OpnIntrst" -> LongType,
    "FinInstrmQty" -> LongType, "BestBidPric" -> DoubleType,
    "BestAskPric" -> DoubleType, "FrstPric" -> DoubleType,
    "MinPric" -> DoubleType, "MaxPric" -> DoubleType,
    "TradAvrgPric" -> DoubleType, "LastPric" -> DoubleType,
    "RglrTxsQty" -> LongType, "NonRglrTxsQty" -> LongType,
    "RglrTraddCtrcts" -> LongType, "NonRglrTraddCtrcts" -> LongType,
    "NtlRglrVol" -> DoubleType, "NtlNonRglrVol" -> DoubleType,
    "IntlRglrVol" -> DoubleType, "IntlNonRglrVol" -> DoubleType,
    "AdjstdQt" -> DoubleType, "AdjstdQtTax" -> DoubleType,
    "AdjstdQtStin" -> StringType, "PrvsAdjstdQt" -> DoubleType,
    "PrvsAdjstdQtTax" -> DoubleType, "PrvsAdjstdQtStin" -> StringType,
    "OscnPctg" -> DoubleType, "VartnPts" -> DoubleType,
    "EqvtVal" -> DoubleType, "AdjstdValCtrct" -> DoubleType,
    "MaxTradLmt" -> DoubleType, "MinTradLmt" -> DoubleType)

  private val tagSet: Set[String] = Colunas.map(_._1).toSet
  private val tagOrder: Seq[String] = Colunas.map(_._1)

  val rawSchema: StructType =
    StructType(tagOrder.map(t => StructField(t, StringType, nullable = true)))

  val schema: StructType =
    StructType(Colunas.map { case (n, t) => StructField(n, t, nullable = true) })

  /** Unwrap to XML bytes: nested zip(s) → last .xml entry; raw XML passes
    * through.
    */
  def extrairXml(bytes: Array[Byte]): Array[Byte] = {
    if (!RawFiles.isZip(bytes)) return bytes
    val entries = RawFiles.unzipAll(bytes)
    require(entries.nonEmpty, "ZIP externo está vazio")
    val inner = entries.head._2
    if (RawFiles.isZip(inner)) {
      val xmls = RawFiles.unzipAll(inner)
        .filter(_._1.endsWith(".xml")).sortBy(_._1)
      require(xmls.nonEmpty, "Nenhum XML encontrado no ZIP interno")
      xmls.last._2
    } else {
      // single-level zip whose entries are the XMLs themselves
      val xmls = entries.filter(_._1.endsWith(".xml")).sortBy(_._1)
      require(xmls.nonEmpty, "Nenhum XML encontrado no ZIP")
      xmls.last._2
    }
  }

  /** Streaming StAX parse of one XML document into raw string records. */
  def parseRecords(xmlBytes: Array[Byte]): Seq[Array[String]] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_COALESCING, true)
    val reader = factory.createXMLStreamReader(new ByteArrayInputStream(xmlBytes))

    val out = scala.collection.mutable.ArrayBuffer[Array[String]]()
    val stack = scala.collection.mutable.ArrayBuffer[String]()
    var inPricRpt = 0
    var current: scala.collection.mutable.HashMap[String, String] = null
    val text = new StringBuilder

    def flushText(): Unit = {
      if (inPricRpt > 0 && current != null && text.nonEmpty && stack.nonEmpty) {
        val tag = stack.last
        val value = text.toString
        if (value.trim.nonEmpty) {
          if (tag == "Dt" && stack.length >= 2 &&
              stack(stack.length - 2) == "TradDt") {
            current("TradDt") = value
          } else if (tag == "TckrSymb") {
            current("TckrSymb") = value
          } else if (tag != "TradDt" && tagSet.contains(tag)) {
            current(tag) = value
          }
        }
      }
      text.clear()
    }

    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            flushText()
            val local = reader.getLocalName
            stack += local
            if (local == "PricRpt") {
              inPricRpt += 1
              current = scala.collection.mutable.HashMap.empty
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            text.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            flushText()
            val local = reader.getLocalName
            if (stack.nonEmpty) stack.remove(stack.length - 1)
            if (local == "PricRpt" && inPricRpt > 0) {
              inPricRpt -= 1
              if (current != null && current.contains("TckrSymb") &&
                  current.contains("TradDt")) {
                out += tagOrder.map(t => current.getOrElse(t, null)).toArray
              }
              current = null
            }
          case _ =>
        }
      }
    } finally reader.close()
    out.toSeq
  }

  private def tipar(raw: DataFrame): DataFrame =
    raw.select(Colunas.map {
      case ("TradDt", _) => to_date(col("TradDt"), "yyyy-MM-dd").as("TradDt")
      case (n, t)        => col(n).cast(t).as(n)
    }: _*).orderBy(col("TckrSymb"))

  /** One local file (zip or xml) → typed 38-column frame. */
  def ler(spark: SparkSession, path: String,
          prefixoTicker: Seq[String] = Seq.empty,
          comprimentoTicker: Option[Int] = None): DataFrame = {
    val xml = extrairXml(RawFiles.readBytes(path))
    val rows = parseRecords(xml).map(a => Row.fromSeq(a.toSeq))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), rawSchema)
    filtrar(tipar(raw), prefixoTicker, comprimentoTicker)
  }

  /** Many files in parallel: one task per file (mapPartitions over paths). */
  def lerMany(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val rows = spark.createDataset(paths)
      // max(1, ...) — repartition(0) throws on an empty path list, which
      // should simply yield an empty typed frame
      .repartition(math.max(1,
        math.min(paths.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        it.flatMap { p =>
          parseRecords(extrairXml(RawFiles.readBytes(p)))
            .map(a => Row.fromSeq(a.toSeq))
        }
      }(org.apache.spark.sql.Encoders.row(rawSchema))
    tipar(rows.toDF())
  }

  def filtrar(df: DataFrame, prefixos: Seq[String],
              comprimento: Option[Int]): DataFrame = {
    val comLen = comprimento match {
      case Some(n) => df.filter(length(col("TckrSymb")) === n)
      case None    => df
    }
    val comPrefixo =
      if (prefixos.isEmpty) comLen
      else comLen.filter(
        prefixos.map(p => col("TckrSymb").startsWith(p)).reduce(_ || _))
    comPrefixo.orderBy(col("TckrSymb"))
  }
}
