package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.functions._

/** ANBIMA IMA-Q market-stock HTML reader (S16 in SURVEY §2.1; reference
  * /root/reference/pyield/anbima/imaq.py:26-171). The page embeds the data
  * as nested `<table width="100%">` elements inside a td; headers come from
  * thead th cells, rows from tbody tr/td. A hand-rolled tolerant scanner
  * replaces lxml: strip `<br>`, walk the nested tables, take rows whose
  * cell count matches the header.
  */
object ImaQ {

  private val TagRe = "(?s)<[^>]*>".r

  private def textContent(html: String): String =
    TagRe.replaceAllIn(html, " ")
      .replace("&nbsp;", " ").replace("&amp;", "&")
      .trim.replaceAll("\\s+", " ")

  private def extractAll(html: String, tag: String): Seq[String] = {
    val re = s"(?si)<$tag\\b[^>]*>(.*?)</$tag>".r
    re.findAllMatchIn(html).map(_.group(1)).toSeq
  }

  /** Parse the nested data tables into a raw all-string frame. */
  def parsearTabelas(spark: SparkSession, htmlBytes: Array[Byte]): DataFrame = {
    val html = new String(htmlBytes, "ISO-8859-1")
      .replace("<br>", " ").replace("<BR>", " ").replace("<br/>", " ")

    // The page's markup is malformed (unclosed tbody, nested tables), so a
    // structural walk is unreliable without a recovering parser. The data
    // shape is stable instead: the FIRST thead carries the 10 column
    // headers, and data rows are exactly the tr blocks whose td-cell count
    // matches the header. Everything else (nav/layout rows) has a
    // different cell count and is dropped — the golden fixture pins this.
    val header: Seq[String] = extractAll(html, "thead").headOption
      .map(th => extractAll(th, "th").map(textContent))
      .getOrElse(Seq.empty)

    val rows = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    if (header.nonEmpty) {
      extractAll(html, "tr").foreach { tr =>
        val cells = extractAll(tr, "td").map(textContent)
        if (cells.nonEmpty && cells.length == header.length &&
            !cells.forall(_.isEmpty))
          rows += cells.map(c => if (c == "--" || c.isEmpty) null else c)
      }
    }
    require(header.nonEmpty, "nenhuma tabela de dados IMA-Q encontrada")
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq.map(Row.fromSeq)), schema)
  }

  /** Raw string frame → canonical 10-column stock frame
    * (imaq.py:105-125): trim, drop repeated header rows, dedup by ISIN,
    * BR-number conversions (thousands columns scaled by inteiro_m).
    */
  def processar(df: DataFrame, dataReferencia: java.sql.Date): DataFrame = {
    def c(n: String) = col(s"`$n`")
    df.select(df.columns.map(n => trim(col(s"`$n`")).as(n)): _*)
      .filter(c("Data de Vencimento").isNotNull && c("Título") =!= "Título")
      .dropDuplicates("Código ISIN")
      .select(
        lit(dataReferencia).as("data_referencia"),
        c("Título").as("titulo"),
        to_date(c("Data de Vencimento"), "dd/MM/yyyy").as("data_vencimento"),
        c("Codigo Selic").try_cast("long").as("codigo_selic"),
        c("Código ISIN").as("isin"),
        float_br(c("PU (R$)")).as("pu"),
        inteiro_m(c("Quantidade em Mercado (1.000 Títulos)"))
          .as("quantidade_mercado"),
        inteiro_m(c("Valor de Mercado (R$ Mil)")).as("valor_mercado"),
        inteiro_m(c("Variação da Quantidade (1.000 Títulos)"))
          .as("variacao_quantidade"),
        c("Status do Titulo").as("status_titulo"))
      .orderBy(col("titulo"), col("data_vencimento"))
  }

  def estoque(spark: SparkSession, path: String,
              dataReferencia: java.sql.Date): DataFrame =
    processar(parsearTabelas(spark,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))),
      dataReferencia)
}
