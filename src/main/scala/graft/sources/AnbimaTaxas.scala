package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{float_br, taxa_br}

/** ANBIMA TPF indicative-rates file reader (S2 in SURVEY §2.1).
  *
  * Format (reference /root/reference/pyield/anbima/taxas.py:98-166):
  * `@`-separated latin1 CSV, two banner lines before the header, `--` as
  * null; pre-2014 files are ZIP-wrapped `.exe` archives. Rates arrive as
  * Brazilian percent strings and become decimal rates rounded at 10 places;
  * `PU`/`desvio_padrao` are BR-formatted floats.
  */
object AnbimaTaxas {

  /** Canonical 15-column frame from a local file (txt or zip-wrapped). */
  def ler(spark: SparkSession, path: String): DataFrame =
    lerBytes(spark, RawFiles.readBytes(path))

  def lerBytes(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val text = RawFiles.decodeMaybeZip(bytes, "ISO-8859-1")
    val raw = RawFiles.csvFromText(spark, text, "@", skipLines = 2,
      nullValue = "--")
    processar(raw)
  }

  /** Rename, type-convert and order columns
    * (mirrors `_processar_df`, taxas.py:149-166).
    */
  private def c(name: String) = col(s"`$name`")

  def processar(df: DataFrame): DataFrame =
    df.select(
      col("Titulo").as("titulo"),
      to_date(col("Data Referencia"), "yyyyMMdd").as("data_referencia"),
      col("Codigo SELIC").cast("long").as("codigo_selic"),
      to_date(col("Data Base/Emissao"), "yyyyMMdd").as("data_base"),
      to_date(col("Data Vencimento"), "yyyyMMdd").as("data_vencimento"),
      taxa_br(c("Tx. Compra")).as("taxa_compra"),
      taxa_br(c("Tx. Venda")).as("taxa_venda"),
      taxa_br(c("Tx. Indicativas")).as("taxa_indicativa"),
      float_br(col("PU")).as("pu"),
      float_br(col("Desvio padrao")).as("desvio_padrao"),
      taxa_br(c("Interv. Ind. Inf. (D0)")).as("taxa_intervalo_inf_d0"),
      taxa_br(c("Interv. Ind. Sup. (D0)")).as("taxa_intervalo_sup_d0"),
      taxa_br(c("Interv. Ind. Inf. (D+1)")).as("taxa_intervalo_inf_d1"),
      taxa_br(c("Interv. Ind. Sup. (D+1)")).as("taxa_intervalo_sup_d1"),
      col("Criterio").as("criterio"))

  /** Public 9-column view with the PRE/IPCA/LFT family filter
    * (mirrors pyield/tpf/_taxas.py:13-23,106-116).
    */
  val ColunasPublicas: Seq[String] = Seq(
    "titulo", "data_referencia", "codigo_selic", "data_base",
    "data_vencimento", "pu", "taxa_compra", "taxa_venda", "taxa_indicativa")

  private val Familias: Map[String, Seq[String]] = Map(
    "PRE" -> Seq("LTN", "NTN-F"),
    "IPCA" -> Seq("NTN-B"),
    "IGPM" -> Seq("NTN-C"),
    "LFT" -> Seq("LFT"))

  def taxas(df: DataFrame, titulo: String): DataFrame = {
    val titulos = Familias.getOrElse(titulo, Seq(titulo))
    df.filter(col("titulo").isin(titulos: _*))
      .select(ColunasPublicas.map(col): _*)
      .orderBy(col("data_referencia"), col("titulo"), col("data_vencimento"))
  }
}
