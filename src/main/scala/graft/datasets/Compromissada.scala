package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** BCB repo-auction (operações compromissadas) dataset (reference
  * /root/reference/pyield/selic/compromissada.py:42-121): Olinda OData CSV
  * with BR-quoted rates → typed frame with derived business-day tenor and
  * acceptance metrics.
  *
  * Zero-volume auctions null the cut rate (a 0-volume "taxaCorte" is
  * meaningless) and report 0% accepted; otherwise pct_aceito is the
  * complement of the published rejection percentage.
  */
object Compromissada {

  /** Output column order (compromissada.py docstring contract). */
  val OrdemFinal: Seq[String] = Seq(
    "data_leilao", "data_liquidacao", "data_retorno", "hora_inicio",
    "prazo_dc", "prazo_du", "comunicado", "tipo_oferta", "publico",
    "financeiro_aceito", "taxa_corte", "pct_aceito")

  def lerCsv(spark: SparkSession, path: String): DataFrame = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    processar(graft.sources.RawFiles.csvFromText(spark, text, ",",
      skipLines = 0, nullValue = "null"))
  }

  def processar(raw: DataFrame): DataFrame = {
    val volZero = col("volumeAceito").cast("long") === 0
    raw.select(
      to_date(col("dataMovimento"), "yyyy-MM-dd").as("data_leilao"),
      to_date(col("dataLiquidacao"), "yyyy-MM-dd").as("data_liquidacao"),
      to_date(col("dataRetorno"), "yyyy-MM-dd").as("data_retorno"),
      col("horaInicio").as("hora_inicio"),
      col("prazoDiasCorridos").cast("long").as("prazo_dc"),
      bday_count(to_date(col("dataLiquidacao"), "yyyy-MM-dd"),
        to_date(col("dataRetorno"), "yyyy-MM-dd")).as("prazo_du"),
      col("numeroComunicado").cast("long").as("comunicado"),
      col("nomeTipoOferta").as("tipo_oferta"),
      col("publicoPermitidoLeilao").as("publico"),
      (lit(1000) * col("volumeAceito").cast("double")).as("financeiro_aceito"),
      when(volZero, lit(null)).otherwise(taxa_br(col("taxaCorte")))
        .as("taxa_corte"),
      when(volZero, lit(0.0)).otherwise(lit(100) - float_br(col("percentualCorte")))
        .as("pct_aceito"))
      .orderBy(col("data_leilao"), col("hora_inicio"), col("tipo_oferta"))
  }
}
