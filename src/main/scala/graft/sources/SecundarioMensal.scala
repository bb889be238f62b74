package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.float_br

/** SELIC secondary-market monthly file reader (S10 in SURVEY §2.1), with
  * the reference's bronze → silver → gold layering
  * (/root/reference/pyield/tpf/secundario/_mensal.py:39-310):
  * bronze = raw ZIP bytes, silver = typed canonical frame, gold = silver +
  * `financeiro = round(quantidade * pu_medio, 2)`. The medallion naming
  * maps 1:1 onto parquet tables in a lakehouse deployment.
  */
object SecundarioMensal {

  /** `NegT%Y%m.ZIP` / `NegE%Y%m.ZIP` (extragrupo). */
  def nomeArquivoMensal(ano: Int, mes: Int, extragrupo: Boolean = false): String =
    f"Neg${if (extragrupo) "E" else "T"}$ano%04d$mes%02d.ZIP"

  def lerZip(spark: SparkSession, path: String): DataFrame =
    zipParaSilver(spark, RawFiles.readBytes(path))

  /** bronze → silver. */
  def zipParaSilver(spark: SparkSession, zipBytes: Array[Byte]): DataFrame = {
    require(RawFiles.isZip(zipBytes), "ZIP inválido ou ilegível")
    val csv = new String(RawFiles.unzipFirst(zipBytes),
      java.nio.charset.Charset.forName("ISO-8859-1"))
    val raw = RawFiles.csvFromText(spark, csv, ";", skipLines = 0,
      nullValue = "")
    require(raw.columns.length >= 2,
      "CSV não parece estar separado por ponto e vírgula")
    processar(raw)
  }

  private def dateBr(c: Column): Column = try_to_date(c, "dd/MM/yyyy")

  private def optLong(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) trim(col(name)).cast("long")
    else lit(null).cast("long")

  def processar(df: DataFrame): DataFrame = {
    def t(name: String): Column = trim(col(name))
    df.select(
      dateBr(t("DATA MOV")).as("data_liquidacao"),
      t("SIGLA").as("titulo"),
      t("CODIGO").cast("long").as("codigo_selic"),
      t("CODIGO ISIN").as("isin"),
      dateBr(t("EMISSAO")).as("data_emissao"),
      dateBr(t("VENCIMENTO")).as("data_vencimento"),
      t("NUM DE OPER").cast("long").as("operacoes"),
      t("QUANT NEGOCIADA").cast("long").as("quantidade"),
      float_br(t("PU MIN")).as("pu_minimo"),
      float_br(t("PU MED")).as("pu_medio"),
      float_br(t("PU MAX")).as("pu_maximo"),
      float_br(t("PU LASTRO")).as("pu_lastro"),
      float_br(t("VALOR PAR")).as("valor_par"),
      float_br(t("TAXA MIN")).as("taxa_minima"),
      float_br(t("TAXA MED")).as("taxa_media"),
      float_br(t("TAXA MAX")).as("taxa_maxima"),
      optLong(df, "NUM OPER COM CORRETAGEM").as("operacoes_corretagem"),
      optLong(df, "QUANT NEG COM CORRETAGEM").as("quantidade_corretagem"))
      .orderBy(col("data_liquidacao"), col("titulo"), col("data_vencimento"))
  }

  /** silver → gold: financeiro rounded half-to-even like the reference's
    * Polars round (round_ties_even on the binary value).
    */
  def paraGold(silver: DataFrame): DataFrame =
    silver.withColumn("financeiro",
      graft.functions.round_even(col("quantidade") * col("pu_medio"), 2))
}
