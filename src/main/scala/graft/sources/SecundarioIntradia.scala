package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.functions._

/** SELIC intraday secondary-market CSV reader (S11 in SURVEY §2.1;
  * reference /root/reference/pyield/tpf/secundario/_intradia.py:21-139).
  *
  * The feed is a `;`-separated file with DUPLICATED header names (the
  * spot block and the termo block reuse "pu mínimo" etc.); duplicates are
  * disambiguated with the `_duplicated_N` suffix, matching the reference's
  * Polars read. Data rows carry `//1` in the first field; `-` is null.
  * The market-hours gate (09:00-22:00 BRT business days) stays driver-side.
  */
object SecundarioIntradia {

  private def dedupeHeader(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.HashMap[String, Int]()
    names.map { n =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      if (k == 0) n else s"${n}_duplicated_${k - 1}"
    }
  }

  /** Raw CSV bytes → string frame with deduplicated, trimmed headers. */
  def parsear(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val text = new String(bytes, "UTF-8").stripPrefix("﻿")
    val lines = text.split("\r?\n").filter(_.nonEmpty)
    val header = dedupeHeader(lines.head.split(";").map(_.trim).toSeq)
    val rows = lines.tail
      .map(_.split(";", -1).map(v => if (v.trim == "-") null else v))
      .filter(_.headOption.contains("1")) // the "//1" column tags spot rows
      .map(cells => Row.fromSeq(
        cells.padTo(header.length, null).take(header.length).toSeq))
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
  }

  /** Typed canonical 31-column frame (query-time metadata injected by the
    * caller so tests can pin it).
    */
  def processar(df: DataFrame, dataHoraConsulta: java.sql.Timestamp,
                dataLiquidacao: java.sql.Date): DataFrame = {
    def c(n: String): Column = col(s"`$n`")
    df.select(
      lit(dataHoraConsulta).as("data_hora_consulta"),
      lit(dataLiquidacao).as("data_liquidacao"),
      trim(c("sigla")).as("titulo"),
      inteiro_br(c("código título")).as("codigo_selic"),
      to_date(c("data vencimento"), "dd/MM/yyyy").as("data_vencimento"),
      float_br(c("pu mínimo")).as("pu_minimo"),
      float_br(c("pu médio")).as("pu_medio"),
      float_br(c("pu máximo")).as("pu_maximo"),
      float_br(c("mercado à vista pu último")).as("pu_ultimo"),
      taxa_br(c("tx mínimo")).as("taxa_minima"),
      taxa_br(c("tx médio")).as("taxa_media"),
      taxa_br(c("tx máximo")).as("taxa_maxima"),
      taxa_br(c("tx último")).as("taxa_ultima"),
      inteiro_br(c("totais liquidados operações")).as("operacoes"),
      inteiro_br(c("títulos")).as("quantidade"),
      float_br(c("financeiro")).as("financeiro"),
      inteiro_br(c("corretagem liquidados operações")).as("operacoes_corretagem"),
      inteiro_br(c("corretagem títulos")).as("quantidade_corretagem"),
      float_br(c("pu mínimo_duplicated_0")).as("termo_pu_minimo"),
      float_br(c("pu médio_duplicated_0")).as("termo_pu_medio"),
      float_br(c("mercado a termo pu último")).as("termo_pu_ultimo"),
      float_br(c("pu máximo_duplicated_0")).as("termo_pu_maximo"),
      taxa_br(c("tx último_duplicated_0")).as("termo_taxa_ultima"),
      taxa_br(c("tx mínimo_duplicated_0")).as("termo_taxa_minima"),
      taxa_br(c("tx médio_duplicated_0")).as("termo_taxa_media"),
      taxa_br(c("tx máximo_duplicated_0")).as("termo_taxa_maxima"),
      inteiro_br(c("totais contratados operações")).as("termo_operacoes"),
      inteiro_br(c("títulos_duplicated_0")).as("termo_quantidade"),
      float_br(c("financeiro_duplicated_0")).as("termo_financeiro"),
      inteiro_br(c("corretagem contratados operações"))
        .as("termo_operacoes_corretagem"),
      inteiro_br(c("corretagem títulos_duplicated_0"))
        .as("termo_quantidade_corretagem"))
  }

  /** Is the SELIC real-time window open (business day, 09:00-22:00 BRT)? */
  def mercadoSelicAberto(
      agora: java.time.ZonedDateTime =
        java.time.ZonedDateTime.now(java.time.ZoneId.of("America/Sao_Paulo"))): Boolean = {
    val ehDiaUtil = graft.core.BrCalendar.ehDiaUtil(agora.toLocalDate)
    val hora = agora.toLocalTime
    ehDiaUtil && !hora.isBefore(java.time.LocalTime.of(9, 0)) &&
      !hora.isAfter(java.time.LocalTime.of(22, 0))
  }
}
