package graft.datasets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.curve.Curve
import graft.functions._

/** B3 futures contract utilities + the enriched futures pipeline (EP1 in
  * SURVEY §3; reference /root/reference/pyield/futuro/{contratos,historico}.py).
  */
object Contratos {

  /** Contracts quoted in rate terms (OHLC columns are percents). */
  val ContratosTaxa: Set[String] = Set("DI1", "DAP", "DDI", "FRC", "FRO")

  private val mesCodigo: Seq[(String, Int)] = Seq(
    "F" -> 1, "G" -> 2, "H" -> 3, "J" -> 4, "K" -> 5, "M" -> 6,
    "N" -> 7, "Q" -> 8, "U" -> 9, "V" -> 10, "X" -> 11, "Z" -> 12)

  /** Expiry from the B3 ticker (month-code letter + 2-digit year + day 1,
    * or day 15 for DAP), rolled forward to a business day. Unknown month
    * codes yield null (contratos.py:96-153).
    */
  def vencimentoExpr(codigo: Column, contrato: String): Column = {
    val diaVencimento = if (contrato.toUpperCase.contains("DAP")) 15 else 1
    val cod = upper(codigo)
    val ano = substring(cod, 5, 2).cast("int") + 2000
    val mes = mesCodigo.foldLeft(lit(null).cast("int")) { case (acc, (l, m)) =>
      when(substring(cod, 4, 1) === l, m).otherwise(acc)
    }
    val dataBruta = make_date(ano, mes, lit(diaVencimento))
    when(dataBruta.isNull, lit(null).cast("date"))
      .otherwise(bday_add(dataBruta, lit(0)))
  }

  /** DV01 = 0.0001 * (du/252) / (1 + taxa) * preco (contratos.py:29-46). */
  def dv01Expr(diasUteis: Column, taxa: Column, preco: Column): Column =
    lit(0.0001) * (diasUteis.cast("double") / 252 / (taxa + 1)) * preco
}

object Futuro {

  /** XML-schema → canonical names (historico.py:83-101). */
  val RenomearPr: Seq[(String, String)] = Seq(
    "TradDt" -> "data_referencia",
    "TckrSymb" -> "codigo_negociacao",
    "OpnIntrst" -> "contratos_abertos",
    "TradQty" -> "numero_negocios",
    "FinInstrmQty" -> "volume_negociado",
    "NtlFinVol" -> "volume_financeiro",
    "BestBidPric" -> "preco_ultima_oferta_compra",
    "BestAskPric" -> "preco_ultima_oferta_venda",
    "FrstPric" -> "preco_abertura",
    "MinPric" -> "preco_minimo",
    "MaxPric" -> "preco_maximo",
    "TradAvrgPric" -> "preco_medio",
    "LastPric" -> "preco_fechamento",
    "AdjstdQt" -> "preco_ajuste",
    "AdjstdQtTax" -> "taxa_ajuste",
    "MaxTradLmt" -> "preco_limite_maximo",
    "MinTradLmt" -> "preco_limite_minimo")

  /** Rate-quoted contracts: price columns are really rates; bid/ask swap
    * (a bid in PU terms is an offer to SELL rate — historico.py:15-28).
    */
  val PrecoParaTaxa: Seq[(String, String)] = Seq(
    "preco_abertura" -> "taxa_abertura",
    "preco_minimo" -> "taxa_minima",
    "preco_maximo" -> "taxa_maxima",
    "preco_medio" -> "taxa_media",
    "preco_fechamento" -> "taxa_fechamento",
    "preco_ultima_oferta_compra" -> "taxa_ultima_oferta_venda",
    "preco_ultima_oferta_venda" -> "taxa_ultima_oferta_compra",
    "preco_limite_minimo" -> "taxa_limite_minimo",
    "preco_limite_maximo" -> "taxa_limite_maximo")

  val ColunasTaxa: Seq[String] = Seq(
    "data_referencia", "codigo_negociacao", "data_vencimento", "dias_uteis",
    "dias_corridos", "dv01", "contratos_abertos", "numero_negocios",
    "volume_negociado", "volume_financeiro", "preco_ajuste",
    "taxa_limite_minimo", "taxa_limite_maximo", "taxa_abertura",
    "taxa_minima", "taxa_maxima", "taxa_media", "taxa_fechamento",
    "taxa_ultima_oferta_venda", "taxa_ultima_oferta_compra", "taxa_ajuste",
    "taxa_forward")

  val ColunasPreco: Seq[String] = Seq(
    "data_referencia", "codigo_negociacao", "data_vencimento", "dias_uteis",
    "dias_corridos", "contratos_abertos", "numero_negocios",
    "volume_negociado", "volume_financeiro", "preco_limite_minimo",
    "preco_limite_maximo", "preco_abertura", "preco_minimo", "preco_maximo",
    "preco_medio", "preco_fechamento", "preco_ultima_oferta_compra",
    "preco_ultima_oferta_venda", "preco_ajuste")

  /** Raw B3 PR frame (XML tag names) → enriched, ordered futures frame
    * (historico.py:111-193): rename, ticker filter, expiry, business/
    * calendar day counts, percent→decimal on rate columns, DV01 (DI1),
    * forward rates (DI1/DAP, windowed per reference date).
    */
  def enriquecer(df: DataFrame, contrato: String): DataFrame = {
    var out = RenomearPr.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    out = out.filter(col("codigo_negociacao").startsWith(contrato) &&
      length(col("codigo_negociacao")) === 6)
    out = out
      .withColumn("data_vencimento",
        Contratos.vencimentoExpr(col("codigo_negociacao"), contrato))
      .withColumn("dias_uteis",
        bday_count(col("data_referencia"), col("data_vencimento")))
      .withColumn("dias_corridos",
        datediff(col("data_vencimento"), col("data_referencia")).cast("long"))
      .filter(col("dias_corridos") > 0)

    if (Contratos.ContratosTaxa.contains(contrato)) {
      out = PrecoParaTaxa.foldLeft(out) { case (d, (from, to)) =>
        if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
      }
      out.columns.filter(_.startsWith("taxa_")).foreach { c =>
        out = out.withColumn(c, pct_para_decimal(col(c)))
      }
    }

    if (contrato == "DI1")
      out = out.withColumn("dv01",
        Contratos.dv01Expr(col("dias_uteis"), col("taxa_ajuste"),
          col("preco_ajuste")))

    if (contrato == "DI1" || contrato == "DAP")
      out = out.withColumn("taxa_forward",
        Curve.forwards(col("dias_uteis"), col("taxa_ajuste"),
          col("data_referencia")))

    val colunas =
      if (Contratos.ContratosTaxa.contains(contrato)) ColunasTaxa
      else ColunasPreco
    out.select(colunas.filter(out.columns.contains).map(col): _*)
      .orderBy(col("data_referencia"), col("data_vencimento"))
  }
}
