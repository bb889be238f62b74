package graft.datasets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.curve.Curve
import graft.functions._

/** Intraday futures enrichment (reference pyield/futuro/intradia.py:12-175):
  * the same snapshot-enrichment pipeline as `Futuro.enriquecer`, applied to
  * the B3 real-time derivatives feed — rate renames, percent→decimal,
  * DI PU from the last rate, forwards and DV01 for the rate families.
  */
object FuturoIntradia {

  val PrecoParaTaxa: Seq[(String, String)] = Seq(
    "preco_ajuste_anterior" -> "taxa_ajuste_anterior",
    "preco_limite_minimo" -> "taxa_limite_minimo",
    "preco_limite_maximo" -> "taxa_limite_maximo",
    "preco_abertura" -> "taxa_abertura",
    "preco_minimo" -> "taxa_minima",
    "preco_maximo" -> "taxa_maxima",
    "preco_medio" -> "taxa_media",
    "preco_ultimo" -> "taxa_ultima",
    "preco_oferta_compra" -> "taxa_oferta_compra",
    "preco_oferta_venda" -> "taxa_oferta_venda")

  val OrdemColunas: Seq[String] = Seq(
    "data_referencia", "horario_referencia", "codigo_negociacao",
    "data_vencimento", "dias_uteis", "dias_corridos", "contratos_abertos",
    "numero_negocios", "volume_negociado", "volume_financeiro",
    "preco_ajuste_anterior", "preco_limite_minimo", "preco_limite_maximo",
    "preco_abertura", "preco_minimo", "preco_maximo", "preco_medio",
    "preco_ultimo", "preco_oferta_compra", "preco_oferta_venda",
    "taxa_ajuste_anterior", "taxa_limite_minimo", "taxa_limite_maximo",
    "taxa_abertura", "taxa_minima", "taxa_maxima", "taxa_media",
    "taxa_oferta_compra", "taxa_oferta_venda", "taxa_ultima", "dv01",
    "taxa_forward")

  /** `snapshot` is a DerivativosIntradia frame; `dataNegociacao` is the
    * trading day (the reference uses ultimo_dia_util()).
    */
  def processar(snapshot: DataFrame, contrato: String,
                dataNegociacao: java.sql.Date): DataFrame = {
    var df = snapshot.filter(col("codigo_mercado") === "FUT")
    val ehTaxa = Contratos.ContratosTaxa.contains(contrato)
    if (ehTaxa)
      df = PrecoParaTaxa.foldLeft(df) { case (d, (from, to)) =>
        if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
      }
    df = df.filter(col("data_vencimento").isNotNull)
      .withColumn("data_referencia", lit(dataNegociacao))
      .withColumn("dias_corridos",
        datediff(col("data_vencimento"), col("data_referencia")).cast("long"))
      .withColumn("dias_uteis",
        bday_count(col("data_referencia"), col("data_vencimento")))
      .filter(col("dias_corridos") > 0)

    if (ehTaxa)
      df.columns.filter(_.startsWith("taxa_")).foreach { c =>
        df = df.withColumn(c, pct_para_decimal(col(c)))
      }

    if (contrato == "DI1" || contrato == "DAP") {
      val anos = col("dias_uteis").cast("double") / 252
      df = df
        .withColumn("preco_ultimo",
          round_even(lit(100000.0) / pow(col("taxa_ultima") + 1, anos), 2))
        .withColumn("taxa_forward",
          Curve.forwards(col("dias_uteis"), col("taxa_ultima"), lit(0)))
    }
    if (contrato == "DI1")
      df = df.withColumn("dv01",
        Contratos.dv01Expr(col("dias_uteis"), col("taxa_ultima"),
          col("preco_ultimo")))

    df.select(OrdemColunas.filter(df.columns.contains).map(col): _*)
      .orderBy(col("data_vencimento"))
  }
}
