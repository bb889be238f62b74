package graft.datasets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.bonds.BondColumns
import graft.functions._
import graft.ops.AsOf

/** BCB (Olinda/demab) bond-auction results pipeline (S7 + D24; reference
  * /root/reference/pyield/bc/leiloes.py:26-343): comma CSV with BR-quoted
  * numbers → typed frame → financial split, PU fallback for the pre-2024
  * publication format, per-title duration/DV01, PTAX as-of → USD.
  */
object BcLeiloes {

  val MapaTitulos: Seq[(Long, String)] = Seq(
    100000L -> "LTN", 210100L -> "LFT", 760199L -> "NTN-B", 950199L -> "NTN-F")

  val OrdemFinal: Seq[String] = Seq(
    "data_leilao", "data_liquidacao", "tipo_leilao", "numero_edital",
    "tipo_publico", "titulo", "codigo_selic", "data_vencimento", "dias_uteis",
    "duration", "prazo_medio", "pu_medio", "pu_corte", "taxa_media",
    "taxa_corte", "dv01_1v", "dv01_2v", "dv01_total", "ptax", "dv01_1v_usd",
    "dv01_2v_usd", "dv01_total_usd", "quantidade_liquidada_1v",
    "quantidade_liquidada_2v", "quantidade_liquidada_total",
    "quantidade_ofertada_1v", "quantidade_ofertada_2v",
    "quantidade_ofertada_total", "quantidade_aceita_1v",
    "quantidade_aceita_2v", "quantidade_aceita_total", "financeiro_1v",
    "financeiro_2v", "financeiro_total")

  private def sumH(cols: Column*): Column =
    cols.map(c => coalesce(c, lit(0))).reduce(_ + _)

  def lerCsv(spark: SparkSession, path: String): DataFrame = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val raw = graft.sources.RawFiles.csvFromText(spark, text, ",",
      skipLines = 0, nullValue = "null")
    processar(raw)
  }

  def processar(raw: DataFrame): DataFrame = {
    val dataMudanca = lit(java.sql.Date.valueOf("2024-06-11"))
    def dt(c: String) = to_date(col(c), "yyyy-MM-dd HH:mm:ss")

    var df = raw
      .filter(col("ofertante") === "Tesouro Nacional")
      .withColumn("data_leilao", dt("dataMovimento"))
      .withColumn("data_liquidacao", dt("dataLiquidacao"))
      .withColumn("data_vencimento", dt("dataVencimento"))
      .withColumn("numero_edital", col("edital").cast("long"))
      .withColumn("tipo_publico", col("tipoPublico"))
      .withColumn("codigo_selic", col("codigoTitulo").cast("long"))
      .withColumn("tipo_leilao", col("tipoOferta"))
      .withColumn("pu_medio", float_br(col("cotacaoMedia")))
      .withColumn("pu_corte", float_br(col("cotacaoCorte")))
      .withColumn("taxa_media", taxa_br(col("taxaMedia")))
      .withColumn("taxa_corte", taxa_br(col("taxaCorte")))
      .withColumn("financeiro_total", float_br(col("financeiro")) * 1000000)
      .withColumn("quantidade_ofertada_1v", col("quantidadeOfertada").cast("long"))
      .withColumn("quantidade_aceita_1v", col("quantidadeAceita").cast("long"))
      .withColumn("quantidade_liquidada_1v", col("quantidadeLiquidada").cast("long"))
      .withColumn("quantidade_ofertada_2v",
        col("quantidadeOfertadaSegundaRodada").cast("long"))
      .withColumn("quantidade_aceita_2v",
        col("quantidadeAceitaSegundaRodada").cast("long"))
      .withColumn("quantidade_liquidada_2v",
        col("quantidadeLiquidadaSegundaRodada").cast("long"))

    df = df
      // replace_strict semantics (reference bc/leiloes.py): an unmapped
      // security code must FAIL, not flow through as null titulo with
      // zeroed analytics that look valid downstream
      .withColumn("titulo", MapaTitulos.foldLeft(
        raise_error(concat(lit("código SELIC sem título mapeado: "),
          col("codigo_selic").cast("string"))).cast("string")) {
        case (acc, (codigo, nome)) =>
          when(col("codigo_selic") === codigo, nome).otherwise(acc)
      })
      .withColumn("quantidade_ofertada_total",
        sumH(col("quantidade_ofertada_1v"), col("quantidade_ofertada_2v")))
      .withColumn("quantidade_aceita_total",
        sumH(col("quantidade_aceita_1v"), col("quantidade_aceita_2v")))
      .withColumn("quantidade_liquidada_total",
        sumH(col("quantidade_liquidada_1v"), col("quantidade_liquidada_2v")))
      .withColumn("dias_uteis",
        bday_count(col("data_liquidacao"), col("data_vencimento")))

    df = df
      .withColumn("financeiro_1v",
        when(col("quantidade_aceita_1v") =!= 0,
          (col("quantidade_aceita_1v") / col("quantidade_aceita_total"))
            * col("financeiro_total"))
          .otherwise(lit(0.0)))
      .withColumn("financeiro_2v",
        col("financeiro_total") - col("financeiro_1v"))
      // pre-2024 files publish quotation (base-100) for indexed bonds, not
      // the PU - recompute from the financial split (leiloes.py:166-175)
      .withColumn("pu_medio",
        when(col("data_leilao") >= dataMudanca ||
          col("titulo").isin("LTN", "NTN-F"), col("pu_medio"))
          .otherwise(round_even(
            col("financeiro_1v") / col("quantidade_aceita_1v"), 6)))

    val semAceite = col("quantidade_aceita_1v") === 0
    Seq("taxa_media", "taxa_corte", "pu_medio", "pu_corte").foreach { c =>
      df = df.withColumn(c, when(semAceite, lit(null)).otherwise(col(c)))
    }

    val liq = col("data_liquidacao")
    val venc = col("data_vencimento")
    df = df
      .withColumn("duration",
        when(col("titulo") === "LTN", col("dias_uteis").cast("double") / 252)
          .when(col("titulo") === "NTN-F",
            BondColumns.ntnf_duration(liq, venc, col("taxa_media")))
          .when(col("titulo") === "NTN-B",
            BondColumns.ntnb_duration(liq, venc, col("taxa_media")))
          .otherwise(lit(0.0)))
      .withColumn("_dv01u",
        when(col("titulo") === "LTN",
          BondColumns.ltn_dv01(liq, venc, col("taxa_media"), col("pu_medio")))
          .when(col("titulo") === "NTN-F",
            BondColumns.ntnf_dv01(liq, venc, col("taxa_media"), col("pu_medio")))
          .when(col("titulo") === "NTN-B",
            BondColumns.ntnb_dv01(liq, venc, col("taxa_media"), col("pu_medio")))
          .otherwise(lit(0.0)))
      .withColumn("dv01_total", col("_dv01u") * col("quantidade_aceita_total"))
      .withColumn("dv01_1v", col("_dv01u") * col("quantidade_aceita_1v"))
      .withColumn("dv01_2v", col("_dv01u") * col("quantidade_aceita_2v"))
      .withColumn("prazo_medio",
        when(col("titulo") === "LFT", col("dias_uteis").cast("double") / 252)
          .otherwise(col("duration")))
      .drop("_dv01u")

    // cs.float().fill_nan(None): NaN -> null on every float column
    df.schema.fields.filter(_.dataType == DoubleType).foreach { f =>
      df = df.withColumn(f.name,
        when(isnan(col(f.name)), lit(null)).otherwise(col(f.name)))
    }
    df
  }

  def comPtax(df0: DataFrame, ptax: DataFrame): DataFrame = {
    var df = AsOf.joinBroadcast(df0, ptax.select(col("data_ref"), col("ptax")),
      leftOn = "data_leilao", rightOn = "data_ref",
      payload = Seq("ptax" -> "ptax"))
    Seq("dv01_1v", "dv01_2v", "dv01_total").foreach { c =>
      df = df.withColumn(s"${c}_usd", round_even(col(c) / col("ptax"), 2))
    }
    df.select(OrdemFinal.filter(df.columns.contains).map(col): _*)
      .orderBy(col("data_leilao"), col("tipo_leilao"), col("titulo"),
        col("data_vencimento"))
  }
}
