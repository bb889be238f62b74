package graft.datasets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bonds.BondColumns
import graft.functions._
import graft.ops.AsOf

/** Tesouro Nacional auction results pipeline (S8 + D24; reference
  * /root/reference/pyield/tpf/leiloes.py:97-493): raw API records →
  * typed frame → financial/placement enrichment → per-title duration and
  * DV01 → PTAX as-of join → USD DV01.
  */
object Leiloes {

  /** (api field, canonical name) — leiloes.py:21-46. */
  val Definicoes: Seq[(String, String)] = Seq(
    "data_leilao" -> "data_1v",
    "liquidacao" -> "data_liquidacao_1v",
    "liquidacao_segunda_volta" -> "data_liquidacao_2v",
    "numero_edital" -> "numero_edital",
    "tipo_leilao" -> "tipo_leilao",
    "tipo_ocorrencia" -> "tipo_ocorrencia",
    "titulo" -> "titulo",
    "benchmark" -> "benchmark",
    "vencimento" -> "data_vencimento",
    "oferta" -> "quantidade_ofertada_1v",
    "quantidade_aceita" -> "quantidade_aceita_1v",
    "oferta_segunda_volta" -> "quantidade_ofertada_2v",
    "quantidade_aceita_segunda_volta" -> "quantidade_aceita_2v",
    "quantidade_liquidada" -> "quantidade_liquidada_1v",
    "quantidade_liquidada_segunda_volta" -> "quantidade_liquidada_2v",
    "financeiro_aceito" -> "financeiro_aceito_1v",
    "financeiro_aceito_segunda_volta" -> "financeiro_aceito_2v",
    "quantidade_bcb" -> "quantidade_bcb",
    "financeiro_bcb" -> "financeiro_bcb",
    "pu_minimo" -> "pu_minimo",
    "pu_medio" -> "pu_medio",
    "taxa_media" -> "taxa_media",
    "taxa_maxima" -> "taxa_maxima")

  val OrdemFinal: Seq[String] = Seq(
    "data_1v", "data_liquidacao_1v", "data_liquidacao_2v", "numero_edital",
    "tipo_leilao", "tipo_ocorrencia", "titulo", "benchmark",
    "data_vencimento", "dias_uteis", "dias_corridos", "duration",
    "prazo_medio", "quantidade_ofertada_1v", "quantidade_ofertada_2v",
    "quantidade_aceita_1v", "quantidade_aceita_2v", "quantidade_aceita_total",
    "quantidade_liquidada_1v", "quantidade_liquidada_2v",
    "financeiro_ofertado_1v", "financeiro_ofertado_2v",
    "financeiro_ofertado_total", "financeiro_aceito_1v",
    "financeiro_aceito_2v", "financeiro_aceito_total", "quantidade_bcb",
    "financeiro_bcb", "colocacao_1v", "colocacao_2v", "colocacao_total",
    "dv01_1v", "dv01_2v", "dv01_total", "ptax", "dv01_1v_usd", "dv01_2v_usd",
    "dv01_total_usd", "pu_minimo", "pu_medio", "tipo_pu_medio", "taxa_media",
    "taxa_maxima")

  private val longCols = Set("numero_edital", "quantidade_ofertada_1v",
    "quantidade_aceita_1v", "quantidade_ofertada_2v", "quantidade_aceita_2v",
    "quantidade_liquidada_1v", "quantidade_liquidada_2v", "quantidade_bcb",
    "financeiro_bcb")
  private val doubleCols = Set("financeiro_aceito_1v", "financeiro_aceito_2v",
    "pu_minimo", "pu_medio", "taxa_media", "taxa_maxima")

  /** Polars-style null-aware horizontal sum: nulls count as 0. */
  private def sumH(cols: Column*): Column =
    cols.map(c => coalesce(c, lit(0))).reduce(_ + _)

  def lerJson(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    // API payloads are {"registros": [...]} ; fixtures may be a bare array
    val raw = spark.read.json(spark.createDataset(Seq(text)))
    // a bare top-level array is exploded into rows by the JSON reader
    val registros =
      if (raw.columns.contains("registros"))
        raw.select(explode(col("registros")).as("r")).select("r.*")
      else raw
    transformar(registros)
  }

  /** Raw records (api field names) → typed canonical frame. */
  def transformar(raw: DataFrame): DataFrame = {
    var df = Definicoes.foldLeft(raw) { case (d, (api, novo)) =>
      if (d.columns.contains(api)) d.withColumnRenamed(api, novo)
      else d.withColumn(novo, lit(null))
    }
    df = df.select(Definicoes.map(_._2).map(col): _*)
    df = df.columns.foldLeft(df) { (d, c) =>
      if (c.startsWith("data_")) d.withColumn(c, to_date(col(c), "dd/MM/yyyy"))
      else if (longCols.contains(c)) d.withColumn(c, col(c).cast("long"))
      else if (doubleCols.contains(c)) d.withColumn(c, col(c).cast("double"))
      else d.withColumn(c, col(c).cast("string"))
    }

    df = df
      .withColumn("quantidade_ofertada_total",
        sumH(col("quantidade_ofertada_1v"), col("quantidade_ofertada_2v")))
      .withColumn("quantidade_aceita_total",
        sumH(col("quantidade_aceita_1v"), col("quantidade_aceita_2v")))
      .withColumn("financeiro_aceito_total",
        sumH(col("financeiro_aceito_1v"), col("financeiro_aceito_2v")))
      .withColumn("financeiro_ofertado_1v",
        when(col("quantidade_ofertada_1v") === col("quantidade_aceita_1v"),
          col("financeiro_aceito_1v"))
          .otherwise(col("quantidade_ofertada_1v") * col("pu_medio")))
      .withColumn("financeiro_ofertado_2v",
        when(col("quantidade_ofertada_2v") === col("quantidade_aceita_2v"),
          col("financeiro_aceito_2v"))
          .otherwise(col("quantidade_ofertada_2v") * col("pu_medio")))
      .withColumn("colocacao_1v",
        col("quantidade_aceita_1v") / col("quantidade_ofertada_1v"))
      .withColumn("colocacao_2v",
        col("quantidade_aceita_2v") / col("quantidade_ofertada_2v"))
      .withColumn("tipo_pu_medio",
        when(col("pu_medio") === 0, "calculado").otherwise("original"))

    df = df
      .withColumn("financeiro_ofertado_total",
        sumH(col("financeiro_ofertado_1v"), col("financeiro_ofertado_2v")))
      .withColumn("colocacao_total",
        col("quantidade_aceita_total") / col("quantidade_ofertada_total"))
      .withColumn("dias_corridos",
        datediff(col("data_vencimento"), col("data_liquidacao_1v")).cast("long"))
      .withColumn("pu_medio",
        round_even(when(col("pu_medio") === 0,
          col("financeiro_aceito_1v") / col("quantidade_aceita_1v"))
          .otherwise(col("pu_medio")), 6))

    Seq("financeiro_ofertado_1v", "financeiro_ofertado_2v",
      "financeiro_ofertado_total").foreach { c =>
      df = df.withColumn(c, round_even(col(c), 2))
    }
    Seq("taxa_media", "taxa_maxima").foreach { c =>
      df = df.withColumn(c, pct_para_decimal(col(c)))
    }

    // auctions with nothing accepted in the first round have no meaningful
    // price/rate columns (leiloes.py:234-245)
    val semAceite = col("quantidade_aceita_1v") === 0
    Seq("pu_minimo", "pu_medio", "taxa_media", "taxa_maxima").foreach { c =>
      df = df.withColumn(c, when(semAceite, lit(null)).otherwise(col(c)))
    }
    df = df.withColumn("tipo_pu_medio",
      when(semAceite, lit(null)).otherwise(col("tipo_pu_medio")))

    df.withColumn("dias_uteis",
        bday_count(col("data_liquidacao_1v"), col("data_vencimento")))
      .orderBy(col("data_1v"), col("titulo"), col("data_vencimento"))
  }

  /** Per-title duration/prazo/dv01 and USD conversion via PTAX as-of. */
  def enriquecer(df0: DataFrame, ptax: DataFrame): DataFrame = {
    val liq = col("data_liquidacao_1v")
    val venc = col("data_vencimento")
    var df = df0
      .withColumn("duration",
        when(col("titulo") === "LTN",
          col("dias_uteis").cast("double") / 252)
          .when(col("titulo") === "NTN-F",
            BondColumns.ntnf_duration(liq, venc, col("taxa_media")))
          .when(col("titulo") === "NTN-B",
            BondColumns.ntnb_duration(liq, venc, col("taxa_media")))
          .otherwise(lit(0.0)))
      .withColumn("prazo_medio",
        when(col("titulo") === "LFT", col("dias_uteis").cast("double") / 252)
          .otherwise(col("duration")))

    val dv01Unit =
      when(col("titulo") === "LTN",
        BondColumns.ltn_dv01(liq, venc, col("taxa_media"), col("pu_medio")))
        .when(col("titulo") === "NTN-F",
          BondColumns.ntnf_dv01(liq, venc, col("taxa_media"), col("pu_medio")))
        .when(col("titulo") === "NTN-B",
          BondColumns.ntnb_dv01(liq, venc, col("taxa_media"), col("pu_medio")))
        .otherwise(lit(0.0))

    df = df.withColumn("_dv01u", dv01Unit)
      .withColumn("dv01_1v",
        round_even(col("_dv01u") * col("quantidade_aceita_1v"), 2))
      .withColumn("dv01_2v",
        round_even(col("_dv01u") * col("quantidade_aceita_2v"), 2))
      .withColumn("dv01_total",
        round_even(col("_dv01u") * col("quantidade_aceita_total"), 2))
      .drop("_dv01u")

    // PTAX is a broadcast-sized published series: the zero-shuffle
    // binary-search as-of beats funneling the fact table through the
    // single partition an ungrouped window would need
    val ptaxPrep = ptax.select(col("data_ref"), col("ptax"))
    df = AsOf.joinBroadcast(df, ptaxPrep,
      leftOn = "data_1v", rightOn = "data_ref",
      payload = Seq("ptax" -> "ptax"))
    Seq("dv01_1v", "dv01_2v", "dv01_total").foreach { c =>
      df = df.withColumn(s"${c}_usd", round_even(col(c) / col("ptax"), 2))
    }

    df.select(OrdemFinal.filter(df.columns.contains).map(col): _*)
      .orderBy(col("data_1v"), col("titulo"), col("data_vencimento"))
  }
}
