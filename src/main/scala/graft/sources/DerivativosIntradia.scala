package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** B3 intraday derivatives JSON reader (S4 in SURVEY §2.1; reference
  * /root/reference/pyield/b3/derivativos_intradia.py:51-173). Spark's JSON
  * reader resolves the dotted paths natively (`asset.AsstSummry.mtrtyCode`
  * etc.) — no flattening step needed. Missing optional structs (offers,
  * side type) come back as typed nulls.
  */
object DerivativosIntradia {

  /** (json path, canonical name, type) — derivativos_intradia.py:51-77. */
  val Colunas: Seq[(String, String, DataType)] = Seq(
    ("symb", "codigo_negociacao", StringType),
    ("desc", "descricao", StringType),
    ("asset.code", "codigo_ativo", StringType),
    ("mkt.cd", "codigo_mercado", StringType),
    ("asset.AsstSummry.mtrtyCode", "data_vencimento", DateType),
    ("SctyQtn.prvsDayAdjstmntPric", "preco_ajuste_anterior", DoubleType),
    ("SctyQtn.bottomLmtPric", "preco_limite_minimo", DoubleType),
    ("SctyQtn.topLmtPric", "preco_limite_maximo", DoubleType),
    ("SctyQtn.opngPric", "preco_abertura", DoubleType),
    ("SctyQtn.minPric", "preco_minimo", DoubleType),
    ("SctyQtn.maxPric", "preco_maximo", DoubleType),
    ("SctyQtn.avrgPric", "preco_medio", DoubleType),
    ("SctyQtn.curPrc", "preco_ultimo", DoubleType),
    ("SctyQtn.exrcPric", "preco_exercicio", DoubleType),
    ("asset.AsstSummry.opnCtrcts", "contratos_abertos", LongType),
    ("asset.AsstSummry.grssAmt", "volume_financeiro", DoubleType),
    ("asset.AsstSummry.tradQty", "numero_negocios", LongType),
    ("asset.AsstSummry.traddCtrctsQty", "volume_negociado", LongType),
    ("buyOffer.price", "preco_oferta_compra", DoubleType),
    ("sellOffer.price", "preco_oferta_venda", DoubleType),
    ("asset.SdTpCd.desc", "tipo_lado", StringType))

  def ler(spark: SparkSession, path: String): DataFrame =
    lerTexto(spark, new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  def lerTexto(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    val doc = spark.read.option("multiLine", "true")
      .json(spark.createDataset(Seq(json)))
    val scty = doc.select(explode(col("Scty")).as("s")).select("s.*")
    processar(scty)
  }

  def processar(scty: DataFrame): DataFrame = {
    def pick(path: String, t: DataType): Column = {
      // tolerate absent optional branches in the payload
      val parts = path.split("\\.")
      val exists = try {
        scty.select(parts.map(p => s"`$p`").mkString(".")); true
      } catch { case _: org.apache.spark.sql.AnalysisException => false }
      val base = if (exists) col(path) else lit(null)
      t match {
        case DateType => try_to_date(base)
        case other    => base.try_cast(other.sql)
      }
    }
    scty.select(Colunas.map { case (path, name, t) =>
      pick(path, t).as(name)
    }: _*).orderBy(col("codigo_negociacao"))
  }
}
