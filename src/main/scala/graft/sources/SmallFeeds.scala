package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.ops.Dedup

/** Remaining small schema-first feeds (SURVEY §2.1):
  * SGS series (S6), COPOM calendar (S19), LFT VNA fixed-width text (S12),
  * Tesouro benchmarks (S9), IBGE IPCA (S17). Acquisition is pluggable
  * (callers pass raw payloads); parsing mirrors the reference contracts.
  */
object SmallFeeds {

  // -------------------------------------------------------------- SGS (S6)

  /** BCB SGS series payload `[{"data":"dd/mm/yyyy","valor":"..."}]` →
    * (data Date, valor Double) frame (reference bc/sgs.py:83-97).
    */
  def sgsParse(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(Seq(json)))
      .select(to_date(col("data"), "dd/MM/yyyy").as("data"),
        col("valor").try_cast("double").as("valor"))
  }

  /** Range splitting for the API's ~10-year window limit: [start, end]
    * becomes 10-year blocks (reference bc/sgs.py:99-125).
    */
  def sgsRanges(inicio: java.time.LocalDate,
                fim: java.time.LocalDate): Seq[(java.time.LocalDate, java.time.LocalDate)] = {
    val LimiteDias = 3470 // ~9.5y, the reference's safe window
    if (java.time.temporal.ChronoUnit.DAYS.between(inicio, fim) < LimiteDias)
      Seq(inicio -> fim)
    else {
      Iterator.iterate(inicio)(_.plusYears(10)).takeWhile(!_.isAfter(fim))
        .map { ini =>
          val f = ini.plusYears(10)
          ini -> (if (f.isAfter(fim)) fim else f)
        }.toSeq
    }
  }

  /** Concat + dedup-first by date + sort — the merge step after fetching
    * each block. Overlapping boundary dates keep the FIRST block's row
    * (the reference's unique(keep="first") over the concat order), so
    * each block is tagged with its position before the union.
    */
  def sgsMerge(blocks: Seq[DataFrame]): DataFrame = {
    val all = blocks.zipWithIndex
      .map { case (b, i) => b.withColumn("_blk", lit(i)) }
      .reduce(_ unionByName _)
    Dedup.keepFirst(all, Seq("data"), Seq(col("_blk")))
      .drop("_blk")
      .orderBy(col("data"))
  }

  /** SGS series ids used by the public API (bc/sgs.py:48-53). */
  val SgsPtaxVenda = 1
  val SgsSelicMeta = 432
  val SgsSelicOver = 1178

  /** PTAX shaping (bc/sgs.py:340-350): valor → cotacao rounded to 4
    * (Polars round = scaled ties-even).
    */
  def sgsPtax(df: DataFrame): DataFrame =
    df.select(col("data"), round_even(col("valor"), 4).as("cotacao"))

  /** Rate-series shaping (bc/sgs.py:146-153): percent → decimal `taxa`. */
  def sgsTaxa(df: DataFrame): DataFrame =
    df.select(col("data"), pct_para_decimal(col("valor")).as("taxa"))

  /** Scalar extraction with the NaN-on-empty contract (bc/sgs.py:157-161,
    * backing `ptax(data)` / `selic_over(data)` / `selic_meta(data)`).
    * Multi-row inputs take the FIRST row by `data` — Spark frames carry no
    * row order, so an unordered limit(1) would be nondeterministic where
    * the reference's item(0) is not.
    */
  def extrairEscalar(df: DataFrame, coluna: String): Double = {
    val ordered =
      if (df.columns.contains("data")) df.orderBy(col("data")) else df
    val rows = ordered.select(col(coluna).cast("double")).limit(1).collect()
    if (rows.isEmpty || rows(0).isNullAt(0)) Double.NaN
    else rows(0).getDouble(0)
  }

  // ------------------------------------------------------------ COPOM (S19)

  /** Past (API/fixture) + future (announced) meetings → deduped calendar
    * with ExpiryDate = next business day after the meeting end
    * (reference selic/copom.py:118-183).
    */
  def copomCalendar(past: DataFrame, future: DataFrame): DataFrame = {
    val merged = past.unionByName(future, allowMissingColumns = true)
    Dedup.keepFirst(merged, Seq("EndDate"), Seq(col("StartDate")))
      .withColumn("ExpiryDate", bday_add(col("EndDate").cast("date"), lit(1)))
      .orderBy(col("EndDate"))
  }

  def copomNextMeeting(calendar: DataFrame, reference: java.sql.Date): DataFrame =
    calendar.filter(col("EndDate").cast("date") >= lit(reference))
      .orderBy(col("EndDate")).limit(1)

  // ---------------------------------------------------------- LFT VNA (S12)

  /** `{date}APC238` text: slice between "EMISSAO" and the "99999999*"
    * trailer, drop the header line, keep rows whose 4th field is código
    * 210100, take the last field as the VNA (comma decimal); all values
    * must agree → scalar (reference bc/lft.py:44-80).
    */
  def lftVnaParse(texto: String): Double = {
    val inicio = texto.indexOf("EMISSAO")
    val fim = texto.indexOf("99999999*")
    require(inicio >= 0 && fim > inicio, "estrutura inesperada do APC238")
    val linhas = texto.substring(inicio, fim)
      .split("\r?\n").map(_.trim).filter(_.nonEmpty).drop(1)
    val valores = linhas
      .map(_.split("\\s+"))
      .filter(campos => campos.length > 3 && campos(3) == "210100")
      .map(campos => campos.last.replace(",", ".").toDouble)
    require(valores.nonEmpty, "nenhuma linha 210100 no APC238")
    require(valores.distinct.length == 1,
      "valores de VNA divergentes no APC238")
    valores.head
  }

  // ------------------------------------------------------- DI over (S13)

  /** First file date on the CETIP FTP (di_over.py:29). */
  val DiOverInicio: java.time.LocalDate = java.time.LocalDate.of(2012, 8, 20)

  /** CETIP MediaCDI file payload "00001315" → 1315/10^4 = 0.1315, rounded
    * to 4 places (di_over.py:40-47: int parse then /1e4).
    */
  def diOverParse(conteudo: String): Double =
    BigDecimal(conteudo.trim.toInt)./(BigDecimal(10000))
      .setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  /** DI-over rate for a date with the reference's availability contract
    * (di_over.py:67-100): null/pre-series/non-business dates → NaN without
    * touching the fetcher; FTP 550 (missing file = holiday artifact) →
    * NaN; 421 (transient connection cap) retried up to 3 attempts; other
    * failures surface. `buscar` receives the "yyyyMMdd.txt" file name.
    */
  def diOver(data: java.time.LocalDate,
             buscar: String => String,
             maxTentativas: Int = 3,
             espera: Long = 0L): Double = {
    if (data == null || data.isBefore(DiOverInicio) ||
        !graft.core.BrCalendar.ehDiaUtil(data)) return Double.NaN
    val nome = data.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")) + ".txt"
    var tentativa = 1
    while (true) {
      try return diOverParse(buscar(nome))
      catch {
        case e: java.io.IOException =>
          val motivo = Option(e.getMessage).getOrElse("")
          if (motivo.contains("550")) return Double.NaN
          else if (motivo.contains("421") && tentativa < maxTentativas) {
            if (espera > 0) Thread.sleep(espera)
            tentativa += 1
          } else throw new java.net.ConnectException(
            s"Falha ao buscar taxa DI via FTP: $motivo")
      }
    }
    Double.NaN // unreachable
  }

  // ------------------------------------------------ benchmarks/IPCA (S9/S17)

  /** Tesouro benchmarks payload (list of dicts) → trimmed typed frame
    * (reference tpf/benchmark.py:38-124).
    */
  def benchmarksParse(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(Seq(json)))
      .select(
        trim(col("benchmark")).as("benchmark"),
        trim(col("tipo_titulo")).as("titulo"),
        to_date(col("data_vencimento")).as("data_vencimento"))
      .orderBy(col("titulo"), col("data_vencimento"))
  }

  /** IBGE IPCA period payload `[{"periodo":"YYYYMM","valor":...}]` →
    * (competencia Date, valor Double) (reference ipca/historico.py:35-258).
    */
  def ipcaParse(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(Seq(json)))
      .select(
        to_date(concat(col("periodo"), lit("01")), "yyyyMMdd")
          .as("competencia"),
        col("valor").try_cast("double").as("valor"))
      .orderBy(col("competencia"))
  }
}
