package graft.datasets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** COPOM option (CPM) contract parsing and implied-probability pipeline
  * (D22; reference /root/reference/pyield/selic/cpm.py:179-353 and
  * selic/probabilities.py:100-339) — the reference's most query-like
  * program: string dissection → dim join → window normalization.
  */
object Cpm {

  private val mesCodigo: Seq[(String, Int)] = Seq(
    "F" -> 1, "G" -> 2, "H" -> 3, "J" -> 4, "K" -> 5, "M" -> 6,
    "N" -> 7, "Q" -> 8, "U" -> 9, "V" -> 10, "X" -> 11, "Z" -> 12)

  /** Ticker dissection, e.g. CPMF25C100250:
    * [6] option type C/P → call/put; [7..12] strike field → bps change
    * (value/10 - 10000); [3] meeting month code; [4..5] meeting year.
    */
  def parseTicker(df: DataFrame, codigo: String = "codigo_negociacao"): DataFrame = {
    val cod = col(codigo)
    val mes = mesCodigo.foldLeft(lit(null).cast("int")) { case (acc, (l, m)) =>
      when(substring(cod, 4, 1) === l, m).otherwise(acc)
    }
    df.withColumn("tipo_opcao",
        when(substring(cod, 7, 1) === "C", "call")
          .when(substring(cod, 7, 1) === "P", "put")
          .otherwise(substring(cod, 7, 1)))
      .withColumn("variacao_strike_bps",
        (substring(cod, 8, 6).cast("long")
          .cast("double") / 10).cast("long").cast("int") - 10000)
      .withColumn("_mes_reuniao", mes)
      .withColumn("_ano_reuniao", substring(cod, 5, 2).cast("int") + 2000)
  }

  /** Join the (broadcast-sized) COPOM calendar to attach meeting end and
    * option expiry, then business days to expiry.
    */
  def comCalendario(parsed: DataFrame, calendario: DataFrame): DataFrame = {
    val cal = calendario.select(
      month(col("EndDate")).as("_mes_reuniao"),
      year(col("EndDate")).as("_ano_reuniao"),
      col("EndDate").cast("date").as("data_fim_reuniao"),
      col("ExpiryDate").cast("date").as("data_expiracao"))
    parsed.join(broadcast(cal), Seq("_mes_reuniao", "_ano_reuniao"), "left")
      .drop("_mes_reuniao", "_ano_reuniao")
      .withColumn("dias_uteis",
        bday_count(col("data_referencia"), col("data_expiracao")))
  }
}

object Probabilities {

  /** Columns of the canonical output (probabilities.py:62-77). */
  val Colunas: Seq[String] = Seq(
    "data_referencia", "data_fim_reuniao", "data_expiracao",
    "ranking_reuniao", "variacao_strike_bps", "dias_uteis", "preco_ajuste",
    "taxa_di1", "fator_desconto", "prob_bruta", "prob", "prob_acumulada")

  /** Implied probabilities for all meetings trading on the frame's date.
    *
    * @param cpm   CPM frame with data_referencia, data_expiracao,
    *              data_fim_reuniao, tipo_opcao, variacao_strike_bps,
    *              dias_uteis, preco_ajuste
    * @param taxaDi1 DI1 rate column (flat-forward to expiry); callers wire
    *              `Di1`-interpolated rates or lit(0.0) fallback
    */
  def allMeetings(cpm: DataFrame, taxaDi1: Column,
                  optionType: String = "call"): DataFrame = {
    val filtered = cpm
      .filter(col("tipo_opcao") === optionType &&
        col("preco_ajuste").isNotNull)
      .withColumn("ranking_reuniao",
        dense_rank().over(Window.orderBy(col("data_expiracao"))).cast("int"))
      .withColumn("taxa_di1", coalesce(nanvl(taxaDi1, lit(0.0)), lit(0.0)))
      .withColumn("fator_desconto",
        exp(col("dias_uteis").cast("double") / 252 * log(col("taxa_di1") + 1)))
      .withColumn("prob_bruta",
        col("preco_ajuste") * col("fator_desconto") / 100)

    val wMeeting = Window.partitionBy(col("data_expiracao"))
    val wCum = wMeeting.orderBy(col("variacao_strike_bps"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    filtered
      .withColumn("prob", col("prob_bruta") / sum(col("prob_bruta")).over(wMeeting))
      .withColumn("prob_acumulada", sum(col("prob")).over(wCum))
      .select(Colunas.map(col): _*)
      .orderBy(col("ranking_reuniao"), col("variacao_strike_bps"))
  }

  /** Single-meeting view: nearest priced meeting or an explicit expiry. */
  def meeting(all: DataFrame, expiry: Option[java.sql.Date] = None): DataFrame = {
    val target = expiry match {
      case Some(d) => Some(lit(d))
      case None =>
        // no priced contracts (reference returns an empty frame for such
        // dates) -> empty result instead of head() exploding
        all.filter(col("ranking_reuniao") === 1)
          .select(col("data_expiracao")).limit(1).collect()
          .headOption.map(r => lit(r.getDate(0)))
    }
    target match {
      case Some(t) =>
        all.filter(col("data_expiracao") === t)
          .withColumn("ranking_reuniao", lit(1).cast("int"))
      case None => all.filter(lit(false))
    }
  }
}
