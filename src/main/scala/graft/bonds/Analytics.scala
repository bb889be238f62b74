package graft.bonds

import java.time.LocalDate
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{BrCalendar, Num}
import graft.curve.Interpolador

/** Curve analytics on top of the pricing layer: breakeven inflation (D19),
  * DI premium family (D20) and VNA arithmetic (D18).
  */
object Analytics {

  case class Implicita(dataVencimento: LocalDate, diasUteis: Long,
                       taxaTirReal: Double, taxaZeroReal: Double,
                       taxaNominal: Double, inflacaoImplicita: Double)

  /** Breakeven inflation for NTN-B against a nominal reference curve:
    * real zeros via the ANBIMA bootstrap + flat-forward interpolation of
    * the nominal curve; BEI = (1+nom)/(1+real) - 1
    * (reference ntnb.py:581-701).
    */
  def implicitas(liq: LocalDate,
                 vencimentosTir: Seq[LocalDate], taxasTir: Seq[Double],
                 vencimentosNominais: Seq[LocalDate], taxasNominais: Seq[Double],
                 extrapolar: Boolean = false): Seq[Implicita] = {
    val zeros = Bootstrap.ntnbTaxasZero(liq, vencimentosTir, taxasTir)
    val interpNominal = new Interpolador(
      vencimentosNominais.map(v => BrCalendar.contar(liq, v)),
      taxasNominais, "flat_forward", extrapolar)
    val tirPorVenc = vencimentosTir.zip(taxasTir).toMap
    zeros.map { z =>
      val nominal = interpNominal(z.diasUteis)
      val bei =
        if (nominal.isNaN) Double.NaN
        else (1 + nominal) / (1 + z.taxaZero) - 1
      Implicita(z.dataVencimento, z.diasUteis,
        tirPorVenc(z.dataVencimento), z.taxaZero, nominal, bei)
    }
  }

  /** Profitability over DI: ratio of daily factors
    * (reference ltn.py:200-226; golden 1.0120718007994287).
    */
  def rentabilidade(taxaTitulo: Double, taxaDi: Double): Double = {
    val diariaTitulo = math.pow(1 + taxaTitulo, 1.0 / 252) - 1
    val diariaDi = math.pow(1 + taxaDi, 1.0 / 252) - 1
    diariaTitulo / diariaDi
  }

  /** Column form of [[rentabilidade]]. */
  def rentabilidadeExpr(taxaTitulo: Column, taxaDi: Column): Column =
    (pow(taxaTitulo + 1, 1.0 / 252) - 1) / (pow(taxaDi + 1, 1.0 / 252) - 1)

  /** Raw premium: indicative rate minus interpolated DI (decimal).
    * Relational form lives in the datasets layer (premio column =
    * taxa_indicativa - taxa_di).
    */
  def premio(taxaIndicativa: Double, taxaDi: Double): Double =
    taxaIndicativa - taxaDi

  /** Clean premium of an NTN-F over the DI curve: the constant spread p
    * solving  Σ CF/(1 + di_t + p)^t = PU(tir)  by bracket+bisection
    * (reference ntnf.py:714-795; golden 12.13 bps).
    */
  def premioLimpoNtnf(liq: LocalDate, venc: LocalDate, taxaNtnf: Double,
                      vencimentosDi: Seq[LocalDate],
                      taxasDi: Seq[Double]): Double = {
    val interp = new Interpolador(
      vencimentosDi.map(v => BrCalendar.contar(liq, v)), taxasDi,
      "flat_forward")
    val fluxos = NtnF.fluxosCaixa(liq, venc)
    if (fluxos.isEmpty) return Double.NaN
    val dias = fluxos.map { case (d, _) => BrCalendar.contar(liq, d) }
    val anos = dias.map(_ / 252.0)
    val di = dias.map(interp(_))
    val preco = NtnF.pu(liq, venc, taxaNtnf)
    def diferenca(p: Double): Double = {
      var s = 0.0
      var i = 0
      while (i < fluxos.length) {
        // flows beyond the DI curve interpolate to null in the reference
        // (Interpolador extrapolar=False) and Series.sum() SKIPS them
        // (ntnf.py:789-794) — mirror by skipping NaN rates instead of
        // poisoning the whole sum
        if (!di(i).isNaN) {
          s += fluxos(i)._2 / math.pow(1 + di(i) + p, anos(i))
        }
        i += 1
      }
      s - preco
    }
    Bonds.encontrarRaiz(diferenca)
  }
}

/** VNA arithmetic (D18; reference /root/reference/pyield/tpf/vna/_utils.py
  * and vna/{ntnb,ntnc}.py): exact published point or exponential pro-rata
  * between points, STN intermediate precisions for projections, and the
  * monthly validity windows (15→15 for NTN-B, 1→1 for NTN-C).
  */
object Vna {

  /** Decode a Tesouro VNA workbook sheet ("NTNB"/"NTNC") into published
    * (data, vna) points (reference vna/ntnb.py:18-28 `_processar` over
    * read_excel(has_header=False)): column 0 parsed as a date (non-strict),
    * column 1 as float (non-strict), null rows dropped, duplicate dates
    * keep the LAST occurrence, ascending date order.
    */
  def pontosPlanilha(xlsxBytes: Array[Byte], aba: String)
      : Seq[(LocalDate, Double)] = {
    val grid = graft.sources.Xlsx.readSheet(xlsxBytes, aba)
    val parsed = grid.flatMap { row =>
      for {
        dRaw <- row.headOption.flatten
        d <- parsearData(dRaw)
        vRaw <- row.lift(1).flatten
        v <- vRaw.toDoubleOption
      } yield (d, v)
    }
    // a non-empty sheet that parses to ZERO points means an unsupported
    // encoding (e.g. style-formatted serial-number dates, which this
    // reader does not interpret) — fail at decode time rather than
    // handing an empty curve to downstream pro-rata math
    require(grid.isEmpty || parsed.nonEmpty,
      s"sheet '$aba' has ${grid.length} rows but no (date, value) row " +
        "parsed; the workbook likely stores dates as style-formatted " +
        "serial numbers, which this reader does not interpret")
    // unique keep-last by date, then sort
    val keepLast = scala.collection.mutable.LinkedHashMap[LocalDate, Double]()
    parsed.foreach { case (d, v) => keepLast(d) = v }
    keepLast.toSeq.sortBy(_._1)
  }

  /** Non-strict date parse of the sheet's textual first column (Polars
    * str.to_datetime(strict=False): ISO date or datetime; else null).
    */
  private[bonds] def parsearData(s: String): Option[LocalDate] = {
    val t = s.trim.replace('T', ' ')
    val head = t.split(' ').headOption.getOrElse("")
    try Some(LocalDate.parse(head))
    catch { case _: java.time.format.DateTimeParseException => None }
  }

  def aplicarVariacaoProRata(vnaBase: Double, variacao: Double,
                             expoente: Double): Double = {
    require(vnaBase > 0, "O VNA-base deve ser positivo.")
    require(variacao > -1, "A variação deve ser maior que -100%.")
    Num.truncar(vnaBase * math.pow(1 + variacao, expoente), 6)
  }

  /** Published point or calendar-day exponential pro-rata, trunc6. */
  def calcularVna(pontos: Seq[(LocalDate, Double)], data: LocalDate): Double = {
    pontos.find(_._1 == data) match {
      case Some((_, v)) => v
      case None =>
        val antes = pontos.filter(_._1.isBefore(data)).sortBy(_._1).lastOption
        val depois = pontos.filter(_._1.isAfter(data)).sortBy(_._1).headOption
        (antes, depois) match {
          case (Some((d0, v0)), Some((d1, v1))) =>
            val expoente = (data.toEpochDay - d0.toEpochDay).toDouble /
              (d1.toEpochDay - d0.toEpochDay)
            aplicarVariacaoProRata(v0, v1 / v0 - 1, expoente)
          case _ => Double.NaN
        }
    }
  }

  /** STN projection precisions: trunc6 base, round2 monthly inflation,
    * trunc14 exponent.
    */
  def calcularVnaProjetado(vnaBase: Double, projecaoPercentual: Double,
                           expoente: Double): Double =
    aplicarVariacaoProRata(
      Num.truncar(vnaBase, 6),
      Num.roundHalfEven(projecaoPercentual, 2) / 100,
      Num.truncar(expoente, 14))

  /** Monthly validity window containing `data`, anchored on `diaInicio`
    * (15 for NTN-B, 1 for NTN-C).
    */
  def vigencia(data: LocalDate, diaInicio: Int): (LocalDate, LocalDate) = {
    if (data.getDayOfMonth >= diaInicio) {
      val inicio = data.withDayOfMonth(diaInicio)
      (inicio, inicio.plusMonths(1).withDayOfMonth(diaInicio))
    } else {
      val fim = data.withDayOfMonth(diaInicio)
      (fim.minusMonths(1).withDayOfMonth(diaInicio), fim)
    }
  }
}
