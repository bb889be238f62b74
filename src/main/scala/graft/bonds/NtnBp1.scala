package graft.bonds

import java.time.LocalDate
import graft.core.{BrCalendar, Num}
import graft.curve.Interpolador

/** NTN-B Principal: zero-coupon IPCA bond priced by the Tesouro Direto
  * method (D16; reference /root/reference/pyield/tpf/titulos/ntnbp.py).
  */
object NtnBp {

  /** cotacao = trunc6(1/(1+tir)^trunc14(du/252)); golden 0.77463. */
  def cotacao(liq: LocalDate, venc: LocalDate, taxaTir: Double): Double = {
    val anos = Bonds.anosTruncados(liq, venc)
    Num.truncar(1 / math.pow(1 + taxaTir, anos), 6)
  }

  /** pu = trunc6(vna * cotacao); golden 3537.761411. */
  def pu(vna: Double, cot: Double): Double = Num.truncar(vna * cot, 6)

  /** Market IRR: the flat-forward-interpolated zero at the maturity,
    * rounded at 4 places (single-flow bond → zero == IRR).
    */
  def taxa(liq: LocalDate, venc: LocalDate,
           curvaDias: Seq[Long], curvaZeros: Seq[Double]): Double = {
    val du = BrCalendar.contar(liq, venc)
    val z = new Interpolador(curvaDias, curvaZeros, "flat_forward")
      .interpolar(du)
    Num.roundHalfEven(z, 4)
  }

  /** dv01 = pu*(1 - f/f1bp); golden 1.120055806382451. */
  def dv01(liq: LocalDate, venc: LocalDate, taxaTir: Double,
           pu0: Double): Double = {
    val anos = Bonds.anosTruncados(liq, venc)
    val f = math.pow(1 + taxaTir, anos)
    val f1 = math.pow(1 + taxaTir + 0.0001, anos)
    pu0 * (1 - f / f1)
  }
}

/** NTN-B1 (Renda+/Educa+): monthly amortizing IPCA bonds, 240/60 equal
  * payments from January of the conversion year to December of maturity
  * (D16; reference /root/reference/pyield/tpf/titulos/ntnb1.py).
  */
object NtnB1 {

  sealed trait NomeComercial { def numeroAmortizacoes: Int }
  case object RendaMais extends NomeComercial { val numeroAmortizacoes = 240 }
  case object EducaMais extends NomeComercial { val numeroAmortizacoes = 60 }

  /** (amortization, final amortization): trunc8(1/n) each month and the
    * remainder at maturity so the payments sum exactly to 1.
    */
  def parametros(nome: NomeComercial): (Double, Double) = {
    val n = nome.numeroAmortizacoes
    val amort = Num.truncar(1.0 / n, 8)
    (amort, 1 - amort * (n - 1))
  }

  /** Monthly day-15 amortization dates after the settlement (ASC). */
  def datasPagamento(liq: LocalDate, venc: LocalDate,
                     nome: NomeComercial): Seq[LocalDate] = {
    require(venc.isAfter(liq), "vencimento deve ser posterior à liquidação")
    val venc15 = venc.withDayOfMonth(15)
    (0 until nome.numeroAmortizacoes)
      .map(i => Bonds.subtrairMeses(venc15, i))
      .filter(_.isAfter(liq))
      .sorted
  }

  def fluxosCaixa(liq: LocalDate, venc: LocalDate,
                  nome: NomeComercial): Seq[(LocalDate, Double)] = {
    val (amort, amortFinal) = parametros(nome)
    // the reference compares payment dates against the RAW vencimento
    // (ntnb1.py:182) while the dates themselves are day-15 normalized —
    // so a non-day-15 maturity never receives the final amortization;
    // faithfully reproduced (only day-15 maturities exist in practice)
    datasPagamento(liq, venc, nome).map { d =>
      d -> (if (d == venc) amortFinal else amort)
    }
  }

  /** TD cotacao: per-flow PV rounded 12dp on truncated year fractions,
    * sum truncated 6dp; golden 0.038332.
    */
  def cotacao(liq: LocalDate, venc: LocalDate, taxa: Double,
              nome: NomeComercial): Double = {
    val soma = fluxosCaixa(liq, venc, nome).map { case (d, v) =>
      val anos = Bonds.anosTruncados(liq, d)
      Num.roundPolars(v / math.pow(1 + taxa, anos), 12)
    }.sum
    Num.truncar(soma, 6)
  }

  /** pu = trunc6(vna*cot) — a SINGLE truncation on the product
    * (ntnb1.py:409), unlike NTN-B which truncates the inputs first
    * (ntnb.py:322-324).
    */
  def pu(vna: Double, cot: Double): Double = Num.truncar(vna * cot, 6)

  /** Macaulay duration (untruncated year fractions, trunc14 result);
    * golden 47.10494386899197.
    */
  def duration(liq: LocalDate, venc: LocalDate, taxa: Double,
               nome: NomeComercial): Double = {
    val termos = fluxosCaixa(liq, venc, nome).map { case (d, v) =>
      val anos = BrCalendar.contar(liq, d) / 252.0
      val vp = v / math.pow(1 + taxa, anos)
      (vp, vp * anos)
    }
    Num.truncar(termos.map(_._2).sum / termos.map(_._1).sum, 14)
  }

  /** dv01 via 1bp quotation reprice; golden 0.7738488291718512. */
  def dv01(liq: LocalDate, venc: LocalDate, taxa: Double, pu0: Double,
           nome: NomeComercial): Double = {
    val c1 = cotacao(liq, venc, taxa, nome)
    val c2 = cotacao(liq, venc, taxa + 0.0001, nome)
    pu0 * (1 - c2 / c1)
  }
}
