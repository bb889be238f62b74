package graft.bonds

import java.time.LocalDate
import graft.core.{BrCalendar, Num}

/** STN-exact bond math: cash-flow schedules, present value, root finding
  * and pricing for the LTN / NTN-F / NTN-B / NTN-C / LFT families.
  *
  * These are driver-side scalar operators (curves and flow schedules are
  * tiny); the distributed path wraps them as row-wise UDFs in
  * [[BondColumns]], mirroring the reference's struct.map_elements usage
  * (/root/reference/pyield/tpf/titulos/_utils.py:168-186).
  *
  * Truncation/rounding chains follow the STN methodology exactly as pinned
  * by the reference doctests:
  *   - rates normalized by truncation at 8 decimals (_utils.py:195-197)
  *   - year fractions truncated at 14 decimals
  *   - per-flow PVs rounded (12 dp NTN-B, 9 dp NTN-F)
  *   - prices/quotes truncated at 6 decimals
  */
object Bonds {

  // ------------------------------------------------------------- schedules

  /** Subtract months preserving the day (reference _utils.py:133-138). */
  def subtrairMeses(data: LocalDate, meses: Int): LocalDate = {
    var mes = data.getMonthValue - meses
    val ano = data.getYear + (mes - 1) / 12 + (if ((mes - 1) % 12 < 0) -1 else 0)
    mes = (mes - 1) % 12 + 1
    if (mes <= 0) mes += 12
    LocalDate.of(ano, mes, data.getDayOfMonth)
  }

  /** Payment dates between start (exclusive) and end (inclusive), stepping
    * back `intervaloMeses` months from the maturity
    * (reference _utils.py:141-165).
    */
  def gerarDatasPagamento(inicio: LocalDate, fim: LocalDate,
                          intervaloMeses: Int = 6): Seq[LocalDate] = {
    require(intervaloMeses > 0)
    val out = scala.collection.mutable.ArrayBuffer[LocalDate]()
    var d = fim
    while (d.isAfter(inicio)) {
      out += d
      d = subtrairMeses(d, intervaloMeses)
    }
    out.sorted.toSeq
  }

  /** (paymentDate, amount) flows: coupon every semester, principal+coupon
    * at maturity.
    */
  def fluxosCaixa(liquidacao: LocalDate, vencimento: LocalDate,
                  valorCupom: Double, valorFinal: Double): Seq[(LocalDate, Double)] =
    gerarDatasPagamento(liquidacao, vencimento).map { d =>
      d -> (if (d == vencimento) valorFinal else valorCupom)
    }

  // ---------------------------------------------------------- PV and roots

  /** Strict present value: Σ CF/(1+r)^t; NaN if any element is NaN, 0.0 for
    * empty inputs (reference _utils.py:200-259).
    */
  def calcularPv(fluxos: Seq[Double], taxas: Seq[Double],
                 prazos: Seq[Double]): Double = {
    require(fluxos.length == taxas.length && taxas.length == prazos.length)
    if (fluxos.isEmpty) return 0.0
    var sum = 0.0
    var i = 0
    while (i < fluxos.length) {
      val vp = fluxos(i) / math.pow(1 + taxas(i), prazos(i))
      if (vp.isNaN) return Double.NaN
      sum += vp
      i += 1
    }
    sum
  }

  /** Bracket search (growth 1.6, rate in [-1, 10]) + bisection
    * (tol 1e-12, 100 iters) — reference _utils.py:262-348.
    */
  def encontrarRaiz(f: Double => Double): Double = {
    val taxaInicial = 0.01
    val passo = 0.01
    val fator = 1.6
    val maxTent = 100
    val (taxaMin, taxaMax) = (-1.0, 10.0)

    val f0 = f(taxaInicial)
    if (math.abs(f0) == 0) return taxaInicial

    var interval: Option[(Double, Double)] = None
    var a = taxaInicial; var fa = f0
    var b = taxaInicial + passo
    var passoAtual = passo
    var i = 0
    while (interval.isEmpty && i < maxTent && b <= taxaMax) {
      val fb = f(b)
      if (fa * fb < 0) interval = Some((a, b))
      else { a = b; fa = fb; passoAtual *= fator; b += passoAtual }
      i += 1
    }
    if (interval.isEmpty) {
      a = taxaInicial; fa = f0
      b = taxaInicial - passo
      passoAtual = passo
      i = 0
      while (interval.isEmpty && i < maxTent && b >= taxaMin) {
        val fb = f(b)
        if (fa * fb < 0) interval = Some((b, a))
        else { a = b; fa = fb; passoAtual *= fator; b -= passoAtual }
        i += 1
      }
    }

    interval match {
      case None => Double.NaN
      case Some((lo0, hi0)) =>
        val Tol = 1e-12
        var lo = lo0; var hi = hi0
        var flo = f(lo)
        var it = 0
        var res = Double.NaN
        while (it < 100 && res.isNaN) {
          val mid = (lo + hi) / 2
          val fm = f(mid)
          if (math.abs(fm) < Tol || (hi - lo) / 2 < Tol) res = mid
          else if (fm * flo < 0) hi = mid
          else { lo = mid; flo = fm }
          it += 1
        }
        if (res.isNaN) (lo + hi) / 2 else res
    }
  }

  /** Truncated year fraction trunc14(du/252). */
  def anosTruncados(liq: LocalDate, venc: LocalDate): Double =
    Num.truncar(BrCalendar.contar(liq, venc) / 252.0, 14)
}

/** LTN: zero-coupon, face 1000 (reference ltn.py). */
object Ltn {
  val ValorFace = 1000.0

  /** PU = trunc6(1000/(1+r)^trunc14(du/252)); golden ltn.py:135-142. */
  def pu(liq: LocalDate, venc: LocalDate, taxa: Double): Double = {
    val t = Num.normalizarTaxa(taxa)
    val anos = Bonds.anosTruncados(liq, venc)
    Num.truncar(ValorFace / math.pow(1 + t, anos), 6)
  }

  /** Algebraic inverse: trunc8((1000/pu)^(1/anos) - 1); ltn.py:158-197. */
  def taxa(liq: LocalDate, venc: LocalDate, precoUnitario: Double): Double = {
    if (precoUnitario <= 0) return Double.NaN
    val anos = Bonds.anosTruncados(liq, venc)
    Num.truncar(math.pow(ValorFace / precoUnitario, 1 / anos) - 1, 8)
  }

  /** Macaulay duration of a zero = year fraction to maturity. */
  def duration(liq: LocalDate, venc: LocalDate): Double =
    BrCalendar.contar(liq, venc) / 252.0

  /** DV01 via 1bp reprice of the truncated PU; ltn.py:251-290. */
  def dv01(liq: LocalDate, venc: LocalDate, taxa0: Double, pu0: Double): Double = {
    val t = Num.normalizarTaxa(taxa0)
    val t1 = Num.roundHalfEven(t + 0.0001, 8)
    val anos = Bonds.anosTruncados(liq, venc)
    val p1 = Num.truncar(ValorFace / math.pow(1 + t, anos), 6)
    val p2 = Num.truncar(ValorFace / math.pow(1 + t1, anos), 6)
    pu0 * (1 - p2 / p1)
  }
}

/** NTN-F: 10% a.a. semiannual coupon, face 1000 (reference ntnf.py). */
object NtnF {
  val ValorFace = 1000.0
  val ValorCupom = 48.80885       // round(1000*((1.10)^0.5 - 1), 5)
  val ValorFinal = 1048.80885

  def fluxosCaixa(liq: LocalDate, venc: LocalDate): Seq[(LocalDate, Double)] =
    Bonds.fluxosCaixa(liq, venc, ValorCupom, ValorFinal)

  /** PU: per-flow PV rounded 9dp, sum truncated 6dp; ntnf.py:285-339. */
  def pu(liq: LocalDate, venc: LocalDate, taxa0: Double): Double = {
    val t = Num.normalizarTaxa(taxa0)
    val fluxos = fluxosCaixa(liq, venc)
    if (fluxos.isEmpty) return Double.NaN
    val soma = fluxos.map { case (d, v) =>
      val anos = Bonds.anosTruncados(liq, d)
      Num.roundPolars(v / math.pow(1 + t, anos), 9)
    }.sum
    Num.truncar(soma, 6)
  }

  /** TIR via bracket+bisection, truncated 8dp; ntnf.py:979-1018. */
  def taxa(liq: LocalDate, venc: LocalDate, pu0: Double): Double = {
    if (pu0 <= 0) return Double.NaN
    Num.truncar(Bonds.encontrarRaiz(t => pu(liq, venc, t) - pu0), 8)
  }

  /** Macaulay duration — returned RAW (ntnf.py:867 has no truncar,
    * unlike NTN-B's trunc14 at ntnb.py:747).
    */
  def duration(liq: LocalDate, venc: LocalDate, taxa0: Double): Double = {
    val fluxos = fluxosCaixa(liq, venc)
    if (fluxos.isEmpty) return Double.NaN
    val termos = fluxos.map { case (d, v) =>
      val anos = BrCalendar.contar(liq, d) / 252.0
      val vp = v / math.pow(1 + taxa0, anos)
      (vp, vp * anos)
    }
    termos.map(_._2).sum / termos.map(_._1).sum
  }

  def dv01(liq: LocalDate, venc: LocalDate, taxa0: Double, pu0: Double): Double = {
    val t = Num.normalizarTaxa(taxa0)
    val t1 = Num.roundHalfEven(t + 0.0001, 8)
    val p1 = pu(liq, venc, t)
    val p2 = pu(liq, venc, t1)
    pu0 * (1 - p2 / p1)
  }
}

/** NTN-B: IPCA-linked, 6% a.a. semiannual coupon in base-1 quotation
  * (reference ntnb.py).
  */
object NtnB {
  val ValorCupom = 0.02956301     // round((1.06)^0.5 - 1, 8)
  val ValorFinal = 1.02956301

  def fluxosCaixa(liq: LocalDate, venc: LocalDate): Seq[(LocalDate, Double)] =
    Bonds.fluxosCaixa(liq, venc, ValorCupom, ValorFinal)

  /** Quotation factor: per-flow PV rounded 12dp, sum truncated 6dp;
    * goldens ntnb.py:285-296.
    */
  def cotacao(liq: LocalDate, venc: LocalDate, taxa0: Double): Double = {
    val t = Num.normalizarTaxa(taxa0)
    val fluxos = fluxosCaixa(liq, venc)
    if (fluxos.isEmpty) return Double.NaN
    val soma = fluxos.map { case (d, v) =>
      val anos = Bonds.anosTruncados(liq, d)
      Num.roundPolars(v / math.pow(1 + t, anos), 12)
    }.sum
    Num.truncar(soma, 6)
  }

  /** PU = trunc6(trunc6(vna) * trunc6(cot)); ntnb.py:317-355. */
  def pu(vna: Double, cot: Double): Double =
    Num.truncar(Num.truncar(vna, 6) * Num.truncar(cot, 6), 6)

  /** TIR via root find on the pu chain; ntnb.py:860-904. */
  def taxa(liq: LocalDate, venc: LocalDate, vna: Double, pu0: Double): Double = {
    if (pu0 <= 0) return Double.NaN
    Num.truncar(
      Bonds.encontrarRaiz(t => pu(vna, cotacao(liq, venc, t)) - pu0), 8)
  }

  /** Macaulay duration, trunc14; golden ntnb.py:704-735. */
  def duration(liq: LocalDate, venc: LocalDate, taxa0: Double): Double = {
    val fluxos = fluxosCaixa(liq, venc)
    if (fluxos.isEmpty) return Double.NaN
    val termos = fluxos.map { case (d, v) =>
      val anos = BrCalendar.contar(liq, d) / 252.0
      val vp = v / math.pow(1 + taxa0, anos)
      (vp, vp * anos)
    }
    Num.truncar(termos.map(_._2).sum / termos.map(_._1).sum, 14)
  }

  /** DV01 via 1bp quotation reprice; golden ntnb.py:785-812. */
  def dv01(liq: LocalDate, venc: LocalDate, taxa0: Double, pu0: Double): Double = {
    val t = Num.normalizarTaxa(taxa0)
    val t1 = Num.roundHalfEven(t + 0.0001, 8)
    val c1 = cotacao(liq, venc, t)
    val c2 = cotacao(liq, venc, t1)
    pu0 * (1 - c2 / c1)
  }
}

/** NTN-C: IGP-M linked; 12% a.a. coupon for the 2031 maturity, 6% for the
  * rest (reference ntnc.py:15-40).
  */
object NtnC {
  val ValorCupom2031 = 0.05830052
  val ValorFinal2031 = 1.05830052
  val ValorCupom = 0.02956301
  val ValorFinal = 1.02956301

  private def cupons(venc: LocalDate): (Double, Double) =
    if (venc.getYear == 2031) (ValorCupom2031, ValorFinal2031)
    else (ValorCupom, ValorFinal)

  def cotacao(liq: LocalDate, venc: LocalDate, taxa0: Double): Double = {
    val t = Num.normalizarTaxa(taxa0)
    val (vc, vf) = cupons(venc)
    val fluxos = Bonds.fluxosCaixa(liq, venc, vc, vf)
    if (fluxos.isEmpty) return Double.NaN
    val soma = fluxos.map { case (d, v) =>
      val anos = Bonds.anosTruncados(liq, d)
      Num.roundPolars(v / math.pow(1 + t, anos), 12)
    }.sum
    Num.truncar(soma, 6)
  }

  def pu(vna: Double, cot: Double): Double = NtnB.pu(vna, cot)
}

/** LFT: SELIC floater priced as a discount/premium quotation
  * (reference lft.py).
  */
object Lft {

  /** Profitability over DI: (f_lft*f_di - 1)/(f_di - 1) with daily factors
    * (lft.py:207-232; golden 1.008594331960501). Note the DIFFERENT
    * formula from the prefixed families' daily-rate ratio.
    */
  def rentabilidade(taxaLft: Double, taxaDi: Double): Double = {
    val fatorLft = math.pow(taxaLft + 1, 1.0 / 252)
    val fatorDi = math.pow(taxaDi + 1, 1.0 / 252)
    (fatorLft * fatorDi - 1) / (fatorDi - 1)
  }
  /** cotacao = trunc6(1/(1+r)^trunc14(du/252)); goldens lft.py:131-147. */
  def cotacao(liq: LocalDate, venc: LocalDate, taxa0: Double): Double = {
    val t = Num.normalizarTaxa(taxa0)
    val anos = Bonds.anosTruncados(liq, venc)
    Num.truncar(1 / math.pow(1 + t, anos), 6)
  }

  def pu(vna: Double, cot: Double): Double =
    Num.truncar(Num.truncar(vna, 6) * Num.truncar(cot, 6), 6)

  /** Implied rate via root find; goldens lft.py:187-194. */
  def taxa(liq: LocalDate, venc: LocalDate, vna: Double, pu0: Double): Double = {
    if (pu0 <= 0) return Double.NaN
    Num.truncar(
      Bonds.encontrarRaiz(t => pu(vna, cotacao(liq, venc, t)) - pu0), 8)
  }
}
