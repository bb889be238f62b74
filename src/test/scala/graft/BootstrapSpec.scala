package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.bonds.{Bonds, Bootstrap, NtnB, NtnF}
import graft.core.BrCalendar

/** Self-consistency checks on the sequential bootstraps: discounting each
  * bond's flows at the solved zero curve must reproduce the price implied
  * by its observed IRR (the defining property of a bootstrap).
  */
class BootstrapSpec extends AnyFunSuite {

  private def d(s: String) = LocalDate.parse(s)

  test("NTN-B ANBIMA bootstrap reprices every input bond") {
    val liq = d("2024-08-16")
    val vencs = Seq("2025-05-15", "2026-08-15", "2028-08-15", "2032-08-15",
      "2040-08-15", "2050-08-15", "2060-08-15").map(d)
    val tirs = Seq(0.0639, 0.0661, 0.0630, 0.0615, 0.0583, 0.0607, 0.0606)

    val curve = Bootstrap.ntnbTaxasZero(liq, vencs, tirs,
      incluirCupons = true)
    val zeroByDate = curve.map(v => v.dataVencimento -> v.taxaZero).toMap

    // first maturity: zero == IRR by definition
    assert(math.abs(zeroByDate(vencs.head) - tirs.head) < 1e-12)

    vencs.zip(tirs).foreach { case (venc, tir) =>
      val fluxos = NtnB.fluxosCaixa(liq, venc)
      val pvZeros = Bonds.calcularPv(
        fluxos.map(_._2),
        fluxos.map { case (dt, _) => zeroByDate(dt) },
        fluxos.map { case (dt, _) => BrCalendar.contar(liq, dt) / 252.0 })
      val alvo = NtnB.cotacao(liq, venc, tir)
      assert(math.abs(pvZeros - alvo) < 2e-6,
        s"$venc: $pvZeros vs $alvo") // cotacao truncates at 6 places
    }
  }

  test("NTN-F/LTN PRE bootstrap reprices every NTN-F") {
    val liq = d("2024-09-03")
    val vLtn = Seq("2025-01-01", "2025-07-01", "2026-01-01", "2026-07-01").map(d)
    val tLtn = Seq(0.1088, 0.1110, 0.1140, 0.1170)
    val vNtnf = Seq("2027-01-01", "2029-01-01", "2031-01-01", "2035-01-01").map(d)
    val tNtnf = Seq(0.1199, 0.1221, 0.1222, 0.1214)

    val curve = Bootstrap.ntnfTaxasZero(liq, vLtn, tLtn, vNtnf, tNtnf,
      incluirCupons = true)
    val zeroByDate = curve.map(v => v.dataVencimento -> v.taxaZero).toMap

    // grid dates inside the LTN range carry the LTN flat-forward zeros
    vLtn.zip(tLtn).foreach { case (v, t) =>
      assert(math.abs(zeroByDate(v) - t) < 1e-12)
    }

    // every NTN-F maturity reprices its STN PU exactly: all coupons at the
    // solved grid spots, maturity flow at its solved zero
    vNtnf.zip(tNtnf).foreach { case (venc, tir) =>
      val fluxos = NtnF.fluxosCaixa(liq, venc)
      val alvo = NtnF.pu(liq, venc, tir)
      val pvZeros = fluxos.map { case (dt, v) =>
        val du = BrCalendar.contar(liq, dt)
        v / math.pow(1 + zeroByDate(dt), du / 252.0)
      }.sum
      assert(math.abs(pvZeros - alvo) < 1e-6, s"$venc: $pvZeros vs $alvo")
    }
  }
}
