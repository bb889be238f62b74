package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.bonds.{Analytics, Vna}

class AnalyticsSpec extends AnyFunSuite {

  private def d(s: String) = LocalDate.parse(s)

  test("rentabilidade golden (ltn.py:211-217)") {
    assert(Analytics.rentabilidade(0.118746, 0.11725) == 1.0120718007994287)
  }

  test("premio_limpo golden (ntnf.py:739-751): 12.13 bps") {
    val spread = Analytics.premioLimpoNtnf(
      d("2024-08-23"), d("2035-01-01"), 0.116586,
      Seq(d("2025-01-01"), d("2030-01-01"), d("2035-01-01")),
      Seq(0.10823, 0.11594, 0.11531))
    assert(math.abs(spread * 10000 - 12.13) < 0.005,
      s"got ${spread * 10000} bps")
  }

  test("implicitas: BEI formula and first-vertex passthrough") {
    val liq = d("2026-06-19")
    val vencs = Seq(d("2026-08-15"), d("2027-05-15"), d("2028-08-15"))
    val tirs = Seq(0.1115, 0.0857, 0.0897)
    val vNom = Seq(d("2026-07-01"), d("2027-01-01"), d("2029-01-01"))
    val tNom = Seq(0.1410, 0.1440, 0.1495)
    val out = Analytics.implicitas(liq, vencs, tirs, vNom, tNom)
    assert(out.map(_.dataVencimento) == vencs)
    // first maturity: zero == TIR
    assert(math.abs(out.head.taxaZeroReal - tirs.head) < 1e-12)
    out.foreach { r =>
      val bei = (1 + r.taxaNominal) / (1 + r.taxaZeroReal) - 1
      assert(math.abs(r.inflacaoImplicita - bei) < 1e-15)
    }
  }

  test("VNA pro-rata, projection precisions and validity windows") {
    // pro-rata between published points: exponential in calendar days, trunc6
    val pontos = Seq(d("2025-12-15") -> 4570.078408,
      d("2026-01-15") -> 4585.159356)
    assert(Vna.calcularVna(pontos, d("2025-12-15")) == 4570.078408)
    // golden from the reference doctest (vna/ntnb.py:66-70)
    assert(Vna.calcularVna(pontos, d("2025-12-30")) == 4577.369436)
    assert(Vna.calcularVna(pontos, d("2024-01-01")).isNaN) // out of range

    // projection: trunc6 base, round2 pct, trunc14 exponent
    val proj = Vna.calcularVnaProjetado(4570.078408, 0.454, 10.0 / 31)
    assert(proj == Vna.aplicarVariacaoProRata(4570.078408, 0.0045, 10.0 / 31))

    // validity windows: NTN-B 15->15, NTN-C 1->1
    assert(Vna.vigencia(d("2026-02-20"), 15) == (d("2026-02-15"), d("2026-03-15")))
    assert(Vna.vigencia(d("2026-02-10"), 15) == (d("2026-01-15"), d("2026-02-15")))
    assert(Vna.vigencia(d("2026-02-10"), 1) == (d("2026-02-01"), d("2026-03-01")))
  }
}
