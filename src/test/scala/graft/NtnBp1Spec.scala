package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.bonds.{NtnB1, NtnBp}

/** NTN-B Principal / NTN-B1 goldens from the reference doctests. */
class NtnBp1Spec extends AnyFunSuite {

  private def d(s: String) = LocalDate.parse(s)

  test("NTN-B Principal cotacao/pu/dv01 goldens (ntnbp.py:30-56,141-145)") {
    val cot = NtnBp.cotacao(d("2025-12-02"), d("2029-05-15"), 0.0777)
    assert(cot == 0.77463)
    val pu = NtnBp.pu(4567.033825, cot)
    assert(pu == 3537.761411)
    assert(NtnBp.dv01(d("2025-12-02"), d("2029-05-15"), 0.0777, pu)
      == 1.120055806382451)
  }

  test("NTN-B1 schedule golden (ntnb1.py:75-118): Renda+ 240 payments") {
    val datas = NtnB1.datasPagamento(d("2024-05-10"), d("2050-12-15"),
      NtnB1.RendaMais)
    assert(datas.length == 240)
    assert(datas.head == d("2031-01-15") && datas.last == d("2050-12-15"))
  }

  test("NTN-B1 flows: trunc8 amortization + exact-sum remainder") {
    val fluxos = NtnB1.fluxosCaixa(d("2024-05-10"), d("2060-12-15"),
      NtnB1.RendaMais)
    assert(fluxos.length == 240)
    assert(fluxos.head._2 == 0.00416666)
    assert(math.abs(fluxos.map(_._2).sum - 1.0) < 1e-12)
    assert(fluxos.last._2 > fluxos.head._2) // remainder at maturity
  }

  test("NTN-B1 cotacao/duration/dv01 goldens (ntnb1.py:210-215,431-436,473-478)") {
    assert(NtnB1.cotacao(d("2025-06-18"), d("2084-12-15"), 0.07010,
      NtnB1.RendaMais) == 0.038332)
    // 1 ulp at the 14th decimal: Polars sums the 240 PVs pairwise, the
    // Scala fold sequentially, and trunc14 sits on the boundary digit
    assert(math.abs(NtnB1.duration(d("2025-06-23"), d("2084-12-15"), 0.0686,
      NtnB1.RendaMais) - 47.10494386899197) < 1e-13)
    val cot = NtnB1.cotacao(d("2025-06-23"), d("2084-12-15"), 0.0686,
      NtnB1.RendaMais)
    val pu = NtnB1.pu(4299.160173, cot)
    assert(NtnB1.dv01(d("2025-06-23"), d("2084-12-15"), 0.0686, pu,
      NtnB1.RendaMais) == 0.7738488291718512)
  }
}
