package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.bonds.ZeroTd

/** TD-method zero-curve calibration must reproduce the Tesouro Direto
  * "Curva Zero" sheet values to 1e-8 (reference tests/tpf/test_ntnb.py:11-135).
  */
class ZeroTdSpec extends AnyFunSuite {

  private def d(s: String) = LocalDate.parse(s)

  private val liq = d("2026-07-13")
  private val vencimentos = Seq(
    "2026-08-15", "2027-05-15", "2028-08-15", "2029-05-15", "2030-08-15",
    "2031-05-15", "2032-08-15", "2033-05-15", "2035-05-15", "2037-05-15",
    "2040-08-15", "2045-05-15", "2050-08-15", "2055-05-15", "2060-08-15").map(d)
  private val tirs = Seq(0.1167, 0.0844, 0.0853, 0.0832, 0.0832, 0.0822,
    0.0816, 0.0809, 0.0799, 0.0787, 0.0771, 0.0753, 0.0748, 0.0741, 0.0740)

  private val zerosPlanilha = Seq(
    0.11669999999923197, 0.08432556565343718, 0.0852576487182215,
    0.08306374259814908, 0.0830739926717361, 0.08198625118890712,
    0.08130205887845499, 0.08050949086848868, 0.07934027697049251,
    0.07782879514830321, 0.07568300268997708, 0.07307847693229963,
    0.07245435891438645, 0.07110155760681147, 0.0710829915123008)
  private val forwardsPlanilha = Seq(
    0.11669999999922916, 0.08002323895627329, 0.08587948250549778,
    0.07682830620923183, 0.08309713730298153, 0.0760231708121404,
    0.07870478409822645, 0.07405926064065749, 0.075333807599243515,
    0.071177613235201516, 0.06859414142571751, 0.06536577256663077,
    0.07021764042199136, 0.064262548851535373, 0.070981172708711196)

  test("monthly vertex generation (test_gerar_vertices_mensais)") {
    def vs(liq: String) = ZeroTd.taxasZero(d(liq), Seq(d("2026-09-15")),
      Seq(0.1), incluirVertices = true).map(_.dataVencimento)
    assert(vs("2026-07-13") == Seq(d("2026-07-15"), d("2026-08-15"), d("2026-09-15")))
    assert(vs("2026-07-15") == Seq(d("2026-07-15"), d("2026-08-15"), d("2026-09-15")))
    assert(vs("2026-07-16") == Seq(d("2026-08-15"), d("2026-09-15")))
  }

  test("TD calibration reproduces the Curva Zero sheet to 1e-8") {
    val got = ZeroTd.taxasZero(liq, vencimentos, tirs)
    assert(got.map(_.dataVencimento) == vencimentos)
    got.zip(zerosPlanilha).foreach { case (v, want) =>
      assert(math.abs(v.taxaZero - want) < 1e-8,
        s"${v.dataVencimento}: ${v.taxaZero} vs $want")
    }
    got.zip(forwardsPlanilha).foreach { case (v, want) =>
      assert(math.abs(v.taxaForward - want) < 1e-8,
        s"fwd ${v.dataVencimento}: ${v.taxaForward} vs $want")
    }
  }
}
