package graft.bonds

import java.time.LocalDate
import graft.core.BrCalendar

/** NTN-B zero curve by the Tesouro Direto forward-bootstrap method (D7;
  * reference /root/reference/pyield/tpf/titulos/_zero_td.py:16-263).
  *
  * Monthly day-15 vertices; one constant forward per bond segment,
  * calibrated by bisection so the flows discounted by the zero curve
  * reproduce the quotation implied by the bond's observed IRR. Sequential
  * single-unknown solves → stays on the driver (curve ≤ ~450 vertices).
  * Calibration uses du/252 WITHOUT truncation and unrounded PV sums
  * (deliberately different from the ANBIMA cotacao chain).
  */
object ZeroTd {

  private val DiaVencimento = 15

  case class Vertice(dataVencimento: LocalDate, diasUteis: Long,
                     taxaZero: Double, taxaForward: Double)

  private def gerarVerticesMensais(liq: LocalDate,
                                   ultimo: LocalDate): Vector[LocalDate] = {
    val ancora = Bonds.subtrairMeses(liq.withDayOfMonth(DiaVencimento), 1)
    Iterator.iterate(ancora)(d => {
      val n = d.plusMonths(1); n.withDayOfMonth(math.min(DiaVencimento, n.lengthOfMonth))
    })
      .takeWhile(!_.isAfter(ultimo))
      .filter(d => !d.isBefore(liq) && !d.isAfter(ultimo))
      .toVector
  }

  private def taxasZeroPorForwards(diasUteis: IndexedSeq[Long],
                                   fwd: IndexedSeq[Double]): Array[Double] = {
    val out = new Array[Double](diasUteis.length)
    out(0) = fwd(0)
    var i = 1
    while (i < diasUteis.length) {
      val faAcum = math.pow(1 + out(i - 1), diasUteis(i - 1) / 252.0)
      val faFwd = math.pow(1 + fwd(i),
        (diasUteis(i) - diasUteis(i - 1)) / 252.0)
      out(i) = math.pow(faAcum * faFwd, 252.0 / diasUteis(i)) - 1
      i += 1
    }
    out
  }

  /** Vertex forward = the calibrated forward of the NEXT bond maturity. */
  private def forwardsNosVertices(vertices: IndexedSeq[LocalDate],
                                  vencimentos: IndexedSeq[LocalDate],
                                  fwdTitulos: IndexedSeq[Double]): Array[Double] = {
    var j = 0
    vertices.map { v =>
      while (v.isAfter(vencimentos(j))) j += 1
      fwdTitulos(j)
    }.toArray
  }

  private def bissecao(f: Double => Double, a0: Double, b0: Double): Double = {
    val Tol = 1e-12
    var a = a0; var b = b0
    var fa = f(a)
    if (fa * f(b) > 0) return Double.NaN
    var i = 0
    while (i < 100) {
      val m = (a + b) / 2
      val fm = f(m)
      if (math.abs(fm) < Tol || (b - a) / 2 < Tol) return m
      if (fm * fa < 0) b = m else { a = m; fa = fm }
      i += 1
    }
    (a + b) / 2
  }

  private def resolverForward(erro: Double => Double, inicial: Double): Double = {
    val e0 = erro(inicial)
    if (e0 == 0) return inicial
    if (e0 > 0) {
      var hi = math.max(1.0, 2 * inicial + 0.01)
      while (erro(hi) > 0) hi = 2 * hi + 1
      bissecao(erro, inicial, hi)
    } else bissecao(erro, -0.99, inicial)
  }

  /** Full calibration. `vencimentos`/`taxasTir` need not be pre-sorted. */
  def taxasZero(liq: LocalDate, vencimentos: Seq[LocalDate],
                taxasTir: Seq[Double],
                incluirVertices: Boolean = false): Seq[Vertice] = {
    require(vencimentos.nonEmpty && vencimentos.length == taxasTir.length)
    val titulos = vencimentos.zip(taxasTir).sortBy(_._1)
    val vencs = titulos.map(_._1).toVector
    val tirs = titulos.map(_._2).toVector

    val vertices = gerarVerticesMensais(liq, vencs.last)
    val diasVertices = vertices.map(v => BrCalendar.contar(liq, v))
    val indicePorData = vertices.zipWithIndex.toMap

    val fwd = tirs.toArray // calibrated in place, seeded with the IRRs

    for (i <- vencs.indices) {
      val fluxos = NtnB.fluxosCaixa(liq, vencs(i))
      val diasFluxos = fluxos.map { case (d, _) => BrCalendar.contar(liq, d) }
      val indicesFluxos = fluxos.map { case (d, _) => indicePorData(d) }
      val cotacaoAlvo = Bonds.calcularPv(
        fluxos.map(_._2), Seq.fill(fluxos.length)(tirs(i)),
        diasFluxos.map(_ / 252.0))

      def erro(f: Double): Double = {
        fwd(i) = f
        val curvaZero = taxasZeroPorForwards(diasVertices,
          forwardsNosVertices(vertices, vencs, fwd.toIndexedSeq))
        val taxasFluxos = indicesFluxos.map(curvaZero)
        Bonds.calcularPv(fluxos.map(_._2), taxasFluxos,
          diasFluxos.map(_ / 252.0)) - cotacaoAlvo
      }

      fwd(i) = resolverForward(erro, tirs(i))
    }

    val fwdVertices = forwardsNosVertices(vertices, vencs, fwd.toIndexedSeq)
    val curvaZero = taxasZeroPorForwards(diasVertices, fwdVertices.toIndexedSeq)
    val all = vertices.indices.map(i =>
      Vertice(vertices(i), diasVertices(i), curvaZero(i), fwdVertices(i)))
    if (incluirVertices) all
    else all.filter(v => vencs.contains(v.dataVencimento))
  }
}
