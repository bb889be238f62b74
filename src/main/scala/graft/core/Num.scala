package graft.core

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Numeric helpers matching the reference's STN conventions.
  *
  * `truncar` is truncation toward zero at d decimal places operating on the
  * double's shortest decimal representation (so 8.2 truncated at 3 stays 8.2)
  * — the oracle is /root/reference/pyield/_internal/numbers.py:15-45 and the
  * STN goldens pinned in the bond-pricing doctests
  * (e.g. /root/reference/pyield/tpf/titulos/ltn.py:135-155).
  */
object Num {

  def truncar(x: Double, decimals: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    // JBigDecimal.valueOf goes through Double.toString (shortest repr).
    JBigDecimal.valueOf(x).setScale(decimals, RoundingMode.DOWN).doubleValue()
  }

  /** Round half away from zero at d places (Polars/Python-style `round` is
    * half-to-even on the decimal repr; Polars `Series.round` uses
    * half-away-from-zero on the shortest repr — the reference's pinned
    * goldens (PV rounded to 12 dp, ntnb.py:311) are reproduced by
    * HALF_EVEN on the shortest decimal representation, same as Python's
    * round(). Use roundHalfEven for parity.
    */
  def roundHalfEven(x: Double, decimals: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    JBigDecimal.valueOf(x).setScale(decimals, RoundingMode.HALF_EVEN).doubleValue()
  }

  /** STN rate normalization: truncate the decimal rate at 8 places
    * (6 places in percent terms) — reference
    * /root/reference/pyield/tpf/titulos/_utils.py:195-197.
    */
  def normalizarTaxa(taxa: Double): Double = truncar(taxa, 8)
}
