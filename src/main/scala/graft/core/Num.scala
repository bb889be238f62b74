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

  /** Round-half-to-even at d places on the EXACT binary value of the
    * double — the semantics of Python's round() and of Polars/Rust
    * round_ties_even, which the reference uses for the PV rounding steps
    * (e.g. 12 dp at ntnb.py:311). Note the deliberate asymmetry with
    * [[truncar]], which operates on the shortest decimal representation.
    */
  def roundHalfEven(x: Double, decimals: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    new JBigDecimal(x).setScale(decimals, RoundingMode.HALF_EVEN).doubleValue()
  }

  /** STN rate normalization: truncate the decimal rate at 8 places
    * (6 places in percent terms) — reference
    * /root/reference/pyield/tpf/titulos/_utils.py:195-197.
    */
  def normalizarTaxa(taxa: Double): Double = truncar(taxa, 8)
}
