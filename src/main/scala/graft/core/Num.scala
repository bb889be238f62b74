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

  /** Polars/Rust-style round: scale by 10^d in double arithmetic, round
    * ties-to-even (Math.rint), scale back. Differs from [[roundHalfEven]]
    * exactly at tie edges where the scaling multiply itself rounds (e.g.
    * 470198680.075*100 -> 47019868007.5 exactly -> ties-even up, while the
    * exact binary value sits below the tie). The reference's Series.round
    * calls follow THIS semantic; Python's round() follows roundHalfEven.
    */
  def roundPolars(x: Double, decimals: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val p = math.pow(10.0, decimals)
    Math.rint(x * p) / p
  }

  /** STN rate normalization: truncate the decimal rate at 8 places
    * (6 places in percent terms) — reference
    * /root/reference/pyield/tpf/titulos/_utils.py:195-197.
    */
  def normalizarTaxa(taxa: Double): Double = truncar(taxa, 8)
}
