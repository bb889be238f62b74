package graft.core

import java.time.LocalDate
import java.util.Arrays

/** Brazilian business-day calendar with the dual holiday regime.
  *
  * Semantics follow the reference toolkit's business-day layer
  * (see /root/reference/pyield/du/core.py:20-25,89-220 and
  * /root/reference/pyield/du/feriados/feriados_br.py:10-72):
  *
  *   - Two national holiday lists exist: the "old" regime (valid for dates
  *     strictly before 2023-12-26) and the "new" regime (2023-12-26 onward,
  *     which adds the Zumbi national holiday on Nov 20). The regime is chosen
  *     PER ROW from the anchor date (`inicio` for counts, the date itself for
  *     shifts/predicates).
  *   - `contar(start, end)`: business days in [start, end) — start inclusive,
  *     end exclusive; negative when start > end.
  *   - `deslocar(date, n, rollForward)`: roll a non-business date to the
  *     next/previous business day, then step n business days.
  *   - Weekends are never business days in either regime.
  *
  * All hot-path methods operate on epoch-day Ints (Spark's internal DateType
  * representation) so Catalyst expressions can call them directly from
  * generated code. Holiday lists ship as classpath resources (public ANBIMA
  * data) and are loaded once per JVM — on a cluster the jar carries them to
  * every executor, no broadcast needed.
  */
object BrCalendar {

  /** First date (inclusive) on which the new holiday list applies. */
  val TransitionEpochDay: Int = LocalDate.of(2023, 12, 26).toEpochDay.toInt

  private def loadHolidays(resource: String): Array[Int] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing holiday resource $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val fmt = java.time.format.DateTimeFormatter.ofPattern("dd/MM/yyyy")
      src.getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map(l => LocalDate.parse(l, fmt).toEpochDay.toInt)
        .toArray.distinct.sorted // source data repeats 21/04/2079; counting
                                 // needs unique sorted days
    } finally src.close()
  }

  /** All holidays (sorted epoch days), including ones falling on weekends. */
  val holidaysOld: Array[Int] = loadHolidays("/graft/feriados_antigos_br.txt")
  val holidaysNew: Array[Int] = loadHolidays("/graft/feriados_novos_br.txt")

  /** Weekday-only holiday lists: for business-day counting, holidays on
    * weekends must not be double-subtracted.
    */
  private val weekdayHolidaysOld: Array[Int] = holidaysOld.filter(isWeekday)
  private val weekdayHolidaysNew: Array[Int] = holidaysNew.filter(isWeekday)

  /** 0=Mon .. 6=Sun. Epoch day 0 (1970-01-01) was a Thursday. */
  @inline def dayOfWeek(epochDay: Int): Int = Math.floorMod(epochDay + 3, 7)

  @inline def isWeekday(epochDay: Int): Boolean = dayOfWeek(epochDay) < 5

  /** Holiday array for the regime governing `anchorEpochDay`. */
  @inline def regimeHolidays(anchorEpochDay: Int): Array[Int] =
    if (anchorEpochDay < TransitionEpochDay) holidaysOld else holidaysNew

  @inline private def regimeWeekdayHolidays(anchor: Int): Array[Int] =
    if (anchor < TransitionEpochDay) weekdayHolidaysOld else weekdayHolidaysNew

  /** Count of weekdays in [start, end); requires start <= end. */
  private def weekdaysIn(start: Int, end: Int): Int = {
    val n = end - start
    if (n <= 0) return 0
    var count = (n / 7) * 5
    var d = start + (n / 7) * 7
    while (d < end) {
      if (isWeekday(d)) count += 1
      d += 1
    }
    count
  }

  /** Number of values in sorted `arr` that fall in [lo, hi). */
  private def countInRange(arr: Array[Int], lo: Int, hi: Int): Int = {
    if (hi <= lo) return 0
    lowerBound(arr, hi) - lowerBound(arr, lo)
  }

  /** Index of first element >= key in sorted arr. */
  private def lowerBound(arr: Array[Int], key: Int): Int = {
    val i = Arrays.binarySearch(arr, key)
    if (i >= 0) {
      // binarySearch gives an arbitrary match; holiday lists are unique so
      // the hit is exact.
      i
    } else -(i + 1)
  }

  /** Business days in [start, end); negative when start > end.
    * Holiday regime chosen from `start` (the row's anchor), matching the
    * reference's per-row `_expressao_feriados`.
    */
  def contar(startEpochDay: Int, endEpochDay: Int): Long = {
    val hol = regimeWeekdayHolidays(startEpochDay)
    if (startEpochDay <= endEpochDay)
      (weekdaysIn(startEpochDay, endEpochDay)
        - countInRange(hol, startEpochDay, endEpochDay)).toLong
    else
      -(weekdaysIn(endEpochDay, startEpochDay)
        - countInRange(hol, endEpochDay, startEpochDay)).toLong
  }

  def contar(start: LocalDate, end: LocalDate): Long =
    contar(start.toEpochDay.toInt, end.toEpochDay.toInt)

  /** Is `epochDay` a business day under ITS OWN date's regime? */
  def ehDiaUtil(epochDay: Int): Boolean = {
    isWeekday(epochDay) && {
      val hol = regimeHolidays(epochDay)
      Arrays.binarySearch(hol, epochDay) < 0
    }
  }

  def ehDiaUtil(d: LocalDate): Boolean = ehDiaUtil(d.toEpochDay.toInt)

  /** Is `epochDay` a business day under the regime of `anchor`? (used inside
    * deslocar, where the whole operation runs under the original date's list)
    */
  private def isBdayUnder(epochDay: Int, hol: Array[Int]): Boolean =
    isWeekday(epochDay) && Arrays.binarySearch(hol, epochDay) < 0

  /** Roll to nearest business day in `direction` (+1/-1) if not already one,
    * then add n business days (sign of n gives direction of the walk).
    */
  def deslocar(epochDay: Int, n: Int, rollForward: Boolean): Int = {
    val hol = regimeHolidays(epochDay)
    var d = epochDay
    val rollStep = if (rollForward) 1 else -1
    while (!isBdayUnder(d, hol)) d += rollStep
    var remaining = math.abs(n)
    val step = Integer.signum(n)
    while (remaining > 0) {
      d += step
      while (!isBdayUnder(d, hol)) d += step
      remaining -= 1
    }
    d
  }

  def deslocar(date: LocalDate, n: Int, rollForward: Boolean = true): LocalDate =
    LocalDate.ofEpochDay(deslocar(date.toEpochDay.toInt, n, rollForward).toLong)

  /** Business days in [start, end] with configurable interval closure,
    * under a single regime list chosen by `start` when `regime="inferir"`.
    * Mirrors `du.gerar` (/root/reference/pyield/du/core.py:499-556).
    */
  def gerar(start: LocalDate, end: LocalDate,
            closed: String = "both", regime: String = "novo"): Seq[LocalDate] = {
    val s = start.toEpochDay.toInt
    val e = end.toEpochDay.toInt
    val hol: Array[Int] = regime match {
      case "antigo"  => holidaysOld
      case "novo"    => holidaysNew
      case "inferir" => regimeHolidays(s)
      case other     => throw new IllegalArgumentException(s"regime: $other")
    }
    val lo = closed match { case "both" | "left"  => s; case _ => s + 1 }
    val hi = closed match { case "both" | "right" => e; case _ => e - 1 }
    (lo to hi).iterator
      .filter(d => isBdayUnder(d, hol))
      .map(d => LocalDate.ofEpochDay(d.toLong))
      .toSeq
  }

  /** Today in America/Sao_Paulo rolled backward to a business day
    * (reference: pyield/du/core.py:682-701, pyield/relogio.py:17-35).
    * Wall-clock stays driver-side, independent of the Spark session TZ.
    */
  def ultimoDiaUtil(): LocalDate = {
    val hoje = LocalDate.now(java.time.ZoneId.of("America/Sao_Paulo"))
    deslocar(hoje, 0, rollForward = false)
  }
}
