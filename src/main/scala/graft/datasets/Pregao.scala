package graft.datasets

import java.time.{LocalDate, LocalTime, ZonedDateTime, ZoneId}
import graft.core.BrCalendar

/** B3 trading-session validation (reference
  * /root/reference/pyield/b3/_validar_pregao.py): a reference date is
  * queryable when it is a Brazilian business day, not in the future, and
  * not one of the special session closures (Christmas Eve and New Year's
  * Eve have no pregão). Intraday data additionally requires the 15-minute
  * feed delay to have elapsed (09:16 BRT).
  *
  * The clock is injectable so callers (and specs) stay deterministic; the
  * default is the B3 wall clock (America/Sao_Paulo).
  */
object Pregao {

  val Brt: ZoneId = ZoneId.of("America/Sao_Paulo")

  /** Session opens 09:00; intraday data lags 15 min + 1 min safety. */
  val HoraInicioIntradia: LocalTime = LocalTime.of(9, 16)

  def dataNegociacaoValida(data: LocalDate,
                           hoje: LocalDate = LocalDate.now(Brt)): Boolean = {
    if (data.isAfter(hoje)) return false
    if (!BrCalendar.ehDiaUtil(data)) return false
    // no pregão on Christmas Eve / New Year's Eve
    val fechadas = Set(
      LocalDate.of(data.getYear, 12, 24),
      LocalDate.of(data.getYear, 12, 31))
    !fechadas.contains(data)
  }

  def intradiaDisponivel(agora: ZonedDateTime = ZonedDateTime.now(Brt))
      : Boolean = {
    val brt = agora.withZoneSameInstant(Brt)
    dataNegociacaoValida(brt.toLocalDate, hoje = brt.toLocalDate) &&
      !brt.toLocalTime.isBefore(HoraInicioIntradia)
  }
}
