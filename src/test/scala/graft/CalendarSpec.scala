package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{BrCalendar, Num}

/** Golden tests transcribed from the reference's executable doctests
  * (/root/reference/pyield/du/core.py:143-206,383-478 and
  * /root/reference/pyield/_internal/numbers.py:27-37).
  */
class CalendarSpec extends AnyFunSuite {

  private def d(s: String): LocalDate = LocalDate.parse(s)

  test("contar basics (du.contar doctests)") {
    assert(BrCalendar.contar(d("2023-12-15"), d("2024-01-01")) == 10L)
    assert(BrCalendar.contar(d("2024-01-01"), d("2024-01-05")) == 3L)
    assert(BrCalendar.contar(d("2024-02-09"), d("2024-02-12")) == 1L)
    assert(BrCalendar.contar(d("2024-01-01"), d("2024-02-01")) == 22L)
    assert(BrCalendar.contar(d("2024-01-01"), d("2024-03-01")) == 41L)
    assert(BrCalendar.contar(d("2024-02-01"), d("2024-03-01")) == 19L)
    assert(BrCalendar.contar(d("2024-01-01"), d("2025-01-01")) == 253L)
    assert(BrCalendar.contar(d("2024-02-01"), d("2025-01-01")) == 231L)
    assert(BrCalendar.contar(d("2024-03-01"), d("2025-01-01")) == 212L)
    assert(BrCalendar.contar(d("2024-01-01"), d("2024-12-31")) == 252L)
    assert(BrCalendar.contar(d("2024-02-09"), d("2024-12-31")) == 224L)
  }

  test("contar negative when start > end") {
    assert(BrCalendar.contar(d("2023-01-08"), d("2023-01-01")) == -5L)
  }

  test("dual holiday regime: Zumbi (Nov 20) only under new list") {
    assert(BrCalendar.contar(d("2020-11-20"), d("2020-11-21")) == 1L)
    assert(BrCalendar.contar(d("2024-11-20"), d("2024-11-21")) == 0L)
  }

  test("eh_dia_util doctests") {
    assert(!BrCalendar.ehDiaUtil(d("2023-12-25"))) // Natal, old regime
    assert(!BrCalendar.ehDiaUtil(d("2024-11-20"))) // Zumbi, new regime
    assert(BrCalendar.ehDiaUtil(d("2023-12-22")))
    assert(BrCalendar.ehDiaUtil(d("2023-12-26")))
    assert(BrCalendar.ehDiaUtil(d("2023-12-26")))
  }

  test("deslocar doctests") {
    assert(BrCalendar.deslocar(d("2020-11-20"), 0) == d("2020-11-20"))
    assert(BrCalendar.deslocar(d("2024-11-20"), 0) == d("2024-11-21"))
    assert(BrCalendar.deslocar(d("2023-12-23"), 0) == d("2023-12-26"))
    assert(BrCalendar.deslocar(d("2023-12-22"), 0) == d("2023-12-22"))
    assert(BrCalendar.deslocar(d("2023-12-22"), 0, rollForward = false) == d("2023-12-22"))
    assert(BrCalendar.deslocar(d("2023-12-23"), 0, rollForward = false) == d("2023-12-22"))
    assert(BrCalendar.deslocar(d("2024-09-27"), 1) == d("2024-09-30"))
    assert(BrCalendar.deslocar(d("2024-09-28"), 1) == d("2024-10-01"))
    assert(BrCalendar.deslocar(d("2024-09-27"), -1, rollForward = false) == d("2024-09-26"))
    assert(BrCalendar.deslocar(d("2024-09-28"), -1, rollForward = false) == d("2024-09-26"))
    assert(BrCalendar.deslocar(d("2023-12-22"), 1) == d("2023-12-26"))
    assert(BrCalendar.deslocar(d("2023-12-29"), 1) == d("2024-01-02"))
    assert(BrCalendar.deslocar(d("2023-12-29"), 5) == d("2024-01-08"))
    assert(BrCalendar.deslocar(d("2024-09-19"), 1) == d("2024-09-20"))
    assert(BrCalendar.deslocar(d("2024-09-20"), 1) == d("2024-09-23"))
    assert(BrCalendar.deslocar(d("2024-09-21"), 1) == d("2024-09-24"))
    assert(BrCalendar.deslocar(d("2024-09-19"), 2) == d("2024-09-23"))
  }

  test("gerar doctest: business days 22-12-2023..02-01-2024") {
    val got = BrCalendar.gerar(d("2023-12-22"), d("2024-01-02"),
      closed = "both", regime = "novo")
    assert(got == Seq(
      d("2023-12-22"), d("2023-12-26"), d("2023-12-27"),
      d("2023-12-28"), d("2023-12-29"), d("2024-01-02")))
  }

  test("truncar doctests + shortest-repr edge") {
    assert(Num.truncar(3.14159, 3) == 3.141)
    assert(Num.truncar(2.71828, 3) == 2.718)
    assert(Num.truncar(8.2, 3) == 8.2) // decimal repr, not 8.199
    assert(Num.truncar(-3.14159, 3) == -3.141)
    assert(Num.truncar(Double.NaN, 3).isNaN)
  }
}
