package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Urls

/** Pure URL-builder contracts against the reference's own examples. */
class UrlsSpec extends AnyFunSuite {

  test("Olinda OData URL: named params, skipped empties, CSV format") {
    val url = Urls.olindaMontarUrl("https://x.test/odata/recurso(?",
      Seq("dataLancamentoInicio" -> "2025-08-21",
        "dataLancamentoFim" -> "2025-08-21",
        "vazio" -> ""))
    assert(url == "https://x.test/odata/recurso(?" +
      "@dataLancamentoInicio='2025-08-21'&@dataLancamentoFim='2025-08-21'" +
      "&$format=text/csv")
    // no params: just the format suffix (full-history query)
    assert(Urls.olindaMontarUrl("b?", Nil) == "b?&$format=text/csv")
  }

  test("compromissada period parameters") {
    assert(Urls.compromissadaParametros(
      Some(LocalDate.of(2025, 8, 21)), None) ==
      Seq("dataLancamentoInicio" -> "2025-08-21"))
    assert(Urls.compromissadaParametros(None, None).isEmpty)
  }

  test("ANBIMA TPF file name: .exe before 13/05/2014, .txt after") {
    assert(Urls.anbimaNomeArquivo(LocalDate.of(2014, 5, 12)) == "ms140512.exe")
    assert(Urls.anbimaNomeArquivo(LocalDate.of(2014, 5, 13)) == "ms140513.txt")
    assert(Urls.anbimaNomeArquivo(LocalDate.of(2026, 2, 6)) == "ms260206.txt")
  }

  test("ANBIMA URL: public within 5 business days, RTM beyond") {
    val hoje = LocalDate.of(2026, 2, 6) // Friday, business day
    val recente = LocalDate.of(2026, 2, 2) // 4 business days back
    val antiga = LocalDate.of(2026, 1, 15)
    assert(Urls.anbimaUrlArquivo(recente, hoje) ==
      s"${Urls.AnbimaUrl}/ms260202.txt")
    assert(Urls.anbimaUrlArquivo(antiga, hoje) ==
      s"${Urls.AnbimaRtmUrl}/ms260115.txt")
  }

  test("CETIP DI-over file name") {
    assert(Urls.diOverNomeArquivo(LocalDate.of(2025, 2, 28)) == "20250228.txt")
  }
}
