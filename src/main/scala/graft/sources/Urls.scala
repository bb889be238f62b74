package graft.sources

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import graft.core.BrCalendar

/** Pure URL/file-name builders for the acquisition layer — the testable,
  * network-free part of the fetchers (acquisition itself stays pluggable;
  * callers pass payloads to the readers).
  */
object Urls {

  // ------------------------------------------------- BCB Olinda (OData)

  /** OData URL with optional named parameters and CSV format (reference
    * bc/_olinda.py:9-18): empty-valued parameters are skipped; `urlBase`
    * already ends with '?'.
    */
  def olindaMontarUrl(urlBase: String, parametros: Seq[(String, String)]): String =
    urlBase + parametros.collect {
      case (k, v) if v.nonEmpty => s"@$k='$v'"
    }.mkString("&") + "&$format=text/csv"

  /** Repo-auction period parameters (selic/compromissada.py:31-41). */
  def compromissadaParametros(inicio: Option[LocalDate],
                              fim: Option[LocalDate]): Seq[(String, String)] = {
    val iso = DateTimeFormatter.ISO_LOCAL_DATE
    inicio.map(d => "dataLancamentoInicio" -> d.format(iso)).toSeq ++
      fim.map(d => "dataLancamentoFim" -> d.format(iso)).toSeq
  }

  // ------------------------------------------------- ANBIMA TPF (S2)

  val AnbimaUrl = "https://www.anbima.com.br/informacoes/merc-sec/arqs"
  val AnbimaRtmHostname = "www.anbima.associados.rtm"
  val AnbimaRtmUrl = s"http://$AnbimaRtmHostname/merc_sec/arqs"

  /** Before 13/05/2014 the TPF file was a zipped .exe (anbima/taxas.py:41). */
  val AnbimaMudancaFormato: LocalDate = LocalDate.of(2014, 5, 13)
  val AnbimaDiasRetencaoPublica = 5

  /** "ms{yyMMdd}.txt", or ".exe" for the pre-2014 zipped format
    * (anbima/taxas.py:48-54).
    */
  def anbimaNomeArquivo(data: LocalDate): String = {
    val d = data.format(DateTimeFormatter.ofPattern("yyMMdd"))
    if (data.isBefore(AnbimaMudancaFormato)) s"ms$d.exe" else s"ms$d.txt"
  }

  /** Public endpoint inside the 5-business-day public retention window,
    * RTM (members network) beyond it (anbima/taxas.py:57-66).
    * `ultimoDiaUtil` defaults to the calendar's latest business day and is
    * injectable for determinism.
    */
  def anbimaUrlArquivo(data: LocalDate,
                       ultimoDiaUtil: LocalDate): String = {
    val diasUteis = BrCalendar.contar(data, ultimoDiaUtil)
    val base = if (diasUteis > AnbimaDiasRetencaoPublica) AnbimaRtmUrl
      else AnbimaUrl
    s"$base/${anbimaNomeArquivo(data)}"
  }

  // ------------------------------------------------- CETIP DI over (S13)

  val CetipMediaCdiUrl = "ftp://ftp.cetip.com.br/MediaCDI/"

  /** "{yyyyMMdd}.txt" on the MediaCDI FTP (b3/di_over.py:34,100). */
  def diOverNomeArquivo(data: LocalDate): String =
    data.format(DateTimeFormatter.ofPattern("yyyyMMdd")) + ".txt"
}
