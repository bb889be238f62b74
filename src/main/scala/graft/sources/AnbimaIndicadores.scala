package graft.sources

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import graft.core.Num

/** ANBIMA indicator-projection workbook (S18 in SURVEY §2.1; reference
  * /root/reference/pyield/ipca/projetado.py:84-103): the first sheet's
  * cell (0,0) carries the last-update timestamp, and the IPCA row (column
  * 0 starting with "IPCA", column 1 with "Projeção") carries the reference
  * period in parentheses and the projected value in column 2, scaled to a
  * decimal and rounded half-even to 4 places (Python round).
  *
  * ANBIMA publishes this workbook as legacy .xls (BIFF); the decode here
  * reads the OOXML (.xlsx) form of the same grid via [[Xlsx]] — the
  * structural extraction (cells consumed, parse rules, precisions) is the
  * reference-faithful part.
  */
object AnbimaIndicadores {

  final case class ProjecaoIndicador(ultimaAtualizacao: LocalDateTime,
                                     periodoReferencia: String,
                                     valorProjetado: Double)

  private val PrefixoAtualizacao = "Data e Hora da Última Atualização:"
  private val FormatoAtualizacao =
    DateTimeFormatter.ofPattern("dd/MM/yyyy - HH:mm")

  /** "Data e Hora da Última Atualização: 13/03/2026 - 15:20 h" →
    * 2026-03-13T15:20 (projetado.py:33-44).
    */
  def extrairDatetime(texto: String): LocalDateTime = {
    val partes = texto.split(PrefixoAtualizacao, 2)
    require(partes.length == 2,
      s"célula de atualização sem o prefixo esperado: '$texto'")
    val s = partes(1).trim.stripSuffix("h").trim
    LocalDateTime.parse(s, FormatoAtualizacao)
  }

  /** "Projeção (mar/26)" → "mar/26" (projetado.py:47-51). */
  def extrairPeriodo(texto: String): String = {
    val ini = texto.indexOf('(') + 1
    val fim = texto.indexOf(')')
    require(ini > 0 && fim > ini, s"período não encontrado em '$texto'")
    texto.substring(ini, fim)
  }

  /** Full decode of the workbook bytes (projetado.py:84-103). */
  def taxaProjetada(xlsxBytes: Array[Byte]): ProjecaoIndicador = {
    val grid = Xlsx.readFirstSheet(xlsxBytes)
    require(grid.nonEmpty && grid.head.nonEmpty, "planilha vazia")
    val ultimaAtualizacao = extrairDatetime(grid.head.head.getOrElse(
      throw new IllegalArgumentException("célula (0,0) vazia")))
    val linhaIpca = grid.find { row =>
      row.headOption.flatten.exists(_.startsWith("IPCA")) &&
        row.lift(1).flatten.exists(_.startsWith("Projeção"))
    }.getOrElse(throw new IllegalArgumentException(
      "Não foi possível encontrar a projeção do IPCA na planilha."))
    val periodo = extrairPeriodo(linhaIpca(1).get)
    val bruto = linhaIpca.lift(2).flatten
      .flatMap(_.toDoubleOption)
      .getOrElse(throw new IllegalArgumentException(
        "valor projetado do IPCA ausente ou não numérico"))
    ProjecaoIndicador(ultimaAtualizacao, periodo,
      Num.roundHalfEven(bruto / 100, 4))
  }
}
