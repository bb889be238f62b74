package graft.sources

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** RMD (monthly debt report) structurers for sheets 1.3 and 2.1 (S15 in
  * SURVEY §2.1; reference /root/reference/pyield/tpf/rmd/_aba_1_3.py:26-110
  * and _aba_2_1.py:1-97).
  *
  * Both sheets are wide (one column per month) with a label column whose
  * rows form a classification state machine:
  *
  *   - 1.3 (DPMFi issues/redemptions): section headers (I - EMISSÕES /
  *     II - RESGATES) open a group, subgroup labels scope the following
  *     title rows, and IMPACTO/OPERAÇÕES/III- prefixes close the section.
  *     Long output (periodo, grupo, subgrupo, titulo, valor), values in
  *     R$ (millions × 1e6, rounded to cents, zeros dropped).
  *   - 2.1 (DPF stock series): a HIERARCHICAL state machine — holder/
  *     type/category transition labels ([[_aba_2_1.py]] `_TRANSICOES`)
  *     set the scope and whether leaf rows may emit; leaf rows under an
  *     emitting state melt into (periodo, detentor, tipo, categoria,
  *     titulo, valor), values in R$ (billions × 1e9, rounded to cents,
  *     nulls dropped, zeros kept).
  *
  * The xlsx decode runs through [[Xlsx]] (ZIP + StAX, no POI): see the
  * bytes overloads of `estruturarDados`.
  */
object Rmd {

  private val LinhaPeriodos = 2
  private val LinhaInicioDados = LinhaPeriodos + 1

  private val Titulos = Set("LFT", "LTN", "NTN-B", "NTN-B1", "NTN-F",
    "NTN-C", "NTN-D", "Demais")
  private val Secoes = Map("I - EMISSÕES" -> "Emissões",
    "II - RESGATES" -> "Resgates")
  private val Subgrupos = Set("Vendas", "Trocas", "Vencimentos", "Compras")
  private val SubgrupoTd = "Tesouro Direto"
  private val SubgruposDiretos = Seq(
    "Transferência de Carteira", "Emissão Direta com Financeiro",
    "Emissão Direta sem Financeiro", "Pagamento de Dividendos",
    "Cancelamentos")
  private val PrefixosIgnorar = Seq("IMPACTO", "OPERAÇÕES", "III -", "RESGATE")

  private val MesesPt = Map("Jan" -> 1, "Fev" -> 2, "Mar" -> 3, "Abr" -> 4,
    "Mai" -> 5, "Jun" -> 6, "Jul" -> 7, "Ago" -> 8, "Set" -> 9, "Out" -> 10,
    "Nov" -> 11, "Dez" -> 12)

  /** "Nov/06" → 2006-11-01; anything else → None. */
  def parsearPeriodo(periodo: String): Option[LocalDate] =
    periodo.split("/") match {
      case Array(mes, ano) =>
        MesesPt.get(mes).flatMap { m =>
          ano.toIntOption.map(a => LocalDate.of(2000 + a, m, 1))
        }
      case _ => None
    }

  private val Espacos = java.util.regex.Pattern.compile("\\s+")

  /** Footnote markers removed, trimmed, internal whitespace runs
    * collapsed to one space (rmd/_common.py:38-42).
    */
  def limparRotulo(valor: String): String =
    Espacos.matcher(valor.replace("¹", "").replace("²", "").trim)
      .replaceAll(" ")

  private[sources] case class Evento(linha: Int, grupo: String,
                                     subgrupo: String, titulo: Option[String])

  /** The header-row classification state machine (_aba_1_3.py:27-53). */
  private[sources] def classificar(categorias: Seq[String]): Seq[Evento] = {
    var grupo = ""
    var subgrupo = ""
    val eventos = scala.collection.mutable.ArrayBuffer[Evento]()
    categorias.zipWithIndex.foreach { case (cat, i) =>
      val c = cat.trim
      if (Secoes.contains(c)) { grupo = Secoes(c); subgrupo = "" }
      else if (PrefixosIgnorar.exists(c.startsWith)) grupo = ""
      else if (grupo.nonEmpty) {
        if (Subgrupos.contains(c)) subgrupo = c
        else if (c.startsWith(SubgrupoTd)) subgrupo = SubgrupoTd
        else if (Titulos.contains(c)) eventos += Evento(i, grupo, subgrupo, Some(c))
        else SubgruposDiretos.find(c.startsWith)
          .foreach(p => eventos += Evento(i, grupo, p, None))
      }
    }
    eventos.toSeq
  }

  /** Wide grid → long frame. `matriz(linha)(colunaMes)` are the numeric
    * cells aligned with `periodosRaw` after dropping unparseable periods.
    */
  def estruturarDados(spark: SparkSession, categorias: Seq[String],
                      periodosRaw: Seq[String],
                      matriz: Seq[Seq[Option[Double]]]): DataFrame = {
    import spark.implicits._
    val datasEIndices = periodosRaw.zipWithIndex.flatMap { case (p, i) =>
      parsearPeriodo(p).map(d => (i, d))
    }
    val registros = for {
      Evento(linha, grupo, subgrupo, titulo) <- classificar(categorias)
      (colIdx, data) <- datasEIndices
      valor <- matriz(linha).lift(colIdx).flatten
      escalado = graft.core.Num.roundPolars(valor * 1000000, 2)
      if escalado != 0.0
    } yield (java.sql.Date.valueOf(data), grupo, subgrupo, titulo.orNull,
      escalado)
    registros.toDF("periodo", "grupo", "subgrupo", "titulo", "valor")
  }

  /** End-to-end xlsx path: decode sheet "1.3" with [[Xlsx]] and structure
    * it (reference _aba_1_3.py:80-107 over read_excel(has_header=False)):
    * row 2 holds the period headers (column 0 excluded, empty cells
    * dropped); data rows follow and are kept while column 0 is non-empty;
    * the numeric matrix is every column from 1 on, non-strict cast.
    */
  def estruturarDados(spark: SparkSession, xlsxBytes: Array[Byte]): DataFrame = {
    val grid = Xlsx.readSheet(xlsxBytes, "1.3")
    require(grid.length > LinhaInicioDados,
      s"sheet 1.3 has ${grid.length} rows; expected header at row $LinhaPeriodos")
    val periodosRaw = grid(LinhaPeriodos).drop(1).flatten
    val dataRows = grid.drop(LinhaInicioDados)
      .filter(_.headOption.flatten.exists(_.nonEmpty))
    val categorias = dataRows.map(_.head.get)
    val matriz: Seq[Seq[Option[Double]]] =
      dataRows.map(_.drop(1).map(_.flatMap(_.toDoubleOption)))
    estruturarDados(spark, categorias, periodosRaw, matriz)
  }

  // ------------------------------------------------------------ sheet 2.1

  /** Hierarchical state transitions of sheet 2.1 (_aba_2_1.py:13-26),
    * keyed on the UPPERCASED cleaned label. Value: (detentor, tipo,
    * categoria, podeEmitir). podeEmitir=false marks an intermediate
    * state — leaf rows are ignored until the next emitting transition.
    */
  private[sources] val Transicoes: Map[String,
      (Option[String], Option[String], Option[String], Boolean)] = Map(
    "DPF EM PODER DO PÚBLICO" -> ((None, None, None, false)),
    "DPMFI" -> ((Some("Público"), Some("DPMFi"), None, false)),
    "TESOURO NACIONAL" -> ((Some("Público"), Some("DPMFi"), Some("Tesouro Nacional"), true)),
    "BANCO CENTRAL" -> ((Some("Público"), Some("DPMFi"), Some("Banco Central"), true)),
    "DPFE" -> ((Some("Público"), Some("DPFe"), None, false)),
    "DÍVIDA MOBILIÁRIA" -> ((Some("Público"), Some("DPFe"), Some("Mobiliária"), true)),
    "DÍVIDA CONTRATUAL" -> ((Some("Público"), Some("DPFe"), Some("Contratual"), true)),
    "DPMFI EM PODER DO BANCO CENTRAL" -> ((Some("Banco Central"), Some("DPMFi"), None, true)))

  /** Sheet 2.1 (DPF stock) wide grid → long frame
    * (_aba_2_1.py:41-97). `rotulos(linha)` is the cleaned-or-absent label
    * column; `matriz(linha)(colunaMes)` the numeric cells aligned with
    * `periodosRaw` after dropping unparseable periods (the reference
    * indexes leaf values by the FILTERED period position — period header
    * gaps compress, exactly as in sheet 1.3).
    */
  def estruturarDados21(spark: SparkSession, rotulos: Seq[Option[String]],
                        periodosRaw: Seq[String],
                        matriz: Seq[Seq[Option[Double]]]): DataFrame = {
    import spark.implicits._
    val datasEIndices = periodosRaw.zipWithIndex.flatMap { case (p, i) =>
      parsearPeriodo(p).map(d => (i, d))
    }
    var detentor: Option[String] = None
    var tipo: Option[String] = None
    var categoria: Option[String] = None
    var podeEmitir = false
    val registros = scala.collection.mutable.ArrayBuffer[
      (java.sql.Date, String, String, String, String, Double)]()
    rotulos.zipWithIndex.foreach { case (bruto, linha) =>
      bruto.map(limparRotulo).filter(_.nonEmpty).foreach { rotulo =>
        Transicoes.get(rotulo.toUpperCase(java.util.Locale.ROOT)) match {
          case Some((d, t, c, e)) =>
            detentor = d; tipo = t; categoria = c; podeEmitir = e
          case None if podeEmitir =>
            val valores = matriz(linha)
            for {
              (colIdx, data) <- datasEIndices
              valor <- valores.lift(colIdx).flatten
            } registros += ((java.sql.Date.valueOf(data), detentor.orNull,
              tipo.orNull, categoria.orNull, rotulo,
              graft.core.Num.roundPolars(valor * 1000000000L, 2)))
          case None => // leaf row under a non-emitting state: ignored
        }
      }
    }
    registros.toSeq
      .toDF("periodo", "detentor", "tipo", "categoria", "titulo", "valor")
  }

  /** End-to-end xlsx path for sheet "2.1": decode with [[Xlsx]], take the
    * period headers from row 2 (column 0 excluded, empty cells dropped),
    * and run the hierarchical melt over every following row (rows with an
    * absent label column stay in the sequence so `matriz` stays aligned).
    */
  def estruturarDados21(spark: SparkSession, xlsxBytes: Array[Byte]): DataFrame = {
    val grid = Xlsx.readSheet(xlsxBytes, "2.1")
    require(grid.length > LinhaInicioDados,
      s"sheet 2.1 has ${grid.length} rows; expected header at row $LinhaPeriodos")
    val periodosRaw = grid(LinhaPeriodos).drop(1).flatten
    val dataRows = grid.drop(LinhaInicioDados)
    val rotulos = dataRows.map(_.headOption.flatten)
    val matriz: Seq[Seq[Option[Double]]] =
      dataRows.map(_.drop(1).map(_.flatMap(_.toDoubleOption)))
    estruturarDados21(spark, rotulos, periodosRaw, matriz)
  }

  /** Sheet dispatch mirroring the reference's public `rmd(aba)` contract
    * (rmd/__init__.py:13-17,70-74): unknown sheets fail loudly with the
    * implemented list.
    */
  def estruturarDados(spark: SparkSession, xlsxBytes: Array[Byte],
                      aba: String): DataFrame = aba match {
    case "1.3" => estruturarDados(spark, xlsxBytes)
    case "2.1" => estruturarDados21(spark, xlsxBytes)
    case _ => throw new IllegalArgumentException(
      s"""Aba '$aba' não disponível. Abas implementadas: "1.3", "2.1".""")
  }
}
