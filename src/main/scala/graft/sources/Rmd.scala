package graft.sources

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** RMD (monthly debt report) sheet 1.3 structurer (S15 in SURVEY §2.1;
  * reference /root/reference/pyield/tpf/rmd/_aba_1_3.py:26-110).
  *
  * The sheet is wide (one column per month) with a category column whose
  * rows form a header-classification state machine: section headers
  * (I - EMISSÕES / II - RESGATES) open a group, subgroup labels scope the
  * following title rows, and IMPACTO/OPERAÇÕES/III- prefixes close the
  * section. Output is the long (periodo, grupo, subgrupo, titulo, valor)
  * frame with values scaled to R$ (millions × 1e6, rounded to cents).
  *
  * The xlsx decode runs through [[Xlsx]] (ZIP + StAX, no POI): see the
  * bytes overload of `estruturarDados`.
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

  /** Footnote markers and whitespace cleanup (rmd/_common.py:38-41). */
  def limparRotulo(valor: String): String =
    valor.replace("¹", "").replace("²", "").trim

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
}
