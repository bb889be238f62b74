package graft.sources

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Minimal xlsx (SpreadsheetML) sheet reader — no POI: an .xlsx file is a
  * ZIP of XML parts, and the readers here only need raw cell values, so
  * `java.util.zip` + StAX (both already used by [[B3Boletim]]) suffice.
  *
  * Supported: multi-sheet workbooks (name resolution via workbook.xml +
  * its .rels part), shared strings (including rich-text runs), inline
  * strings, numeric/boolean/formula-string cells, sparse rows and cells
  * (positioned by their `r` references). Not supported: styles-dependent
  * interpretation (e.g. serial-number date formatting) — the consumers
  * (RMD sheet 1.3, Tesouro VNA, ANBIMA indicator projections:
  * /root/reference/pyield/tpf/rmd/_download.py:38-55,
  * tpf/vna/_download.py:51-53, ipca/projetado.py:84-103) all read their
  * sheets as raw text/number grids, matching `read_excel(has_header=False)`
  * semantics.
  *
  * This runs driver-side on small published workbooks (the reference does
  * the same in-process); the resulting grid feeds Spark DataFrames.
  */
object Xlsx {

  /** A sheet as a dense row-major grid; absent cells are None. */
  type Grid = Vector[Vector[Option[String]]]

  private def entryMap(bytes: Array[Byte]): Map[String, Array[Byte]] =
    RawFiles.unzipAll(bytes).toMap

  /** Sheet names in workbook order. */
  def sheetNames(bytes: Array[Byte]): Seq[String] =
    parseWorkbook(entryMap(bytes)).map(_._1)

  /** Read one sheet by name into a dense grid of raw cell values
    * (shared strings resolved; numbers as their literal strings).
    */
  def readSheet(bytes: Array[Byte], sheet: String): Grid = {
    val entries = entryMap(bytes)
    val sheets = parseWorkbook(entries)
    val target = sheets.collectFirst { case (`sheet`, path) => path }
      .getOrElse(throw new IllegalArgumentException(
        s"sheet '$sheet' not found; workbook has ${sheets.map(_._1)}"))
    val shared = entries.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Vector.empty)
    parseSheet(entries(target), shared)
  }

  /** First sheet of the workbook (read_excel's default). */
  def readFirstSheet(bytes: Array[Byte]): Grid = {
    val names = sheetNames(bytes)
    require(names.nonEmpty, "workbook has no sheets")
    readSheet(bytes, names.head)
  }

  // ---------------------------------------------------------------- parts

  /** workbook.xml + workbook.xml.rels → Seq[(sheetName, zip path)]. */
  private def parseWorkbook(entries: Map[String, Array[Byte]])
      : Seq[(String, String)] = {
    val rels = parseRels(entries.getOrElse("xl/_rels/workbook.xml.rels",
      throw new IllegalArgumentException("missing workbook rels part")))
    val wb = entries.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("missing xl/workbook.xml"))
    val reader = newReader(wb)
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    try {
      while (reader.hasNext) {
        if (reader.next() == XMLStreamConstants.START_ELEMENT &&
            reader.getLocalName == "sheet") {
          var name: String = null
          var rid: String = null
          var i = 0
          while (i < reader.getAttributeCount) {
            reader.getAttributeLocalName(i) match {
              case "name" => name = reader.getAttributeValue(i)
              case "id" => rid = reader.getAttributeValue(i) // r:id
              case _ =>
            }
            i += 1
          }
          for (t <- Option(rid).flatMap(rels.get)) {
            val path = if (t.startsWith("/")) t.drop(1)
              else if (t.startsWith("xl/")) t else s"xl/$t"
            out += name -> path
          }
        }
      }
    } finally reader.close()
    out.toSeq
  }

  /** .rels part → Map(relationship Id -> Target). */
  private def parseRels(bytes: Array[Byte]): Map[String, String] = {
    val reader = newReader(bytes)
    val out = scala.collection.mutable.Map[String, String]()
    try {
      while (reader.hasNext) {
        if (reader.next() == XMLStreamConstants.START_ELEMENT &&
            reader.getLocalName == "Relationship") {
          var id: String = null
          var target: String = null
          var i = 0
          while (i < reader.getAttributeCount) {
            reader.getAttributeLocalName(i) match {
              case "Id" => id = reader.getAttributeValue(i)
              case "Target" => target = reader.getAttributeValue(i)
              case _ =>
            }
            i += 1
          }
          if (id != null && target != null) out(id) = target
        }
      }
    } finally reader.close()
    out.toMap
  }

  /** sharedStrings.xml → indexed strings (rich-text runs concatenated). */
  private[sources] def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val reader = newReader(bytes)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "si" => inSi = true; sb.clear()
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) sb.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName match {
              case "si" => inSi = false; out += sb.toString
              case "t" => inT = false
              case _ =>
            }
          case _ =>
        }
      }
    } finally reader.close()
    out.toVector
  }

  /** "BC12" → 0-based column index (54). */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0
    var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    c - 1
  }

  /** Sheet XML → dense grid. Cells/rows without `r` references fall back
    * to sequential positions, as the spec allows.
    */
  private def parseSheet(bytes: Array[Byte], shared: Vector[String]): Grid = {
    val reader = newReader(bytes)
    val rows = scala.collection.mutable.TreeMap[Int, // row idx
      scala.collection.mutable.TreeMap[Int, String]]() // col idx -> value

    var rowIdx = -1
    var colIdx = -1
    var cellType = ""
    var inV = false
    var inIs = false
    var inT = false
    val sb = new StringBuilder
    var pendingCol = -1

    def put(r: Int, c: Int, v: String): Unit =
      rows.getOrElseUpdate(r,
        scala.collection.mutable.TreeMap[Int, String]())(c) = v

    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "row" =>
                val r = attr(reader, "r")
                rowIdx = if (r != null) r.toInt - 1 else rowIdx + 1
                colIdx = -1
              case "c" =>
                val r = attr(reader, "r")
                pendingCol = if (r != null) colIndex(r) else colIdx + 1
                colIdx = pendingCol
                cellType = Option(attr(reader, "t")).getOrElse("")
              case "v" => inV = true; sb.clear()
              // rich-text runs: accumulate every <t> within the <is> and
              // emit once at </is> (mirrors parseSharedStrings)
              case "is" => inIs = true; sb.clear()
              case "t" if inIs => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV || inT) sb.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName match {
              case "v" =>
                inV = false
                val raw = sb.toString
                val resolved = cellType match {
                  case "s" => shared(raw.trim.toInt)
                  case _ => raw
                }
                put(rowIdx, pendingCol, resolved)
              case "t" if inIs =>
                inT = false
              case "is" =>
                inIs = false
                put(rowIdx, pendingCol, sb.toString)
              case _ =>
            }
          case _ =>
        }
      }
    } finally reader.close()

    if (rows.isEmpty) Vector.empty
    else {
      val nRows = rows.lastKey + 1
      val nCols = rows.valuesIterator.map(m =>
        if (m.isEmpty) 0 else m.lastKey + 1).max
      Vector.tabulate(nRows) { r =>
        val m = rows.get(r)
        Vector.tabulate(nCols)(c => m.flatMap(_.get(c)))
      }
    }
  }

  private def attr(reader: javax.xml.stream.XMLStreamReader,
                   name: String): String = {
    var i = 0
    while (i < reader.getAttributeCount) {
      if (reader.getAttributeLocalName(i) == name)
        return reader.getAttributeValue(i)
      i += 1
    }
    null
  }

  private def newReader(bytes: Array[Byte]) = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }
}
