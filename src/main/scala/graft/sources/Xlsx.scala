package graft.sources

import java.io.{InputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Minimal OOXML spreadsheet writer — a real multi-sheet `.xlsx`
  * (what the reference publishes via pandas+openpyxl,
  * /root/reference/metrics/helpers/pdf_to_table_excel.py:15-32) with
  * no library beyond `java.util.zip`: an xlsx file IS a zip of XML
  * parts. Emits the five required part kinds (content types, package
  * rels, workbook, workbook rels, one worksheet per sheet) with
  * inline strings — no sharedStrings indirection — and numeric cells
  * for finite numbers, so spreadsheet tools see real numbers, not
  * digit strings. Driver-side by design: workbook sheets are
  * human-audience small tables (metrics summaries), never fact data.
  */
object Xlsx {

  /** One cell: Left = number (finite), Right = text. */
  type Cell = Either[Double, String]

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
    case c => c.toString
  }

  /** A1-style column name: 0 → A, 25 → Z, 26 → AA. */
  private[graft] def colRef(ix: Int): String = {
    require(ix >= 0)
    var i = ix
    val sb = new StringBuilder
    while (i >= 0) {
      sb.insert(0, ('A' + i % 26).toChar)
      i = i / 26 - 1
    }
    sb.toString
  }

  /** Excel sheet-name rules: 1–31 chars, none of []:*?/\ . */
  private def checkSheetName(name: String): Unit = {
    require(name.nonEmpty && name.length <= 31,
      s"sheet name must be 1-31 chars: '$name'")
    val bad = "[]:*?/\\".toSet
    require(!name.exists(bad), s"sheet name has Excel-invalid chars: '$name'")
  }

  /** Excel's hard row ceiling per sheet (2^20). */
  val MaxRows = 1048576

  private def num(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
      d.toLong.toString
    else d.toString

  private def sheetXml(header: Seq[String], rows: Seq[Seq[Cell]]): String = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= "\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>"
    def rowXml(r: Int, cells: Seq[Cell]): Unit = {
      sb ++= s"""<row r="$r">"""
      cells.zipWithIndex.foreach { case (c, ci) =>
        val ref = colRef(ci) + r
        c match {
          case Left(d) if !d.isNaN && !d.isInfinite =>
            sb ++= s"""<c r="$ref"><v>${num(d)}</v></c>"""
          case Left(d) => // NaN/Inf are not valid xlsx numbers
            sb ++= s"""<c r="$ref" t="inlineStr"><is><t>$d</t></is></c>"""
          case Right(s) =>
            sb ++= s"""<c r="$ref" t="inlineStr"><is><t>${esc(s)}</t></is></c>"""
        }
      }
      sb ++= "</row>"
    }
    rowXml(1, header.map(Right(_)))
    rows.zipWithIndex.foreach { case (cells, i) => rowXml(i + 2, cells) }
    sb ++= "</sheetData></worksheet>"
    sb.toString
  }

  /** Write a workbook: (sheetName, header, rows) triples in sheet
    * order. Caller owns the stream. */
  def write(sheets: Seq[(String, Seq[String], Seq[Seq[Cell]])],
            out: OutputStream): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    require(sheets.map(_._1).distinct.size == sheets.size,
      s"duplicate sheet names: ${sheets.map(_._1).mkString(", ")}")
    sheets.foreach { case (name, _, rows) =>
      checkSheetName(name)
      require(rows.length + 1 <= MaxRows,
        s"sheet '$name': ${rows.length} rows exceeds xlsx limit $MaxRows")
    }
    val zip = new ZipOutputStream(out)
    def part(path: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(path))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    val n = sheets.size
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
        "<Override PartName=\"/xl/workbook.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml\"/>" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString +
        "</Types>")
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"xl/workbook.xml\"/>" +
        "</Relationships>")
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
        "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\"><sheets>" +
        sheets.zipWithIndex.map { case ((name, _, _), i) =>
          s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        "</sheets></workbook>")
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "\n<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString +
        "</Relationships>")
    sheets.zipWithIndex.foreach { case ((_, header, rows), i) =>
      part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(header, rows))
    }
    zip.finish()
  }

  /** Read a workbook written by [[write]] back into (sheetName,
    * header, rows) triples in sheet order — what lets
    * `publishWorkbook` APPEND to an existing workbook the way the
    * reference's pdf_to_excel loads the existing file with openpyxl
    * (/root/reference/metrics/helpers/pdf_to_table_excel.py:25-29).
    * Scope is OUR OWN dialect (inline strings, dense rows, no
    * sharedStrings) — a general xlsx reader would need the
    * sharedStrings/styles parts this writer never emits. Numeric
    * cells round-trip as numbers; the NaN/Inf inline-string fallback
    * reads back as text (same loss pandas+openpyxl accepts). Caller
    * owns the stream. */
  def read(in: InputStream): Seq[(String, Seq[String], Seq[Seq[Cell]])] = {
    val zis = new ZipInputStream(in)
    val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
    var e = zis.getNextEntry
    while (e != null) {
      parts(e.getName) = zis.readAllBytes()
      e = zis.getNextEntry
    }
    def dom(name: String): org.w3c.dom.Document = {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(false)
      val part = parts.getOrElse(name,
        throw new IllegalArgumentException(s"workbook part missing: $name"))
      f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(part))
    }
    val rels = dom("xl/_rels/workbook.xml.rels")
      .getElementsByTagName("Relationship")
    val relMap = (0 until rels.getLength).map { i =>
      val el = rels.item(i).asInstanceOf[org.w3c.dom.Element]
      el.getAttribute("Id") -> el.getAttribute("Target")
    }.toMap
    val sheetNodes = dom("xl/workbook.xml").getElementsByTagName("sheet")
    (0 until sheetNodes.getLength).map { i =>
      val el = sheetNodes.item(i).asInstanceOf[org.w3c.dom.Element]
      val name = el.getAttribute("name")
      val ws = dom("xl/" + relMap(el.getAttribute("r:id")))
      val rowNodes = ws.getElementsByTagName("row")
      val allRows = (0 until rowNodes.getLength).map { r =>
        val cells = rowNodes.item(r).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagName("c")
        (0 until cells.getLength).map { ci =>
          val c = cells.item(ci).asInstanceOf[org.w3c.dom.Element]
          val cell: Cell =
            if (c.getAttribute("t") == "inlineStr") Right(c.getTextContent)
            else Left(c.getTextContent.toDouble)
          cell
        }.toSeq
      }
      val header = allRows.headOption.getOrElse(Seq.empty).map {
        case Right(s) => s
        case Left(d) => num(d)
      }
      (name, header, allRows.drop(1).toSeq)
    }
  }
}
