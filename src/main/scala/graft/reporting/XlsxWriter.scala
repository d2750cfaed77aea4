package graft.reporting

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Minimal Excel (.xlsx) export for template-scale frames (reference
  * `api/export.py:182,262,313` — the Excel/COREP final-mile writer).
  *
  * An xlsx file is a zip of SpreadsheetML XML parts; this writer emits
  * the four mandatory parts with inline strings — pure `java.util.zip` +
  * string building, no external dependency (the container pins the
  * dependency set). Deliberately DRIVER-SIDE and bounded: regulatory
  * templates and summaries are a few hundred rows by construction — the
  * 100 TB data path stays in parquet/CSV (`sources/Loader`); `maxRows`
  * guards against misuse on a fact-scale frame.
  */
object XlsxWriter {

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  private def colRef(i: Int): String = {
    // 0 -> A, 25 -> Z, 26 -> AA ...
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private def cellXml(r: Int, c: Int, v: Any): String = {
    val ref = s"${colRef(c)}${r + 1}"
    v match {
      case null => ""
      case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Float => s"""<c r="$ref"><v>${n.toDouble}</v></c>"""
      case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
      case n: java.math.BigDecimal => s"""<c r="$ref"><v>$n</v></c>"""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case other =>
        s"""<c r="$ref" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
    }
  }

  /** Write `df` (collected — template-scale only) as a one-sheet xlsx. */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1",
      maxRows: Int = 100000): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"XlsxWriter is for template-scale frames (> $maxRows rows); " +
        "use the parquet/CSV sinks for data-scale exports")
    val header = df.schema.fieldNames
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    sb.append("<row r=\"1\">")
    header.zipWithIndex.foreach { case (h, c) => sb.append(cellXml(0, c, h)) }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (row, i) =>
      sb.append(s"""<row r="${i + 2}">""")
      (0 until row.length).foreach { c =>
        sb.append(cellXml(i + 1, c, if (row.isNullAt(c)) null else row.get(c)))
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
      """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      s"""<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
      """</Relationships>"""

    val zip = new ZipOutputStream(new FileOutputStream(path))
    try {
      def part(name: String, content: String): Unit = {
        zip.putNextEntry(new ZipEntry(name))
        zip.write(content.getBytes(StandardCharsets.UTF_8))
        zip.closeEntry()
      }
      part("[Content_Types].xml", contentTypes)
      part("_rels/.rels", rootRels)
      part("xl/workbook.xml", workbook)
      part("xl/_rels/workbook.xml.rels", wbRels)
      part("xl/worksheets/sheet1.xml", sb.toString)
    } finally zip.close()
  }
}
