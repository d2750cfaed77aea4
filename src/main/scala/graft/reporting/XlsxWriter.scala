package graft.reporting

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame

/** Minimal Excel (.xlsx) export for template-scale frames (reference
  * `api/export.py:182,262,313` — the Excel/COREP final-mile writer —
  * and the shared sheet kernel `reporting/kernel/excel.py`).
  *
  * An xlsx file is a zip of SpreadsheetML XML parts; this writer emits
  * the mandatory parts with inline strings — pure `java.util.zip` +
  * string building, no external dependency (the container pins the
  * dependency set). Deliberately DRIVER-SIDE and bounded: regulatory
  * templates and summaries are a few hundred rows by construction — the
  * 100 TB data path stays in parquet/CSV (`sources/Loader`); `maxRows`
  * guards against misuse on a fact-scale frame.
  *
  * Workbook layout per sheet mirrors the reference's
  * `write_template_sheet` (`reporting/kernel/excel.py`): row 1 is a
  * bold, wrapped READABLE-NAME banner (the published column names a
  * supervisor reads), row 2 is the frame's own header (the regulatory
  * column refs a filing tool maps against), rows 3+ are the data. A
  * column absent from the banner map falls back to its ref, so the
  * banner is always fully populated. Sheet names are sanitised to
  * Excel's rules (illegal chars stripped, clamped to 31 chars).
  */
object XlsxWriter {

  /** One worksheet: a frame plus its readable-name banner map
    * (ref → published column name; missing refs fall back to the ref). */
  final case class Sheet(
      name: String, df: DataFrame, banner: Map[String, String] = Map.empty)

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  private def colRef(i: Int): String = {
    // 0 -> A, 25 -> Z, 26 -> AA ...
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private def cellXml(r: Int, c: Int, v: Any, style: Int = 0): String = {
    val ref = s"${colRef(c)}${r + 1}"
    val st = if (style == 0) "" else s""" s="$style""""
    v match {
      case null => ""
      case n: Double =>
        // non-finite floats become blank cells, not #NUM! errors
        // (reference `excel.py::_finite_only`)
        if (n.isNaN || n.isInfinite) ""
        else s"""<c r="$ref"$st><v>$n</v></c>"""
      case n: Float => cellXml(r, c, n.toDouble, style)
      case n: Int => s"""<c r="$ref"$st><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"$st><v>$n</v></c>"""
      case n: java.math.BigDecimal => s"""<c r="$ref"$st><v>$n</v></c>"""
      case b: Boolean => s"""<c r="$ref"$st t="b"><v>${if (b) 1 else 0}</v></c>"""
      case other =>
        s"""<c r="$ref"$st t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
    }
  }

  /** Excel-illegal worksheet-name characters stripped, 31-char clamp
    * (reference `excel.py::sanitise_sheet_name`). */
  def sanitiseSheetName(name: String): String =
    name.replaceAll("""[\[\]:*?/\\]""", "").take(31)

  /** Structural columns every template frame leads with get fixed
    * readable labels (reference `excel.py::_STRUCTURAL_BANNER`). */
  private val structuralBanner = Map(
    "row_ref" -> "Row code", "row_name" -> "Row name",
    "row_id" -> "Row code", "country" -> "Country sheet",
    "sheet_key" -> "Sheet key", "exposure_class" -> "Exposure class",
    "framework" -> "Framework")

  /** Fallback readable label for a column with no published name:
    * snake_case humanised, never blank. */
  private def humanise(ref: String): String =
    if (ref.matches("c?\\d{3,4}")) ref
    else ref.split('_').filter(_.nonEmpty)
      .map(w => s"${w.head.toUpper}${w.tail}").mkString(" ")

  private def sheetXml(sheet: Sheet, maxRows: Int): String = {
    val rows = sheet.df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"XlsxWriter is for template-scale frames (> $maxRows rows); " +
        "use the parquet/CSV sinks for data-scale exports")
    val header = sheet.df.schema.fieldNames
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    // row 1: readable-name banner (bold + wrapped, style 1, taller row)
    sb.append("""<row r="1" ht="60" customHeight="1">""")
    header.zipWithIndex.foreach { case (h, c) =>
      val label = structuralBanner.getOrElse(h,
        sheet.banner.getOrElse(h, humanise(h)))
      sb.append(cellXml(0, c, label, style = 1))
    }
    sb.append("</row>")
    // row 2: the frame's own header — the regulatory refs
    sb.append("<row r=\"2\">")
    header.zipWithIndex.foreach { case (h, c) => sb.append(cellXml(1, c, h)) }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (row, i) =>
      sb.append(s"""<row r="${i + 3}">""")
      (0 until row.length).foreach { c =>
        sb.append(cellXml(i + 2, c, if (row.isNullAt(c)) null else row.get(c)))
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  private val stylesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
    """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
    """<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>""" +
    """<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>""" +
    """<fills count="2"><fill><patternFill patternType="none"/></fill>""" +
    """<fill><patternFill patternType="gray125"/></fill></fills>""" +
    """<borders count="2"><border/>""" +
    """<border><bottom style="thin"/></border></borders>""" +
    """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
    """<cellXfs count="2"><xf/>""" +
    """<xf fontId="1" borderId="1" applyFont="1" applyBorder="1" applyAlignment="1">""" +
    """<alignment wrapText="1" vertical="top"/></xf></cellXfs></styleSheet>"""

  /** Write a multi-sheet workbook — the reference's COREP / Pillar 3
    * export shape (`api/export.py:262-342`): one worksheet per template,
    * each with the readable-name banner band over the regulatory refs.
    * Duplicate post-sanitisation sheet names are suffixed to stay unique
    * (Excel rejects duplicate worksheet names). */
  def writeWorkbook(sheets: Seq[Sheet], path: String,
      maxRows: Int = 100000): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val named = {
      // every EMITTED name registers in `used`, and a synthetic suffix
      // that itself collides (e.g. input ['X','X','X_1']) keeps bumping
      // — Excel rejects a workbook with duplicate worksheet names
      val used = scala.collection.mutable.Set[String]()
      sheets.map { sh =>
        val base = sanitiseSheetName(sh.name)
        var unique = base
        var n = 1
        while (used.contains(unique)) {
          // shrink the stem as the suffix grows so the 31-char clamp
          // can never collapse distinct candidates onto each other
          val suffix = s"_$n"
          unique = sanitiseSheetName(base.take(31 - suffix.length) + suffix)
          n += 1
        }
        used += unique
        (unique, sh)
      }
    }
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
      named.indices.map(i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString +
      """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
      """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
      named.zipWithIndex.map { case ((nm, _), i) =>
        s"""<sheet name="${esc(nm)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString +
      """</sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      named.indices.map(i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
        .mkString +
      s"""<Relationship Id="rId${named.size + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
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
      part("xl/styles.xml", stylesXml)
      named.zipWithIndex.foreach { case ((_, sh), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(sh, maxRows))
      }
    } finally zip.close()
  }

  /** Write `df` (collected — template-scale only) as a one-sheet xlsx. */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1",
      maxRows: Int = 100000): Unit =
    writeWorkbook(Seq(Sheet(sheetName, df)), path, maxRows)
}
