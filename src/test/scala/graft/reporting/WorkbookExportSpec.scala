package graft.reporting

import java.util.zip.ZipFile
import scala.io.Source
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The multi-sheet COREP / Pillar 3 workbook export (reference
  * `api/export.py:262-342` + `reporting/kernel/excel.py`): worksheet
  * per template (and per sheet key for the geographical templates), the
  * readable-name banner band above the regulatory refs, the metadata
  * sheet leading — with cell spot-checks against the generated frames. */
class WorkbookExportSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def readPart(path: String, part: String): String = {
    val zf = new ZipFile(path)
    try {
      val entry = zf.getEntry(part)
      assert(entry != null, s"missing zip part $part")
      Source.fromInputStream(zf.getInputStream(entry), "UTF-8").mkString
    } finally zf.close()
  }

  /** Worksheet names in workbook order (sheetN.xml is 1-based in this
    * order). */
  private def sheetNames(path: String): Seq[String] =
    """name="([^"]+)"""".r.findAllMatchIn(readPart(path, "xl/workbook.xml"))
      .map(_.group(1)).toSeq

  test("COREP workbook: per-template sheets, banner band, metadata, cell spot-checks") {
    val path = java.nio.file.Files
      .createTempFile("graft-corep", ".xlsx").toString
    val n = WorkbookExport.corepWorkbook(spark, sfDir, path,
      metadata = Seq("Framework" -> "CRR", "Reporting date" -> "2026-12-31"))
    assert(n > 10, s"expected >10 worksheets, got $n")

    val names = sheetNames(path)
    assert(names.head == "metadata")
    assert(names.contains("C02.00") && names.contains("C08.03") &&
      names.contains("C09.01 ALL") && names.contains("OF02.01"), names)
    // no pillar3 template leaks into the COREP return
    assert(!names.exists(_.startsWith("CR")), names)

    // metadata sheet carries the filing pairs
    val meta = readPart(path, "xl/worksheets/sheet1.xml")
    assert(meta.contains("<t>Framework</t>") && meta.contains("<t>CRR</t>"))

    // C02.00: the banner band sits above the refs, and a published cell
    // value matches the generated frame bit-for-bit
    val c02Idx = names.indexOf("C02.00") + 1
    val c02Xml = readPart(path, s"xl/worksheets/sheet$c02Idx.xml")
    assert(c02Xml.contains("<t>Risk exposure amount (CRR)</t>"), "banner missing")
    assert(c02Xml.contains("<t>rwea_crr</t>"), "ref header missing")
    val c02 = TemplateCatalog.sheet(spark, sfDir, "C02.00").get
      .filter(col("row_ref") === "0130").select("rwea_crr").head.getDouble(0)
    assert(c02Xml.contains(s"<v>$c02</v>"), s"cell $c02 missing from sheet")

    // C09.01 ALL: the published column names band the geographical grid,
    // and the total row's RWEA matches the generated frame
    val c09Idx = names.indexOf("C09.01 ALL") + 1
    val c09Xml = readPart(path, s"xl/worksheets/sheet$c09Idx.xml")
    assert(c09Xml.contains("<t>RWEA after supporting factors</t>"))
    val c09 = TemplateCatalog.sheet(spark, sfDir, "C09.01").get
      .filter(col("country") === "ALL" && col("row_ref") === "0070")
      .select("c0090").head.getDouble(0)
    assert(c09Xml.contains(s"<v>$c09</v>"), s"cell $c09 missing from sheet")
  }

  test("Pillar 3 workbook: disclosure templates with sheeted CR6/CR9") {
    val path = java.nio.file.Files
      .createTempFile("graft-p3", ".xlsx").toString
    val n = WorkbookExport.pillar3Workbook(spark, sfDir, path)
    assert(n > 10, s"expected >10 worksheets, got $n")
    val names = sheetNames(path)
    assert(names.contains("OV1") && names.contains("CR5") &&
      names.exists(_.startsWith("CR6 ")) &&
      names.exists(_.startsWith("CR9 ")), names)
    // OV1 total row ties the generated frame
    val ov1Idx = names.indexOf("OV1") + 1
    val ov1Xml = readPart(path, s"xl/worksheets/sheet$ov1Idx.xml")
    val ov1 = TemplateCatalog.sheet(spark, sfDir, "OV1").get
      .filter(col("row_ref") === 29).select("rwea_crr").head.getDouble(0)
    assert(ov1Xml.contains(s"<v>$ov1</v>"), s"cell $ov1 missing from sheet")
  }
}
