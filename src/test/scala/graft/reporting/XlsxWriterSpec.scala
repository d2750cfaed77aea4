package graft.reporting

import java.util.zip.ZipFile
import scala.io.Source
import graft.SparkSpec

class XlsxWriterSpec extends SparkSpec {
  import spark.implicits._

  private def readPart(path: String, part: String): String = {
    val zf = new ZipFile(path)
    try {
      val entry = zf.getEntry(part)
      assert(entry != null, s"missing zip part $part")
      Source.fromInputStream(zf.getInputStream(entry), "UTF-8").mkString
    } finally zf.close()
  }

  test("xlsx export round-trips a template frame through the zip parts") {
    val template = Seq(
      ("C07|R_corporate|C0010", 12345.67),
      ("C07|R_retail|C0220", 89.5))
      .toDF("cell_id", "value")
    val path = java.nio.file.Files
      .createTempFile("graft-template", ".xlsx").toString
    XlsxWriter.write(template, path, sheetName = "C 07.00")
    // all four mandatory parts present
    Seq("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
      "xl/worksheets/sheet1.xml").foreach(p => readPart(path, p))
    val sheet = readPart(path, "xl/worksheets/sheet1.xml")
    assert(sheet.contains("<t>cell_id</t>"), "header row missing")
    assert(sheet.contains("<t>C07|R_corporate|C0010</t>"), "string cell missing")
    assert(sheet.contains("<v>12345.67</v>"), "numeric cell missing")
    val wb = readPart(path, "xl/workbook.xml")
    assert(wb.contains("""name="C 07.00""""), "sheet name missing")
  }

  test("xlsx export refuses fact-scale frames") {
    val big = spark.range(50).toDF("id")
    intercept[IllegalArgumentException] {
      XlsxWriter.write(big, java.nio.file.Files
        .createTempFile("graft-big", ".xlsx").toString, maxRows = 10)
    }
  }
}
