package graft.reporting

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Workbook-level exports (reference `api/export.py:262-342`
  * `export_to_corep` / `export_to_pillar3`, `:506-578` the
  * reconciliation exports): assemble the estate's generated sheets into
  * ONE multi-sheet xlsx with the readable-name header band, a
  * filing-metadata sheet leading (reference
  * `reporting/kernel/excel.py::write_metadata_sheet`), and per-key
  * worksheets for the sheeted templates (one per country / exposure
  * class).
  *
  * Scale posture: every sheet rides [[TemplateBundle]]'s
  * presentation-grain collection (a few hundred rows per template by
  * construction), so the workbook build is driver-side string work over
  * already-reduced frames; the 100 TB paths stay in the parquet/CSV
  * sinks (`sources/Loader`). The reconciliation CSV export keeps the
  * per-key forensic frame DISTRIBUTED (Spark CSV writer) — only the
  * bounded summary/worklist tiers enter the workbook.
  */
object WorkbookExport {

  /** Filing metadata stamped as the workbook's leading sheet (reference
    * `reporting/facts.py::FilingMetadata`): label/value pairs, written
    * as a two-column sheet. */
  def metadataSheet(s: SparkSession, pairs: Seq[(String, String)]): XlsxWriter.Sheet = {
    val schema = StructType(Seq(
      StructField("label", StringType), StructField("value", StringType)))
    val rows: java.util.List[Row] =
      java.util.Arrays.asList(pairs.map(p => Row(p._1, p._2)): _*)
    XlsxWriter.Sheet("metadata", s.createDataFrame(rows, schema),
      Map("label" -> "Item", "value" -> "Value"))
  }

  private def familyWorkbook(
      s: SparkSession, dir: String, path: String, family: String,
      metadata: Seq[(String, String)]): Int = {
    val sheets = TemplateCatalog.index.filter(_.family == family)
      .flatMap(t => TemplateCatalog.workbookSheets(s, dir, t))
    XlsxWriter.writeWorkbook(metadataSheet(s, metadata) +: sheets, path)
    sheets.size
  }

  /** The COREP return workbook: C 02.00 / C 07.00 / C 08.x / C 09.x /
    * C 34.02 / OF 02.01 plus the C 02 validation sheet, one worksheet
    * per template sheet key. Returns the worksheet count (metadata
    * excluded). */
  def corepWorkbook(s: SparkSession, dir: String, path: String,
      metadata: Seq[(String, String)] = Nil): Int =
    familyWorkbook(s, dir, path, "corep", metadata)

  /** The Pillar 3 disclosure workbook: OV1 / CR4-CR10 / CCR / CMS. */
  def pillar3Workbook(s: SparkSession, dir: String, path: String,
      metadata: Seq[(String, String)] = Nil): Int =
    familyWorkbook(s, dir, path, "pillar3", metadata)

  /** The reconciliation workbook (reference
    * `export_reconciliation_to_excel`): bounded tiers as worksheets —
    * By Bucket (summary), Breaks (ranked worklist), Reconciliation (the
    * per-key forensic frame, guarded by the writer's template-scale
    * cap — export a data-scale recon via [[reconCsv]] instead). Empty
    * frames are skipped, as the reference does. */
  def reconWorkbook(
      result: graft.api.ReconciliationResult, path: String): Int = {
    val sheets = Seq(
      "By Bucket" -> result.summary,
      "Breaks" -> result.worklist,
      "Reconciliation" -> result.recon).collect {
      case (name, Some(df)) if !df.isEmpty => XlsxWriter.Sheet(name, df)
    }
    require(sheets.nonEmpty, "reconciliation produced no frames to export")
    XlsxWriter.writeWorkbook(sheets, path)
    sheets.size
  }

  /** The reconciliation CSV export (reference
    * `export_reconciliation_to_csv`): one CSV dataset per tier under
    * `dir` — the forensic frame stays distributed (Spark CSV writer),
    * so this is the scale path for a 100 TB parallel run. */
  def reconCsv(result: graft.api.ReconciliationResult, dir: String): Seq[String] =
    Seq("summary_by_bucket" -> result.summary,
      "breaks_worklist" -> result.worklist,
      "reconciliation" -> result.recon).collect {
      case (name, Some(df)) =>
        val p = s"$dir/reconciliation_$name"
        graft.sources.Sinks.writeCsv(df, p)
        p
    }
}
