package graft.reporting

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The run's template estate as a browsable catalog (reference
  * `reporting/catalog.py` `template_index` / `template_sheet`, served by
  * `api/rest.py:325-370`): every generated COREP / Pillar 3 template the
  * engine emits, keyed by its published template id, with the
  * readable-name banner map the workbook export prints above the
  * regulatory column refs (`reporting/kernel/excel.py`
  * `column_name_map`).
  *
  * Each entry points at the SAME QueryDef the correctness battery runs —
  * the catalog never re-specifies a sheet, it only names and caches it:
  * `sheet(...)` reads through [[TemplateBundle]], so the REST surface,
  * the workbook export and the cross-template consumers all see one
  * generated frame per (session, dir, template). Bundle keys reuse the
  * gate's existing keys ("c02"/"c0901"/"c0902"/"c07"/"c0801"/"c02val")
  * where a consumer already caches that sheet.
  *
  * Banner names are the PUBLISHED EBA/PRA column names (Regulation (EU)
  * 2021/451 Annex I/II; CRR Part 8 disclosure templates) — public
  * regulator material, the same vocabulary the reference's
  * `templates.py` column definitions carry.
  */
object TemplateCatalog {

  /** One catalog entry: published template id, family (corep |
    * pillar3 | analysis), a human title, the backing query name in
    * [[graft.SparkEntry.queries]], the bundle memo key, and the frame
    * column (if any) that splits the template into per-key sheets. */
  final case class TemplateInfo(
      id: String, family: String, title: String, query: String,
      bundleKey: String, sheetCol: Option[String] = None)

  val index: Seq[TemplateInfo] = Seq(
    TemplateInfo("C02.00", "corep", "Own funds requirements",
      "q140_corep_c02", "c02"),
    TemplateInfo("C07.00", "corep",
      "Credit risk SA — cells and footing checks",
      "q94_corep_template", "c07"),
    TemplateInfo("C08.01", "corep",
      "Credit risk IRB — cells and footing checks",
      "q121_corep_c08", "c0801"),
    TemplateInfo("C08.02", "corep",
      "Credit risk IRB: breakdown by obligor grade",
      "q128_corep_c0802", "c0802", sheetCol = Some("exposure_class")),
    TemplateInfo("C08.03", "corep",
      "Credit risk IRB: breakdown by PD range",
      "q144_corep_c0803", "c0803"),
    TemplateInfo("C08.05", "corep",
      "Credit risk IRB: back-testing of PD",
      "q148_corep_c0805", "c0805", sheetCol = Some("exposure_class")),
    TemplateInfo("C08.06", "corep",
      "Credit risk IRB: specialised lending slotting approach",
      "q172_corep_c0806", "c0806"),
    TemplateInfo("C08.07", "corep",
      "Credit risk IRB: scope of use of IRB and SA approaches",
      "q149_corep_c0807", "c0807"),
    TemplateInfo("C09.01", "corep",
      "Geographical breakdown of SA exposures by obligor residence",
      "q158_corep_c09", "c0901", sheetCol = Some("country")),
    TemplateInfo("C09.02", "corep",
      "Geographical breakdown of IRB exposures by obligor residence",
      "q160_corep_c0902", "c0902", sheetCol = Some("country")),
    TemplateInfo("C34.02", "corep", "CCR exposures by approach",
      "q141_corep_c34", "c34", sheetCol = Some("template")),
    TemplateInfo("OF02.01", "corep", "Output floor calculation",
      "q138_of0201", "of0201"),
    TemplateInfo("C02VAL", "corep", "C 02.00 validation rules",
      "q147_c02_validations", "c02val"),
    TemplateInfo("OV1", "pillar3", "Overview of risk weighted exposure amounts",
      "q130_ov1_overview", "ov1"),
    TemplateInfo("CR4", "pillar3",
      "SA exposures and CRM effects",
      "q102_pillar3_cr4", "cr4"),
    TemplateInfo("CR5", "pillar3", "SA exposures by risk weight",
      "q161_pillar3_cr5", "cr5"),
    TemplateInfo("CR6", "pillar3",
      "IRB exposures by exposure class and PD range",
      "q120_pillar3_cr6", "cr6", sheetCol = Some("exposure_class")),
    TemplateInfo("CR6-A", "pillar3", "Scope of the use of IRB and SA approaches",
      "q137_cr6a_scope", "cr6a"),
    TemplateInfo("CR7", "pillar3",
      "Effect on RWEA of credit derivatives used as CRM",
      "q123_cr7_crm_effects", "cr7"),
    TemplateInfo("CR7-A", "pillar3", "Extent of the use of CRM techniques",
      "q139_cr7a_crm_extent", "cr7a"),
    TemplateInfo("CR8", "pillar3", "RWEA flow statement of credit risk exposures",
      "q122_cr8_flow", "cr8"),
    TemplateInfo("CR9", "pillar3", "Back-testing of PD per exposure class",
      "q145_cr9_full", "cr9", sheetCol = Some("sheet_key")),
    TemplateInfo("CR9.1", "pillar3",
      "Back-testing of PD per exposure class (point-in-time grades)",
      "q150_cr9_1", "cr91", sheetCol = Some("sheet_key")),
    TemplateInfo("CR10", "pillar3", "Specialised lending (slotting approach)",
      "q131_cr10_slotting", "cr10"),
    TemplateInfo("CCR1", "pillar3", "Analysis of CCR exposure by approach",
      "q134_ccr1", "ccr1"),
    TemplateInfo("CCR2", "pillar3", "CVA capital charge",
      "q143_ccr2", "ccr2"),
    TemplateInfo("CCR3", "pillar3", "CCR exposures by risk weight",
      "q135_ccr3", "ccr3"),
    TemplateInfo("CCR8", "pillar3", "Exposures to central counterparties",
      "q136_ccr8", "ccr8"),
    TemplateInfo("CMS1", "pillar3", "Comparison of modelled and SA RWEA",
      "q132_cms1", "cms1"),
    TemplateInfo("CMS2", "pillar3", "Modelled RWEA vs SA-equivalent by class",
      "q133_cms2", "cms2"))

  private val byId: Map[String, TemplateInfo] =
    index.map(t => t.id -> t).toMap

  def info(id: String): Option[TemplateInfo] = byId.get(id)

  // ---- published column-name banners -----------------------------------

  private val c0901Banner = Map(
    "c0010" -> "Original exposure pre conversion factors",
    "c0020" -> "Defaulted exposures",
    "c0040" -> "Observed new defaults for the period",
    "c0050" -> "General credit risk adjustments",
    "c0055" -> "Specific credit risk adjustments",
    "c0060" -> "Write-offs",
    "c0061" -> "Additional value adjustments and other own funds reductions",
    "c0070" -> "Credit risk adjustments/write-offs for observed new defaults",
    "c0075" -> "Exposure value",
    "c0080" -> "RWEA pre supporting factors",
    "c0081" -> "(-) SME supporting factor adjustment",
    "c0082" -> "(-) Infrastructure supporting factor adjustment",
    "c0090" -> "RWEA after supporting factors",
    "n_rows" -> "Number of exposure legs")

  private val c0902Banner = Map(
    "c0010" -> "Original exposure pre conversion factors",
    "c0030" -> "Of which: defaulted",
    "c0040" -> "Observed new defaults for the period",
    "c0050" -> "General credit risk adjustments",
    "c0055" -> "Specific credit risk adjustments",
    "c0060" -> "Write-offs",
    "c0070" -> "Credit risk adjustments/write-offs for observed new defaults",
    "c0080" -> "PD assigned to the obligor grade or pool (%)",
    "c0090" -> "Exposure weighted average LGD (%)",
    "c0100" -> "Of which: defaulted (LGD)",
    "c0105" -> "Exposure value",
    "c0110" -> "RWEA pre supporting factors",
    "c0120" -> "Of which: defaulted (RWEA)",
    "c0121" -> "(-) SME supporting factor adjustment",
    "c0122" -> "(-) Infrastructure supporting factor adjustment",
    "c0125" -> "RWEA after supporting factors",
    "c0130" -> "Expected loss amount",
    "n_rows" -> "Number of exposure legs")

  private val irbGradeBanner = Map(
    "pd_range" -> "PD range assigned to the obligor grade or pool",
    "n_exposures" -> "Number of exposures",
    "n_obligors" -> "Number of obligors",
    "orig_exposure" -> "Original exposure pre conversion factors",
    "subst_outflow" -> "(-) Substitution outflows",
    "net_origin_exposure" -> "Net exposure after substitution effects",
    "gross_on_bs" -> "On-balance-sheet gross exposure",
    "gross_off_bs" -> "Off-balance-sheet exposure pre CCF",
    "avg_ccf" -> "Exposure weighted average CCF (%)",
    "ead" -> "Exposure value",
    "ead_total" -> "Exposure value",
    "ead_w_pd_pct" -> "Exposure weighted average PD (%)",
    "ead_w_lgd_pct" -> "Exposure weighted average LGD (%)",
    "ead_w_maturity_y" -> "Exposure weighted average maturity (years)",
    "ead_w_maturity" -> "Exposure weighted average maturity (years)",
    "rwea" -> "Risk weighted exposure amount",
    "rwa_density" -> "Density of risk weighted exposure amount",
    "expected_loss" -> "Expected loss amount",
    "is_parent" -> "Aggregate band row")

  private val pdBacktestBanner = Map(
    "pd_range" -> "PD range",
    "grade" -> "Obligor grade",
    "grade_ref" -> "Grade code",
    "mean_pd_pct" -> "Arithmetic average PD by obligors (%)",
    "ead_w_pd_pct" -> "Exposure weighted average PD (%)",
    "n_obligors" -> "Number of obligors at end of previous year",
    "n_defaulted" -> "Of which: defaulted during the year",
    "n_defaulted_obligors" -> "Of which: defaulted during the year",
    "observed_rate_pct" -> "Observed average default rate (%)",
    "hist_rate_pct" -> "Average historical annual default rate (%)",
    "class_display" -> "Exposure class")

  private val banners: Map[String, Map[String, String]] = Map(
    "C02.00" -> Map("item" -> "Item",
      "rwea_crr" -> "Risk exposure amount (CRR)",
      "rwea_b31" -> "Risk exposure amount (Basel 3.1)"),
    "C08.02" -> irbGradeBanner,
    "C08.03" -> irbGradeBanner,
    "C08.05" -> pdBacktestBanner,
    "C08.07" -> Map(
      "n_exposures" -> "Number of exposures",
      "ead_irb" -> "Exposure value under IRB",
      "ead_total" -> "Total exposure value",
      "pct_ppu_sa" -> "Exposure value under permanent partial use of SA (%)",
      "pct_rollout" -> "Exposure value under roll-out plan (%)",
      "pct_irb" -> "Exposure value under IRB (%)"),
    "C09.01" -> c0901Banner,
    "C09.02" -> c0902Banner,
    "CR4" -> Map(
      "on_bs_pre" -> "On-balance-sheet exposures pre CCF and CRM",
      "off_bs_pre" -> "Off-balance-sheet exposures pre CCF and CRM",
      "on_bs_post" -> "On-balance-sheet exposures post CCF and CRM",
      "off_bs_post" -> "Off-balance-sheet exposures post CCF and CRM",
      "rwea" -> "Risk weighted exposure amount",
      "rwea_density" -> "RWEA density (%)"),
    "CR6" -> irbGradeBanner,
    "CR9" -> pdBacktestBanner,
    "CR9.1" -> pdBacktestBanner,
    "OV1" -> Map("risk_type" -> "Risk category",
      "rwea_crr" -> "Risk weighted exposure amounts (CRR)",
      "rwea_b31" -> "Risk weighted exposure amounts (Basel 3.1)",
      "own_funds_req" -> "Total own funds requirements"))

  /** The readable-name banner map for a template; empty map (pure
    * humanise fallback in the writer) when no published vocabulary is
    * registered. */
  def banner(id: String): Map[String, String] =
    banners.getOrElse(id, Map.empty)

  /** The generated frame for a template id, through the run bundle —
    * one build + collect per (session, dir, template id). */
  def sheet(s: SparkSession, dir: String, id: String): Option[DataFrame] =
    byId.get(id).map { t =>
      TemplateBundle.generated(s, dir, t.bundleKey,
        graft.SparkEntry.queries(t.query)(s, dir))
    }

  /** The template's [[XlsxWriter.Sheet]]s for the workbook export: one
    * worksheet for an unsheeted template, one per sheet-key value
    * (country / exposure class / netting template) otherwise. */
  def workbookSheets(
      s: SparkSession, dir: String, t: TemplateInfo): Seq[XlsxWriter.Sheet] = {
    val df = sheet(s, dir, t.id).get
    t.sheetCol match {
      case None => Seq(XlsxWriter.Sheet(t.id, df, banner(t.id)))
      case Some(c) =>
        import org.apache.spark.sql.functions.col
        val keys = df.select(col(c)).distinct().collect()
          .map(_.get(0).toString).sorted.toSeq
        keys.map(k =>
          XlsxWriter.Sheet(s"${t.id} $k", df.filter(col(c) === k), banner(t.id)))
    }
  }
}
