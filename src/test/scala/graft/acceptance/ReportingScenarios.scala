package graft.acceptance

import java.sql.Date

import org.apache.spark.sql.SparkSession

import graft.refbook.{RefBundle, RefRunConfig}

/** Scenario input portfolios for the reporting-golden replay — programmatic
  * translations of the reference's fixture builders (INPUT data, not golden
  * data). Each scenario pairs one [[RefBundle]] with the two regime configs
  * the reference freezes goldens for.
  *
  * `sa_classes`: the SA quasi-sovereign portfolio (reference
  * `tests/fixtures/reporting_sa_classes_portfolio.py:96-307`) — one drawn,
  * unmitigated GBP term loan per C 07.00 obligor-class sheet (RGLA ×2 for
  * the Art. 115(1)/(2) fork, PSE, MDB ×2 for the Art. 117(1)/(2) fork,
  * international organisation, covered bond, and a corporate anchor above
  * the SME ceiling), with external-only ECAI ratings so every row routes
  * SA. Reporting dates / permission mode per the golden test's `_config`
  * (`test_reporting_sa_classes_golden.py:76-86`): CRR at 2025-12-31,
  * Basel 3.1 at 2027-06-01, both STANDARDISED.
  */
// Top-level row shapes (Spark bean/product encoders need public top-level
// case classes — a private nested class breaks codegen).
final case class ScnCp(counterparty_reference: String, entity_type: String,
    country_code: String, annual_revenue: Option[Double] = None)
final case class ScnLoan(loan_reference: String,
    counterparty_reference: String, product_type: String, drawn_amount: Double,
    currency: String, value_date: Date, maturity_date: Date, seniority: String)
final case class ScnRating(rating_reference: String,
    counterparty_reference: String, rating_type: String, rating_agency: String,
    cqs: Int, rating_date: Date)
final case class ScnContingent(contingent_reference: String,
    counterparty_reference: String, product_type: String,
    nominal_amount: Double, risk_type: Option[String],
    obs_product: Option[String], currency: String, value_date: Date,
    maturity_date: Date)
final case class ScnFacility(facility_reference: String,
    counterparty_reference: String, product_type: String, limit: Double,
    risk_type: String, currency: String, value_date: Date,
    maturity_date: Date, committed: Boolean)
final case class ScnFacMapping(parent_facility_reference: String,
    child_reference: String, child_type: String)
final case class ScnRatingFull(rating_reference: String,
    counterparty_reference: String, rating_type: String,
    rating_agency: Option[String], cqs: Option[Int], pd: Option[Double],
    rating_date: Date)
final case class ScnIrbLoan(loan_reference: String,
    counterparty_reference: String, product_type: String, drawn_amount: Double,
    currency: String, value_date: Date, maturity_date: Date, seniority: String,
    lgd: Option[Double], has_sufficient_collateral_data: Option[Boolean],
    property_type: Option[String], ltv: Option[Double])
final case class ScnIrbFacility(facility_reference: String,
    counterparty_reference: String, product_type: String, limit: Double,
    risk_type: String, currency: String, value_date: Date, maturity_date: Date,
    committed: Boolean, is_revolving: Boolean, is_secured: Boolean,
    is_qrre_transactor: Boolean, seniority: String)
final case class ScnCollateral(collateral_reference: String,
    collateral_type: String, property_type: String, market_value: Double,
    property_ltv: Double, beneficiary_type: String, beneficiary_reference: String)
final case class ScnModelPermission(model_id: String, approach: String)
final case class ScnCpRetail(counterparty_reference: String, entity_type: String,
    country_code: String, annual_revenue: Option[Double],
    is_natural_person: Option[Boolean], is_managed_as_retail: Option[Boolean])
final case class ScnCpCcr(counterparty_reference: String, entity_type: String,
    country_code: String, annual_revenue: Option[Double], is_qccp: Option[Boolean])
final case class ScnTrade(trade_id: String, netting_set_id: String,
    asset_class: String, notional: Double, currency: String,
    maturity_date: Date, start_date: Date, delta: Double, is_long: Boolean,
    mtm_value: Double)
final case class ScnNettingSet(netting_set_id: String,
    counterparty_reference: String, is_legally_enforceable: Boolean,
    is_margined: Boolean)
final case class ScnRichLoan(loan_reference: String,
    counterparty_reference: String, drawn_amount: Double, currency: String,
    maturity_date: Date, seniority: String, lgd: Option[Double],
    has_sufficient_collateral_data: Boolean, is_defaulted: Boolean,
    has_income_cover: Boolean, property_type: Option[String],
    ltv: Option[Double])
final case class ScnSpecialisedLending(counterparty_reference: String,
    sl_type: String, slotting_category: String, is_hvcre: Boolean)
final case class ScnEquity(exposure_reference: String,
    counterparty_reference: String, equity_type: String, currency: String,
    carrying_value: Double, fair_value: Double)
final case class ScnGuarantee(guarantee_reference: String, guarantor: String,
    currency: String, maturity_date: Date, amount_covered: Double,
    percentage_covered: Double, beneficiary_type: String,
    beneficiary_reference: String, protection_type: String,
    original_maturity_years: Double, guarantor_seniority: String)

object ReportingScenarios {

  final case class Scenario(goldenDir: String, cfg: RefRunConfig,
      bundle: SparkSession => RefBundle)

  private val valueDate = Date.valueOf("2020-01-01")
  private val maturity = Date.valueOf("2031-12-31")

  /** The SA quasi-sovereign book
    * (`reporting_sa_classes_portfolio.py:188-307`). */
  def saClassesBundle(spark: SparkSession): RefBundle = {
    import spark.implicits._
    val cps = Seq(
      ScnCp("SAC-CP-RGLA-UK", "rgla_sovereign", "GB"),
      ScnCp("SAC-CP-RGLA-FGN", "rgla_institution", "US"),
      ScnCp("SAC-CP-PSE", "pse_institution", "GB"),
      ScnCp("SAC-CP-MDB-RATED", "mdb", "GB"),
      ScnCp("SAC-CP-MDB-NAMED", "mdb_named", "GB"),
      ScnCp("SAC-CP-INTL-ORG", "international_org", "GB"),
      ScnCp("SAC-CP-COVBOND", "covered_bond", "GB"),
      ScnCp("SAC-CP-CORP", "corporate", "GB", Some(400000000.0)))
    def loan(ref: String, cp: String, drawn: Double) =
      ScnLoan(ref, cp, "term_loan", drawn, "GBP", valueDate, maturity, "senior")
    val loans = Seq(
      loan("SAC-LN-RGLA-UK", "SAC-CP-RGLA-UK", 3000000.0),
      loan("SAC-LN-RGLA-FGN", "SAC-CP-RGLA-FGN", 3500000.0),
      loan("SAC-LN-PSE", "SAC-CP-PSE", 2500000.0),
      loan("SAC-LN-MDB-RATED", "SAC-CP-MDB-RATED", 4000000.0),
      loan("SAC-LN-MDB-NAMED", "SAC-CP-MDB-NAMED", 4500000.0),
      loan("SAC-LN-INTL-ORG", "SAC-CP-INTL-ORG", 1500000.0),
      loan("SAC-LN-COVBOND", "SAC-CP-COVBOND", 6000000.0),
      loan("SAC-LN-CORP", "SAC-CP-CORP", 9000000.0))
    def ext(cp: String, cqs: Int) =
      ScnRating(s"SAC-RTG-$cp", cp, "external", "TEST_AGENCY", cqs, valueDate)
    val ratings = Seq(
      ext("SAC-CP-RGLA-FGN", 2), ext("SAC-CP-PSE", 2), ext("SAC-CP-MDB-RATED", 2),
      ext("SAC-CP-COVBOND", 1), ext("SAC-CP-CORP", 3))
    RefBundle(
      counterparties = cps.toDF(),
      loans = loans.toDF(),
      ratings = ratings.toDF())
  }

  /** The off-balance-sheet CCF-axis book (reference
    * `tests/fixtures/reporting_offbs_portfolio.py:193-420`): one drawn
    * corporate anchor loan under `FAC_OC`, four ISSUED contingents (one per
    * issued-item CCF bucket — the documentary credit deliberately carries
    * NO explicit risk_type, proving the Art. 111(1) obs_product → risk_type
    * fill end-to-end), and three COMMITMENTS whose synthetic undrawn rows
    * land in the remaining buckets (`FAC_OC` is the regime-divergent row:
    * CRR item 2(b) 50% vs Table A1 Row 5 40%; `FAC_UCC` is the headline
    * 0% → 10% UCC move). */
  def offbsBundle(spark: SparkSession): RefBundle = {
    import spark.implicits._
    val cps = Seq(
      ScnCp("OBS-CP-CORP", "corporate", "GB", Some(250000000.0)),
      ScnCp("OBS-CP-INST", "institution", "GB"))
    val loans = Seq(ScnLoan("OBS-LN-CORP", "OBS-CP-CORP", "term_loan",
      4000000.0, "GBP", valueDate, maturity, "senior"))
    def ext(ref: String, cp: String, cqs: Int) =
      ScnRating(ref, cp, "external", "TEST_AGENCY", cqs, valueDate)
    val ratings = Seq(
      ext("OBS-RTG-CORP", "OBS-CP-CORP", 3), ext("OBS-RTG-INST", "OBS-CP-INST", 2))
    val contingents = Seq(
      ScnContingent("OBS-CT-GUARANTEE", "OBS-CP-CORP", "financial_guarantee",
        2000000.0, Some("FR"), None, "GBP", valueDate, maturity),
      ScnContingent("OBS-CT-DOCCREDIT", "OBS-CP-CORP", "documentary_credit",
        1500000.0, None, Some("DOCUMENTARY_CREDIT"), "GBP", valueDate, maturity),
      ScnContingent("OBS-CT-STANDBY", "OBS-CP-CORP", "standby_lc",
        1000000.0, Some("MR_ISSUED"), None, "GBP", valueDate, maturity),
      ScnContingent("OBS-CT-FRC-FWD", "OBS-CP-INST", "forward_asset_purchase",
        2500000.0, Some("FRC"), None, "GBP", valueDate, maturity))
    val facilities = Seq(
      ScnFacility("OBS-FAC-NIF", "OBS-CP-CORP", "note_issuance_facility",
        5000000.0, "MR", "GBP", valueDate, maturity, committed = true),
      ScnFacility("OBS-FAC-OC", "OBS-CP-CORP", "revolving_credit_facility",
        10000000.0, "OC", "GBP", valueDate, maturity, committed = true),
      ScnFacility("OBS-FAC-UCC", "OBS-CP-CORP", "overdraft",
        3000000.0, "LR", "GBP", valueDate, maturity, committed = true))
    val mappings = Seq(ScnFacMapping("OBS-FAC-OC", "OBS-LN-CORP", "loan"))
    RefBundle(
      counterparties = cps.toDF(),
      loans = loans.toDF(),
      ratings = ratings.toDF(),
      facilities = Some(facilities.toDF()),
      contingents = Some(contingents.toDF()),
      facilityMappings = Some(mappings.toDF()))
  }

  /** The IRB class-and-PD-band book (reference
    * `tests/fixtures/reporting_irb_classes_portfolio.py`): three sovereigns
    * (US/CA/JP — the CRR-only IRB sovereign sheet, unfloored PDs), one
    * institution, an A-IRB residential mortgage (property collateral, LTV
    * 60%), an A-IRB QRRE drawn to its revolving facility's limit, and the
    * fourteen-grade corporate masterscale (one obligor per C 08.03 leaf
    * band). Internal-PD ratings only + a full model-permission grant, run
    * under PermissionMode.IRB at the same reporting dates. */
  def irbClassesBundle(spark: SparkSession): RefBundle = {
    import spark.implicits._
    val masterscale = Seq(
      "G01" -> 0.0002, "G02" -> 0.0007, "G03" -> 0.0012, "G04" -> 0.0020,
      "G05" -> 0.0035, "G06" -> 0.0060, "G07" -> 0.0120, "G08" -> 0.0200,
      "G09" -> 0.0350, "G10" -> 0.0700, "G11" -> 0.1200, "G12" -> 0.2500,
      "G13" -> 0.4000, "G14" -> 0.7000)
    def corpCp(g: String) = s"IRC-CP-CORP-$g"
    def corpLn(g: String) = s"IRC-LN-CORP-$g"
    val cps = Seq(
      ScnCpRetail("IRC-CP-SOV-A", "sovereign", "US", None, None, None),
      ScnCpRetail("IRC-CP-SOV-B", "sovereign", "CA", None, None, None),
      ScnCpRetail("IRC-CP-SOV-C", "sovereign", "JP", None, None, None),
      ScnCpRetail("IRC-CP-INST", "institution", "GB", None, None, None),
      ScnCpRetail("IRC-CP-RRE", "individual", "GB", None, Some(true), Some(true)),
      ScnCpRetail("IRC-CP-QRRE", "individual", "GB", None, Some(true), Some(true))) ++
      masterscale.map { case (g, _) =>
        ScnCpRetail(corpCp(g), "corporate", "GB", Some(400000000.0), None, None) }
    def ln(ref: String, cp: String, drawn: Double, lgd: Option[Double] = None,
        hscd: Option[Boolean] = None, pt: Option[String] = None,
        ltv: Option[Double] = None, product: String = "term_loan") =
      ScnIrbLoan(ref, cp, product, drawn, "GBP", valueDate, maturity, "senior",
        lgd, hscd, pt, ltv)
    val loans = Seq(
      ln("IRC-LN-SOV-A", "IRC-CP-SOV-A", 8000000.0),
      ln("IRC-LN-SOV-B", "IRC-CP-SOV-B", 7000000.0),
      ln("IRC-LN-SOV-C", "IRC-CP-SOV-C", 6000000.0),
      ln("IRC-LN-INST", "IRC-CP-INST", 5500000.0),
      ln("IRC-LN-RRE", "IRC-CP-RRE", 300000.0, Some(0.15), Some(true),
        Some("residential"), Some(0.60)),
      ln("IRC-LN-QRRE", "IRC-CP-QRRE", 45000.0, Some(0.55), Some(true),
        product = "revolving_credit_facility")) ++
      masterscale.zipWithIndex.map { case ((g, _), i) =>
        ln(corpLn(g), corpCp(g), 3000000.0 + 100000.0 * i) }
    def internal(cp: String, pd: Double) = ScnRatingFull(
      s"IRC-RTG-$cp", cp, "internal", None, None, Some(pd), valueDate)
    val ratings = Seq(
      internal("IRC-CP-SOV-A", 0.0002), internal("IRC-CP-SOV-B", 0.0004),
      internal("IRC-CP-SOV-C", 0.0007), internal("IRC-CP-INST", 0.0040),
      internal("IRC-CP-RRE", 0.0060), internal("IRC-CP-QRRE", 0.0200)) ++
      masterscale.map { case (g, pd) => internal(corpCp(g), pd) }
    val facilities = Seq(ScnIrbFacility("IRC-FAC-QRRE", "IRC-CP-QRRE",
      "revolving_credit_facility", 45000.0, "LR", "GBP", valueDate, maturity,
      committed = true, is_revolving = true, is_secured = false,
      is_qrre_transactor = false, seniority = "senior"))
    val mappings = Seq(ScnFacMapping("IRC-FAC-QRRE", "IRC-LN-QRRE", "loan"))
    val collateral = Seq(ScnCollateral("IRC-COLL-RRE", "real_estate",
      "residential", 500000.0, 0.60, "loan", "IRC-LN-RRE"))
    val permissions = Seq(ScnModelPermission("TEST_FULL_IRB", "all"))
    RefBundle(
      counterparties = cps.toDF(),
      loans = loans.toDF(),
      ratings = ratings.toDF(),
      facilities = Some(facilities.toDF()),
      facilityMappings = Some(mappings.toDF()),
      collateral = Some(collateral.toDF()),
      modelPermissions = Some(permissions.toDF()))
  }

  /** The CCR book (reference `tests/fixtures/reporting_ccr_portfolio.py` +
    * `tests/fixtures/ccr/trade_builder.py` CCR-A1 defaults): one plain
    * corporate loan, and two identical unmargined 10y GBP at-par IR swaps
    * (notional 100m, start 2026-01-15, maturity 2036-01-15) — one faced to
    * a CQS-2 institution, one to a QCCP — so the only template difference
    * is the Art. 306 QCCP treatment. */
  def ccrBundle(spark: SparkSession): RefBundle = {
    import spark.implicits._
    val cps = Seq(
      ScnCpCcr("CP_CCR_INST", "institution", "GB", None, None),
      ScnCpCcr("CP_CCR_QCCP", "ccp", "GB", None, Some(true)),
      ScnCpCcr("CP_CCR_CORP", "corporate", "GB", Some(100000000.0), None))
    val loans = Seq(ScnLoan("LN_CCR_CORP", "CP_CCR_CORP", "term_loan",
      5000000.0, "GBP", valueDate, Date.valueOf("2030-12-31"), "senior"))
    def ext(ref: String, cp: String) =
      ScnRating(ref, cp, "external", "S&P", 2, Date.valueOf("2025-12-31"))
    val ratings = Seq(ext("RTG_CCR_INST", "CP_CCR_INST"),
      ext("RTG_CCR_CORP", "CP_CCR_CORP"))
    def swap(id: String, ns: String) = ScnTrade(id, ns, "interest_rate",
      100000000.0, "GBP", Date.valueOf("2036-01-15"), Date.valueOf("2026-01-15"),
      1.0, is_long = true, mtm_value = 0.0)
    val trades = Seq(swap("T_CCR_BILAT", "NS_CCR_BILAT"),
      swap("T_CCR_QCCP", "NS_CCR_QCCP"))
    val nss = Seq(
      ScnNettingSet("NS_CCR_BILAT", "CP_CCR_INST",
        is_legally_enforceable = false, is_margined = false),
      ScnNettingSet("NS_CCR_QCCP", "CP_CCR_QCCP",
        is_legally_enforceable = false, is_margined = false))
    RefBundle(
      counterparties = cps.toDF(),
      loans = loans.toDF(),
      ratings = ratings.toDF(),
      trades = Some(trades.toDF()),
      nettingSets = Some(nss.toDF()))
  }

  /** The rich multi-class book (reference
    * `tests/fixtures/reporting_portfolio.py`): one exposure per loan-based
    * reporting bucket — SA sovereign/institution/corporates (rated,
    * unrated, SME)/retail/RRE/CRE/defaulted/other-items, F-IRB and A-IRB
    * corporates, A-IRB retail, a strong project-finance slotting exposure
    * (granted model, no PD) and one listed equity holding — run under IRB
    * permission in both regimes. */
  def richBundle(spark: SparkSession): RefBundle = {
    import spark.implicits._
    val cps = Seq(
      ScnCpRetail("RP-CP-SOV", "sovereign", "GB", None, None, None),
      ScnCpRetail("RP-CP-INST", "institution", "GB", None, None, None),
      ScnCpRetail("RP-CP-CORP-RATED", "corporate", "GB", Some(100000000.0), None, None),
      ScnCpRetail("RP-CP-CORP-UNRATED", "corporate", "GB", Some(60000000.0), None, None),
      ScnCpRetail("RP-CP-SME", "corporate", "GB", Some(30000000.0), None, None),
      ScnCpRetail("RP-CP-RETAIL", "individual", "GB", None, Some(true), Some(true)),
      ScnCpRetail("RP-CP-RRE", "individual", "GB", None, Some(true), Some(true)),
      ScnCpRetail("RP-CP-CRE", "corporate", "GB", Some(200000000.0), None, None),
      ScnCpRetail("RP-CP-DEFAULT", "corporate", "GB", Some(50000000.0), None, None),
      ScnCpRetail("RP-CP-OTHER", "other_items_in_collection", "GB", None, None, None),
      ScnCpRetail("RP-CP-FIRB", "corporate", "GB", Some(100000000.0), None, None),
      ScnCpRetail("RP-CP-AIRB", "corporate", "GB", Some(30000000.0), None, None),
      ScnCpRetail("RP-CP-AIRB-RET", "individual", "GB", None, Some(true), Some(true)),
      ScnCpRetail("RP-CP-SL", "corporate", "GB", Some(200000000.0), None, None),
      ScnCpRetail("RP-CP-EQUITY", "corporate", "GB", Some(200000000.0), None, None))
    // the defaulted obligor carries default_status on the counterparty
    val cpDf = cps.toDF().withColumn("default_status",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("counterparty_reference") === "RP-CP-DEFAULT",
        true))
    def ln(ref: String, cp: String, drawn: Double, lgd: Option[Double] = None,
        hscd: Boolean = false, dflt: Boolean = false, cover: Boolean = false,
        pt: Option[String] = None, ltv: Option[Double] = None) =
      ScnRichLoan(ref, cp, drawn, "GBP", maturity, "senior", lgd, hscd, dflt,
        cover, pt, ltv)
    val loans = Seq(
      ln("RP-LN-SOV", "RP-CP-SOV", 1000000.0),
      ln("RP-LN-INST", "RP-CP-INST", 2000000.0),
      ln("RP-LN-CORP-RATED", "RP-CP-CORP-RATED", 5000000.0),
      ln("RP-LN-CORP-UNRATED", "RP-CP-CORP-UNRATED", 3000000.0),
      ln("RP-LN-SME", "RP-CP-SME", 500000.0),
      ln("RP-LN-RETAIL", "RP-CP-RETAIL", 250000.0),
      ln("RP-LN-RRE", "RP-CP-RRE", 400000.0, pt = Some("residential"), ltv = Some(0.60)),
      ln("RP-LN-CRE", "RP-CP-CRE", 10000000.0, cover = true,
        pt = Some("commercial"), ltv = Some(0.50)),
      ln("RP-LN-DEFAULT", "RP-CP-DEFAULT", 1000000.0, dflt = true),
      ln("RP-LN-OTHER", "RP-CP-OTHER", 100000.0),
      ln("RP-LN-FIRB", "RP-CP-FIRB", 50000000.0),
      ln("RP-LN-AIRB", "RP-CP-AIRB", 20000000.0, lgd = Some(0.30), hscd = true),
      ln("RP-LN-AIRB-RET", "RP-CP-AIRB-RET", 100000.0, lgd = Some(0.20), hscd = true),
      ln("RP-LN-SL", "RP-CP-SL", 75000000.0))
    def ext(cp: String, cqs: Int) = ScnRatingFull(s"RT-EXT-$cp", cp,
      "external", Some("TEST_AGENCY"), Some(cqs), None, valueDate)
    def internal(cp: String, pd: Option[Double]) = ScnRatingFull(s"RT-INT-$cp",
      cp, "internal", None, None, pd, valueDate)
    val ratings = Seq(
      ext("RP-CP-SOV", 1), ext("RP-CP-INST", 2), ext("RP-CP-CORP-RATED", 3),
      ext("RP-CP-CRE", 3),
      internal("RP-CP-FIRB", Some(0.0075)), internal("RP-CP-AIRB", Some(0.0100)),
      internal("RP-CP-AIRB-RET", Some(0.0050)), internal("RP-CP-SL", None))
    val sl = Seq(ScnSpecialisedLending("RP-CP-SL", "project_finance",
      "strong", is_hvcre = false))
    val collateral = Seq(
      ScnCollateral("RP-COLL-RRE", "real_estate", "residential", 666667.0,
        0.60, "loan", "RP-LN-RRE"),
      ScnCollateral("RP-COLL-CRE", "real_estate", "commercial", 20000000.0,
        0.50, "loan", "RP-LN-CRE"))
    val equity = Seq(ScnEquity("RP-EQ-LISTED", "RP-CP-EQUITY", "listed",
      "GBP", 1000000.0, 1000000.0))
    val permissions = Seq(ScnModelPermission("TEST_FULL_IRB", "all"))
    RefBundle(
      counterparties = cpDf,
      loans = loans.toDF(),
      ratings = ratings.toDF(),
      collateral = Some(collateral.toDF()),
      modelPermissions = Some(permissions.toDF()),
      specialisedLending = Some(sl.toDF()),
      equityExposures = Some(equity.toDF()))
  }

  /** The CRM guarantee-substitution book (reference
    * `tests/fixtures/reporting_crm_substitution_portfolio.py`) — the
    * C 07.00 / C 08.01 / C 08.02 outflow/inflow axis the ten golden
    * portfolios leave at exactly 0.0. Eight scenarios, each a distinct
    * obligor/guarantor pair with a distinct round covered amount:
    * S1 IRB corp → IRB institution (destination has a native row);
    * S2 IRB corp → IRB retail_other (inflow-only sheet);
    * S3 IRB corp → SA domestic sovereign (cross-template, C 07.00);
    * S4 SA corp → SA institution (within C 07.00);
    * S5 IRB corp → IRB corporate (same-class out+in, nets to no change);
    * S6 slotting → unrated US sovereign (DECLINED — 1.00 ≥ 0.70);
    * S7 IRB corp (GB) → IRB institution (DE) (cross-border beneficial);
    * S8 slotting "good" → SA corporate CQS1 (slotting blend; inflow
    * crosses to C 07.00 corporate). */
  def crmSubstitutionBundle(spark: SparkSession): RefBundle = {
    import spark.implicits._
    val mat = Date.valueOf("2033-12-31")
    val bigRev = Some(400000000.0)
    def corp(ref: String) = ScnCpRetail(ref, "corporate", "GB", bigRev, None, None)
    val cps = Seq(
      corp("CSUB-CP-OB-S1"),
      ScnCpRetail("CSUB-CP-GTOR-S1", "institution", "GB", None, None, None),
      corp("CSUB-CP-OB-S2"),
      ScnCpRetail("CSUB-CP-GTOR-S2", "individual", "GB", None, Some(true), None),
      corp("CSUB-CP-OB-S3"),
      ScnCpRetail("CSUB-CP-GTOR-S3", "sovereign", "GB", None, None, None),
      corp("CSUB-CP-OB-S4"),
      ScnCpRetail("CSUB-CP-GTOR-S4", "institution", "GB", None, None, None),
      corp("CSUB-CP-OB-S5"),
      corp("CSUB-CP-GTOR-S5"),
      corp("CSUB-CP-OB-S6"),
      ScnCpRetail("CSUB-CP-GTOR-S6", "sovereign", "US", None, None, None),
      corp("CSUB-CP-OB-S7"),
      ScnCpRetail("CSUB-CP-GTOR-S7", "institution", "DE", None, None, None),
      corp("CSUB-CP-OB-S8"),
      ScnCpRetail("CSUB-CP-GTOR-S8", "corporate", "GB", None, None, None))
    def ln(ref: String, cp: String, drawn: Double) =
      ScnIrbLoan(ref, cp, "term_loan", drawn, "GBP", valueDate, mat, "senior",
        None, Some(false), None, None)
    val loans = Seq(
      ln("CSUB-LN-S1", "CSUB-CP-OB-S1", 5000000.0),
      ln("CSUB-LN-S1-GTOR-OWN", "CSUB-CP-GTOR-S1", 4000000.0),
      ln("CSUB-LN-S2", "CSUB-CP-OB-S2", 6000000.0),
      ln("CSUB-LN-S3", "CSUB-CP-OB-S3", 7000000.0),
      ln("CSUB-LN-S4", "CSUB-CP-OB-S4", 8000000.0),
      ln("CSUB-LN-S4-GTOR-OWN", "CSUB-CP-GTOR-S4", 1500000.0),
      ln("CSUB-LN-S5", "CSUB-CP-OB-S5", 9000000.0),
      ln("CSUB-LN-S6", "CSUB-CP-OB-S6", 10000000.0),
      ln("CSUB-LN-S7", "CSUB-CP-OB-S7", 11000000.0),
      ln("CSUB-LN-S8-PLAIN", "CSUB-CP-OB-S8", 6500000.0),
      ln("CSUB-LN-S8-GTD", "CSUB-CP-OB-S8", 12000000.0))
    def internal(cp: String, pd: Double) = ScnRatingFull(
      s"CSUB-RTG-$cp", cp, "internal", None, None, Some(pd), valueDate)
    def internalNoPd(cp: String) = ScnRatingFull(
      s"CSUB-RTG-$cp", cp, "internal", None, None, None, valueDate)
    def external(cp: String, cqs: Int) = ScnRatingFull(
      s"CSUB-RTG-$cp", cp, "external", Some("S&P"), Some(cqs), None, valueDate)
    val ratings = Seq(
      internal("CSUB-CP-OB-S1", 0.0050), internal("CSUB-CP-GTOR-S1", 0.0030),
      internal("CSUB-CP-OB-S2", 0.0060), internal("CSUB-CP-GTOR-S2", 0.0200),
      internal("CSUB-CP-OB-S3", 0.0080), external("CSUB-CP-GTOR-S3", 1),
      external("CSUB-CP-GTOR-S4", 2),
      internal("CSUB-CP-OB-S5", 0.0090), internal("CSUB-CP-GTOR-S5", 0.0045),
      internalNoPd("CSUB-CP-OB-S6"),
      internal("CSUB-CP-OB-S7", 0.0075), internal("CSUB-CP-GTOR-S7", 0.0015),
      internalNoPd("CSUB-CP-OB-S8"), external("CSUB-CP-GTOR-S8", 1))
    val sl = Seq(
      ScnSpecialisedLending("CSUB-CP-OB-S6", "project_finance", "strong", false),
      ScnSpecialisedLending("CSUB-CP-OB-S8", "project_finance", "good", false))
    def guar(ref: String, gtor: String, loan: String, covered: Double,
        pct: Double, ptype: String) =
      ScnGuarantee(ref, gtor, "GBP", mat, covered, pct, "loan", loan, ptype,
        10.0, "senior")
    val guarantees = Seq(
      guar("CSUB-GUAR-S1", "CSUB-CP-GTOR-S1", "CSUB-LN-S1", 2000000.0, 0.40, "guarantee"),
      guar("CSUB-GUAR-S2", "CSUB-CP-GTOR-S2", "CSUB-LN-S2", 3300000.0, 0.55, "credit_derivative"),
      guar("CSUB-GUAR-S3", "CSUB-CP-GTOR-S3", "CSUB-LN-S3", 4900000.0, 0.70, "guarantee"),
      guar("CSUB-GUAR-S4", "CSUB-CP-GTOR-S4", "CSUB-LN-S4", 2800000.0, 0.35, "credit_derivative"),
      guar("CSUB-GUAR-S5", "CSUB-CP-GTOR-S5", "CSUB-LN-S5", 5400000.0, 0.60, "guarantee"),
      guar("CSUB-GUAR-S6", "CSUB-CP-GTOR-S6", "CSUB-LN-S6", 4500000.0, 0.45, "guarantee"),
      guar("CSUB-GUAR-S7", "CSUB-CP-GTOR-S7", "CSUB-LN-S7", 5500000.0, 0.50, "credit_derivative"),
      guar("CSUB-GUAR-S8", "CSUB-CP-GTOR-S8", "CSUB-LN-S8-GTD", 7800000.0, 0.65, "credit_derivative"))
    val permissions = Seq(ScnModelPermission("TEST_FULL_IRB", "all"))
    RefBundle(
      counterparties = cps.toDF(),
      loans = loans.toDF(),
      ratings = ratings.toDF(),
      guarantees = Some(guarantees.toDF()),
      specialisedLending = Some(sl.toDF()),
      modelPermissions = Some(permissions.toDF()))
  }

  /** The two crm-substitution runs — no vendored goldens exist for this
    * portfolio (the reference exercises it through the supervisory
    * validation gate and unit expectations), so they are NOT in [[all]];
    * `CrmSubstitutionSpec` pins the reference's verified per-sheet cells
    * and the validation replay runs them through the full rule estate. */
  def crmScenarios: Seq[Scenario] = Seq(
    Scenario("crm_substitution_crr",
      RefRunConfig("CRR", java.time.LocalDate.of(2025, 12, 31), "irb"),
      crmSubstitutionBundle),
    Scenario("crm_substitution_b31",
      RefRunConfig("BASEL_3_1", java.time.LocalDate.of(2027, 6, 1), "irb"),
      crmSubstitutionBundle))

  /** Every scenario with vendored goldens, in replay order. */
  def all: Seq[Scenario] = Seq(
    Scenario("sa_classes_crr",
      RefRunConfig("CRR", java.time.LocalDate.of(2025, 12, 31)),
      saClassesBundle),
    Scenario("sa_classes_b31",
      RefRunConfig("BASEL_3_1", java.time.LocalDate.of(2027, 6, 1)),
      saClassesBundle),
    Scenario("offbs_crr",
      RefRunConfig("CRR", java.time.LocalDate.of(2025, 12, 31)),
      offbsBundle),
    Scenario("offbs_b31",
      RefRunConfig("BASEL_3_1", java.time.LocalDate.of(2027, 6, 1)),
      offbsBundle),
    Scenario("irb_classes_crr",
      RefRunConfig("CRR", java.time.LocalDate.of(2025, 12, 31), "irb"),
      irbClassesBundle),
    Scenario("irb_classes_b31",
      RefRunConfig("BASEL_3_1", java.time.LocalDate.of(2027, 6, 1), "irb"),
      irbClassesBundle),
    Scenario("ccr_crr",
      RefRunConfig("CRR", java.time.LocalDate.of(2025, 12, 31)),
      ccrBundle),
    Scenario("ccr_b31",
      RefRunConfig("BASEL_3_1", java.time.LocalDate.of(2027, 6, 1)),
      ccrBundle),
    Scenario("crr",
      RefRunConfig("CRR", java.time.LocalDate.of(2025, 12, 31), "irb"),
      richBundle),
    Scenario("b31",
      RefRunConfig("BASEL_3_1", java.time.LocalDate.of(2027, 6, 1), "irb"),
      richBundle))
}
