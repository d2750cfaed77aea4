package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The full SA (Standardised Approach) risk-weight calculator plus the
  * slotting and equity books, as Column expressions (reference
  * `engine/sa/risk_weights.py` ~1300 LoC entity-type routing;
  * `engine/securitisation`/`engine/equity`; regulatory articles CRR
  * Art. 114-134 and PRA PS1/26 as restated by the reference's
  * stdlib-only oracle derivations `tests/oracle/derivations/sa_crr.py` /
  * `sa_b31.py` / `specialised.py` — re-implemented here in Catalyst,
  * never imported).
  *
  * Covers both regimes: sovereign Table 1 with the local-currency
  * preference, RGLA (UK-sterling preference, rated Table 1B, unrated
  * sovereign-CQS Table 1A), PSE (local-currency / equivalent-jurisdiction
  * routing on Table 2, B3.1 rated Table 2A), named MDBs at 0% and the
  * B3.1 rated/unrated MDB treatment, institutions (CRR Tables 3/5 with
  * the sovereign-CQS fallback; B3.1 ECRA Table 3 + SCRA grades),
  * corporates (Tables 6, B3.1 unrated investment-grade 65%, SME 85%),
  * retail sub-classes (payroll 35%, QRRE transactor 45%, non-regulatory
  * 100%), real estate (CRR Art. 125/126 blends; B3.1 Art. 124F/H 55%-of-
  * value splits, income-dependent Table 6B bands and the CRE 100/110
  * split; ADC with the pre-sold carve-out), defaulted items (the 20%
  * provision test on the pre-adjustment value), covered bonds
  * (Table 6A), CRR supporting factors (SME 0.7619 / infrastructure
  * 0.75 on RWEA), equity (SA 100% / B3.1 250%; IRB simple 190/290/370),
  * and supervisory slotting (CRR & PS1/26 Table A incl. HVCRE).
  *
  * Pure per-row when-chain/lookup arithmetic — embarrassingly parallel.
  * `OracleDerivationsSpec` pins all of it to the reference's
  * independently hand-derived oracle values (phases O1 + O4).
  */
object SaKernel {

  // ---- rule tables (regime-as-data) ------------------------------------

  val sovereignT1 = Seq(1 -> 0.00, 2 -> 0.20, 3 -> 0.50, 4 -> 1.00, 5 -> 1.00, 6 -> 1.50)
  val crrInstitutionT3 = Seq(1 -> 0.20, 2 -> 0.50, 3 -> 0.50, 4 -> 1.00, 5 -> 1.00, 6 -> 1.50)
  val crrInstitutionT5 = Seq(1 -> 0.20, 2 -> 0.50, 3 -> 1.00, 4 -> 1.00, 5 -> 1.00, 6 -> 1.50)
  val crrCorporateT6 = Seq(1 -> 0.20, 2 -> 0.50, 3 -> 1.00, 4 -> 1.00, 5 -> 1.50, 6 -> 1.50)
  val b31RglaT1a = Seq(1 -> 0.20, 2 -> 0.50, 3 -> 1.00, 4 -> 1.00, 5 -> 1.00, 6 -> 1.50)
  val b31RglaT1b = Seq(1 -> 0.20, 2 -> 0.50, 3 -> 0.50, 4 -> 1.00, 5 -> 1.00, 6 -> 1.50)
  val pseT2 = Seq(1 -> 0.20, 2 -> 0.50, 3 -> 1.00, 4 -> 1.00, 5 -> 1.00, 6 -> 1.50)
  val b31PseT2a = Seq(1 -> 0.20, 2 -> 0.50, 3 -> 0.50, 4 -> 1.00, 5 -> 1.00, 6 -> 1.50)
  val b31MdbT2b = Seq(1 -> 0.20, 2 -> 0.30, 3 -> 0.50, 4 -> 1.00, 5 -> 1.00, 6 -> 1.50)
  val b31InstitutionT3 = Seq(1 -> 0.20, 2 -> 0.30, 3 -> 0.50, 4 -> 1.00, 5 -> 1.00, 6 -> 1.50)
  val b31CorporateT6 = Seq(1 -> 0.20, 2 -> 0.50, 3 -> 0.75, 4 -> 1.00, 5 -> 1.50, 6 -> 1.50)
  val coveredBondT6a = Seq(1 -> 0.10, 2 -> 0.20, 3 -> 0.20, 4 -> 0.50, 5 -> 0.50, 6 -> 1.00)
  /** PS1/26 Table 6B: income-producing residential, inclusive upper LTV. */
  val b31IpreResiBands = Seq(0.50 -> 0.30, 0.60 -> 0.35, 0.70 -> 0.40,
    0.80 -> 0.50, 0.90 -> 0.60, 1.00 -> 0.75)
  val b31IpreResiTerminal = 1.05

  val crrSlottingLong = Seq("strong" -> 0.70, "good" -> 0.90,
    "satisfactory" -> 1.15, "weak" -> 2.50, "default" -> 0.00)
  val crrSlottingShort = Seq("strong" -> 0.50, "good" -> 0.70,
    "satisfactory" -> 1.15, "weak" -> 2.50, "default" -> 0.00)
  val b31SlottingHvcreLong = Seq("strong" -> 0.95, "good" -> 1.20,
    "satisfactory" -> 1.40, "weak" -> 2.50, "default" -> 0.00)
  val b31SlottingHvcreShort = Seq("strong" -> 0.70, "good" -> 0.95,
    "satisfactory" -> 1.40, "weak" -> 2.50, "default" -> 0.00)

  // ---- helpers ---------------------------------------------------------

  private def lookupI(key: Column, table: Seq[(Int, Double)], default: Column): Column =
    table.foldLeft(Option.empty[Column]) {
      case (None, (k, v)) => Some(when(key === k, v))
      case (Some(acc), (k, v)) => Some(acc.when(key === k, v))
    }.get.otherwise(default)

  private def lookupS(key: Column, table: Seq[(String, Double)], default: Column): Column =
    table.foldLeft(Option.empty[Column]) {
      case (None, (k, v)) => Some(when(key === k, v))
      case (Some(acc), (k, v)) => Some(acc.when(key === k, v))
    }.get.otherwise(default)

  /** Inclusive-upper-bound LTV banding (Table 6B semantics). */
  private def bandedLe(m: Column, bands: Seq[(Double, Double)], terminal: Double): Column =
    bands.foldLeft(Option.empty[Column]) {
      case (None, (ub, v)) => Some(when(m <= ub, v))
      case (Some(acc), (ub, v)) => Some(acc.when(m <= ub, v))
    }.get.otherwise(lit(terminal))

  /** Art. 125(2)(d)-style two-band blend: `secShare` of the property value
    * carries `secRw`, the remainder the counterparty weight. The secured
    * fraction of the EXPOSURE is min(secShare/LTV, 1). */
  private def blendRw(ltv: Column, secShare: Double, secRw: Double, restRw: Column): Column = {
    val securedFrac = least(lit(secShare) / ltv, lit(1.0))
    securedFrac * secRw + (lit(1.0) - securedFrac) * restRw
  }

  private def flag(name: String): Column = coalesce(col(name), lit(false))

  // ---- the calculator --------------------------------------------------

  /** Expects (nullable unless noted): framework, approach, exposure_class,
    * entity_type, ead, cqs, sovereign_cqs, currency, local_currency,
    * country_code, original_maturity_years (both presence-tolerant:
    * added as null when the frame lacks them),
    * cp_is_natural_person, qualifies_as_retail, is_payroll_loan,
    * is_qrre_transactor, ltv, property_type, has_income_cover, is_adc,
    * is_presold, is_defaulted, provision_allocated, scra_grade,
    * is_equivalent_jurisdiction, is_sme, is_investment_grade,
    * use_investment_grade_assessment, is_infrastructure, equity_type,
    * is_diversified, permission, slotting_category, is_short_maturity,
    * is_hvcre.
    *
    * Adds: risk_weight, rwa (CRR SME / infrastructure factors applied).
    */
  def calculate(df0: DataFrame): DataFrame = {
    // Presence-tolerant optional columns (the reference's convention for
    // attributes only some books carry): an absent column is an absent
    // assertion, never an error — it degrades every predicate reading it
    // to False/null (reference `engine/sa/jurisdiction.py` null-VALUE
    // convention).
    val optional = Seq(
      "country_code" -> "string",
      "original_maturity_years" -> "double")
    val df = optional.foldLeft(df0) { case (d, (n, t)) =>
      if (d.columns.contains(n)) d else d.withColumn(n, lit(null).cast(t))
    }
    val crr = col("framework") === "CRR"
    val isLocal = col("currency").isNotNull && col("local_currency").isNotNull &&
      col("currency") === col("local_currency")
    // Art. 115(5) / Art. 116(3) jurisdiction limbs: GB counterparty funded
    // in sterling (reference `risk_weights.py:957`). Null-collapsed to
    // False — a null country code cannot prove UK-ness (reference
    // `engine/sa/jurisdiction.py` null-VALUE convention), and a Kleene
    // null in the Art. 116(5) gate's negation would silently grant the
    // preferential treatment.
    val isUk = coalesce(col("country_code") === "GB", lit(false))
    val isUkDomestic = isUk && coalesce(col("currency") === "GBP", lit(false))
    val cqs = col("cqs")
    val sov = col("sovereign_cqs")
    val cptyRw = when(flag("cp_is_natural_person"), 0.75).otherwise(1.0)

    val slottingRw = {
      val table = when(flag("is_hvcre"),
        when(flag("is_short_maturity"),
          lookupS(col("slotting_category"), b31SlottingHvcreShort, lit(2.5)))
          .otherwise(lookupS(col("slotting_category"), b31SlottingHvcreLong, lit(2.5))))
        .otherwise(
          when(flag("is_short_maturity"),
            lookupS(col("slotting_category"), crrSlottingShort, lit(2.5)))
            .otherwise(lookupS(col("slotting_category"), crrSlottingLong, lit(2.5))))
      table
    }

    val equityRw =
      when(col("permission") === "IRB",
        // CRR Art. 155(2) simple risk-weight method
        when(col("equity_type") === "private_equity" && flag("is_diversified"), 1.9)
          .when(flag("is_exchange_traded"), 2.9)
          .otherwise(3.7))
        .otherwise(when(crr, 1.0).otherwise(2.5)) // Art. 133 / PS1/26 250%

    val defaultedRw = {
      // Art. 127(1): adjustments vs 20% of the PRE-adjustment value.
      // Zero-value guard: a zero-EAD unprovisioned defaulted leg (e.g.
      // an LR facility, CCF 0) would divide 0/0 — ANSI mode fails the
      // job; the unsecured-default 150% applies (RWA is 0 regardless).
      val prov = coalesce(col("provision_allocated"), lit(0.0))
      val preAdj = col("ead") + prov
      when(preAdj > 0.0,
        when(prov / preAdj >= 0.2, 1.0).otherwise(1.5))
        .otherwise(1.5)
    }

    val institutionRw =
      when(crr,
        when(cqs.isNotNull, lookupI(cqs, crrInstitutionT3, lit(1.0)))
          .otherwise(when(sov.isNotNull, lookupI(sov, crrInstitutionT5, lit(1.0)))
            .otherwise(lit(1.0))))
        .otherwise(
          when(cqs.isNotNull, lookupI(cqs, b31InstitutionT3, lit(1.0)))
            .when(col("scra_grade") === "A_ENHANCED", 0.3)
            .when(col("scra_grade") === "A", 0.4)
            .when(col("scra_grade") === "B", 0.75)
            .when(col("scra_grade") === "C", 1.5)
            // SCRA residual: an unrated institution with NO grade takes the
            // conservative Grade-C weight (reference
            // `engine/sa/risk_weights.py:695` `.otherwise(scra_c)`,
            // CRE20.16-21) — caught by the B31 IRB shadow-SA golden replay.
            .otherwise(1.5))

    val retailRw =
      when(flag("is_payroll_loan"), 0.35)
        .when(!crr && flag("is_qrre_transactor"), 0.45)
        .when(flag("qualifies_as_retail"), 0.75)
        .otherwise(1.0)

    val rreRw =
      when(crr, blendRw(col("ltv"), 0.8, 0.35, cptyRw))
        .otherwise(
          when(flag("has_income_cover"),
            bandedLe(col("ltv"), b31IpreResiBands, b31IpreResiTerminal))
            .otherwise(blendRw(col("ltv"), 0.55, 0.20, cptyRw)))

    val adcRw = when(flag("is_presold") &&
      col("property_type") === "residential", 1.0).otherwise(1.5)

    val creRw =
      when(flag("is_adc"), adcRw)
        .when(crr,
          when(flag("has_income_cover"), blendRw(col("ltv"), 0.5, 0.5, lit(1.0)))
            .otherwise(lit(1.0)))
        .otherwise(
          when(flag("has_income_cover"),
            when(col("ltv") <= 0.8, 1.0).otherwise(1.1))
            .otherwise(blendRw(col("ltv"), 0.55, 0.60, cptyRw)))

    val rw =
      when(col("approach") === "SLOTTING", slottingRw)
        .when(col("approach") === "EQUITY", equityRw)
        .when(col("exposure_class") === "defaulted", defaultedRw)
        .when(col("exposure_class") === "high_risk", 1.5)
        .when(col("exposure_class") === "central_govt_central_bank",
          when(isLocal, 0.0).otherwise(lookupI(cqs, sovereignT1, lit(1.0))))
        .when(col("exposure_class") === "rgla",
          // Art. 115, regime-invariant shape (the own-rating Table 1B and
          // sovereign-derived Table 1A values coincide across CRR and
          // PS1/26). Order is load-bearing (reference `engine/sa/rgla.py`
          // + the override ladders): (2)/(4) sovereign-equivalence prices
          // on the Art. 114 CGCB ladder, the (5) UK-sterling flat 20%
          // overrides even a rated row, then rated Table 1B, then the
          // sovereign-derived Table 1A with a 100% residual.
          when(col("entity_type") === "rgla_sovereign" &&
               (isUk || (sov.isNotNull && sov > 0)),
            when(isUkDomestic, 0.0)
              .otherwise(lookupI(sov, sovereignT1, lit(0.0))))
            .when(isUkDomestic, 0.2)
            .when(cqs.isNotNull, lookupI(cqs, b31RglaT1b, lit(1.0)))
            .when(sov.isNotNull, lookupI(sov, b31RglaT1a, lit(1.0)))
            .otherwise(1.0))
        .when(col("exposure_class") === "pse",
          // Art. 116, regime-invariant shape: the (5) third-country
          // equivalence gate suppresses EVERY preferential treatment
          // (flat 100%), the (3) short-term 20% is UK-only on ORIGINAL
          // maturity, then rated Table 2A, then sovereign-derived
          // Table 2 (reference `engine/sa/jurisdiction.py`).
          when(!(isUk || coalesce(col("is_equivalent_jurisdiction"),
              lit(false))), 1.0)
            .when(isUk && col("original_maturity_years") <= 0.25, 0.2)
            .when(cqs.isNotNull, lookupI(cqs, b31PseT2a, lit(1.0)))
            .when(sov.isNotNull, lookupI(sov, pseT2, lit(1.0)))
            .otherwise(1.0))
        .when(col("exposure_class") === "mdb",
          // Art. 117(2) named list 0% in both regimes; then CRR Art.
          // 117(1) treats a non-named MDB as an INSTITUTION (Table 3
          // rated / Table 5 sovereign-derived / 100% residual), while
          // PS1/26 Art. 117(1)(a) gives MDBs their own Table 2B ECRA
          // schedule with a 50% unrated row.
          when(col("entity_type") === "mdb_named", 0.0)
            .when(crr,
              when(cqs.isNotNull, lookupI(cqs, crrInstitutionT3, lit(1.0)))
                .when(sov.isNotNull, lookupI(sov, crrInstitutionT5, lit(1.0)))
                .otherwise(1.0))
            .otherwise(
              when(cqs.isNotNull, lookupI(cqs, b31MdbT2b, lit(1.0)))
                .otherwise(0.5)))
        .when(col("exposure_class") === "international_organisation", 0.0)
        .when(col("exposure_class") === "institution", institutionRw)
        .when(col("exposure_class").isin("retail_other", "retail_qrre"), retailRw)
        .when(col("exposure_class") === "retail_mortgage", rreRw)
        .when(col("exposure_class").isin("commercial_mortgage", "residential_mortgage"),
          creRw)
        .when(col("exposure_class") === "covered_bond",
          lookupI(cqs, coveredBondT6a, lit(1.0)))
        .when(col("exposure_class") === "corporate_sme",
          when(crr,
            when(cqs.isNotNull, lookupI(cqs, crrCorporateT6, lit(1.0))).otherwise(1.0))
            .otherwise(
              when(cqs.isNotNull, lookupI(cqs, b31CorporateT6, lit(1.0))).otherwise(0.85)))
        .when(col("exposure_class") === "corporate",
          when(crr,
            when(cqs.isNotNull, lookupI(cqs, crrCorporateT6, lit(1.0))).otherwise(1.0))
            .otherwise(
              when(cqs.isNotNull, lookupI(cqs, b31CorporateT6, lit(1.0)))
                .when(flag("use_investment_grade_assessment") &&
                  flag("is_investment_grade"), 0.65)
                .otherwise(1.0)))
        .otherwise(1.0) // Art. 134 other items

    // CRR-only RWEA factors: SME supporting factor (Art. 501) and the
    // infrastructure factor (Art. 501a). PS1/26 carries neither.
    val smeFactor = IrbKernel.smeSupportingFactor(col("ead"))
    val rwaBase = col("risk_weight") * col("ead")
    val rwa =
      when(crr && col("exposure_class") === "corporate_sme" && flag("is_sme"),
        rwaBase * smeFactor)
        .when(crr && flag("is_infrastructure"), rwaBase * 0.75)
        .otherwise(rwaBase)

    df.withColumn("risk_weight", rw).withColumn("rwa", rwa)
  }
}
