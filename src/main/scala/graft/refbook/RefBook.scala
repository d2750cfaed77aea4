package graft.refbook

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.SaKernel

/** The reference-schema book pipeline: a [[RefBundle]] of input tables in
  * the reference's published input vocabulary, run end-to-end into the
  * SEALED per-exposure results ledger the reporting layer reads
  * (reference `engine/pipeline.py` `PipelineOrchestrator.run_with_data` →
  * `engine/aggregator/aggregator.py` `_add_reporting_projection`).
  *
  * Spark-first: every stage is a declarative DataFrame transform — the
  * classification maps compile to when-chains, the rating pick is a
  * rank-1 window, the SA calculator is [[graft.engine.SaKernel]]'s
  * codegen'd Column chain — so the whole ledger is ONE Catalyst plan
  * (scan → broadcast joins → window → projection), no driver-side loops.
  *
  * The sealed column vocabulary mirrors the reference's aggregator exit
  * (`aggregator.py:1016-1056`): the `reporting_*` projection (class /
  * approach twins, per-side gross carriers, EAD, RW), `rwa_final` /
  * `rwa_pre_factor` / `rwa_pre_floor` / `sa_rwa`, the CRM substitution
  * carriers, and the counterparty attributes the sheet axes key on.
  * Columns the reference's seal deliberately does NOT carry
  * (`own_funds_deduction_amount`, `sa_cqs`, `scra/gcra_provision_amount`,
  * `ciu_approach`, …) are equally absent here, so the template layer's
  * structural-null cells render identically.
  */
object RefBook {

  /** Entity-type → SA exposure class (reference rulepack
    * `entity_type_to_sa_class`, `rulebook/packs/common.py:735`). */
  val entityToSaClass: Seq[(String, String)] = Seq(
    "sovereign" -> "central_govt_central_bank",
    "central_bank" -> "central_govt_central_bank",
    "central_bank_ecb" -> "central_govt_central_bank",
    "rgla_sovereign" -> "rgla",
    "rgla_institution" -> "rgla",
    "pse_sovereign" -> "pse",
    "pse_institution" -> "pse",
    "mdb" -> "mdb",
    "mdb_named" -> "mdb",
    "international_org" -> "international_organisation",
    "institution" -> "institution",
    "bank" -> "institution",
    "ccp" -> "institution",
    "financial_institution" -> "institution",
    "corporate" -> "corporate",
    "company" -> "corporate",
    "individual" -> "retail_other",
    "retail" -> "retail_other",
    "natural_person" -> "retail_other",
    "specialised_lending" -> "corporate",
    "equity" -> "equity",
    "covered_bond" -> "covered_bond",
    "other_cash" -> "other",
    "other_gold" -> "other",
    "other_items_in_collection" -> "other",
    "other_tangible" -> "other",
    "other_residual_lease" -> "other",
    "high_risk" -> "high_risk",
    "high_risk_venture_capital" -> "high_risk",
    "high_risk_private_equity" -> "high_risk",
    "high_risk_speculative_re" -> "high_risk")

  /** Entity-type → IRB exposure class (Art. 147; rulepack
    * `entity_type_to_irb_class`). Diverges from the SA map on the
    * quasi-sovereigns (Art. 147(3)/(4)(b)) and specialised lending
    * (Art. 147(8)). */
  val entityToIrbClass: Seq[(String, String)] = Seq(
    "sovereign" -> "central_govt_central_bank",
    "central_bank" -> "central_govt_central_bank",
    "central_bank_ecb" -> "central_govt_central_bank",
    "rgla_sovereign" -> "central_govt_central_bank",
    "rgla_institution" -> "institution",
    "pse_sovereign" -> "central_govt_central_bank",
    "pse_institution" -> "institution",
    "mdb" -> "central_govt_central_bank",
    "mdb_named" -> "central_govt_central_bank",
    "international_org" -> "central_govt_central_bank",
    "institution" -> "institution",
    "bank" -> "institution",
    "ccp" -> "institution",
    "financial_institution" -> "institution",
    "corporate" -> "corporate",
    "company" -> "corporate",
    "individual" -> "retail_other",
    "retail" -> "retail_other",
    "natural_person" -> "retail_other",
    "specialised_lending" -> "specialised_lending",
    "equity" -> "equity",
    "covered_bond" -> "covered_bond",
    "other_cash" -> "other",
    "other_gold" -> "other",
    "other_items_in_collection" -> "other",
    "other_tangible" -> "other",
    "other_residual_lease" -> "other",
    "high_risk" -> "high_risk",
    "high_risk_venture_capital" -> "high_risk",
    "high_risk_private_equity" -> "high_risk",
    "high_risk_speculative_re" -> "high_risk")

  // Seal: every classification target is an Art. 112/147 vocabulary
  // member (reference `domain/enums.py` ExposureClass; the B2/B3
  // phantom-key lesson — an invented class string zero-fills downstream
  // instead of raising, so it is refused here, at the source map).
  require((entityToSaClass ++ entityToIrbClass).forall(p =>
    graft.rulebook.ExposureClasses.values(p._2)),
    "classification target outside the sealed exposure-class vocabulary: " +
      (entityToSaClass ++ entityToIrbClass).map(_._2)
        .filterNot(graft.rulebook.ExposureClasses.values).distinct.mkString(", "))

  private def chainOf(pairs: Seq[(String, String)], key: org.apache.spark.sql.Column,
      default: String): org.apache.spark.sql.Column =
    pairs.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (None, (k, v)) => Some(when(key === k, v))
      case (Some(acc), (k, v)) => Some(acc.when(key === k, v))
    }.get.otherwise(default)

  /** Optional column with a typed null default (the reference loader's
    * `ensure_columns` discipline, `data/column_spec.py:51-67`). */
  private def optCol(df: DataFrame, name: String, sqlType: String): org.apache.spark.sql.Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast(sqlType)

  /** Rank-1 best EXTERNAL rating per counterparty: lowest CQS wins, agency
    * then reference as the deterministic tie-break (reference
    * `stages/hierarchy/ratings.py:106-127`). */
  def bestExternalCqs(ratings: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("counterparty_reference"))
      .orderBy(col("cqs"), col("rating_agency"), col("rating_reference"))
    ratings
      .filter(col("rating_type") === "external" && col("cqs").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("counterparty_reference"), col("cqs").cast("int").as("external_cqs"))
  }

  /** Counterparties carrying an INTERNAL rating with a usable PD — the
    * IRB routing precondition (reference `stages/classify/approach.py`). */
  def internalPd(ratings: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("counterparty_reference"))
      .orderBy(col("rating_date").desc, col("rating_reference"))
    // `pd` is an OPTIONAL ratings column (the loader's `ensure_columns`
    // discipline): an external-only book carries none, and no pd means no
    // IRB routing precondition — an empty frame, not an analysis error.
    val pd = optCol(ratings, "pd", "double")
    val withPd = ratings.filter(col("rating_type") === "internal" && pd.isNotNull)
    val pdCols = Seq(
      col("counterparty_reference"), pd.cast("double").as("internal_pd")) ++
      (if (ratings.columns.contains("model_id")) Seq(col("model_id").as("internal_model_id"))
       else Seq(lit(null).cast("string").as("internal_model_id")))
    withPd.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(pdCols: _*)
  }

  /** Counterparties carrying ANY internal rating (model grant) — with or
    * without a PD. A granted model with NO PD is the slotting route
    * (CRR Art. 153(5): the F-IRB/A-IRB branches are unavailable). */
  def internalModel(ratings: DataFrame): DataFrame =
    ratings.filter(col("rating_type") === "internal")
      .groupBy(col("counterparty_reference"))
      .agg(count(lit(1)).as("internal_model_count"))
      .select(col("counterparty_reference"), lit(true).as("has_internal_model"))

  /** Unify loans / facilities / contingents into one exposures frame
    * (reference `stages/hierarchy/unify.py`): per leg, the on-side gross
    * (drawn), the off-side gross (undrawn headroom or contingent
    * nominal), and the Annex I CCF for the off-side. */
  def unifyExposures(b: RefBundle, s: SparkSession): DataFrame = {
    val loans = b.loans.select(
      col("loan_reference").as("exposure_reference"),
      lit("loan").as("exposure_type"),
      col("counterparty_reference"),
      col("drawn_amount").cast("double").as("drawn_amount"),
      lit(null).cast("double").as("undrawn_amount"),
      lit(null).cast("double").as("nominal_amount"),
      col("currency"),
      optCol(b.loans, "value_date", "date").as("value_date"),
      optCol(b.loans, "maturity_date", "date").as("maturity_date"),
      optCol(b.loans, "product_type", "string").as("product_type"),
      optCol(b.loans, "seniority", "string").as("seniority"),
      optCol(b.loans, "is_defaulted", "boolean").as("leg_defaulted"),
      optCol(b.loans, "risk_type", "string").as("leg_risk_type"),
      optCol(b.loans, "obs_product", "string").as("obs_product"),
      optCol(b.loans, "original_maturity_years", "double")
        .as("original_maturity_years"),
      optCol(b.loans, "lgd", "double").as("lgd_own"),
      optCol(b.loans, "has_income_cover", "boolean").as("has_income_cover_in"),
      optCol(b.loans, "has_sufficient_collateral_data", "boolean")
        .as("has_sufficient_collateral_data"),
      optCol(b.loans, "property_type", "string").as("leg_property_type"),
      optCol(b.loans, "ltv", "double").as("leg_ltv"))
    // Synthetic facility-undrawn rows (reference
    // `stages/hierarchy/facility_undrawn.py`): undrawn headroom = limit −
    // Σ(drawn of mapped child loans), one `<facility>_UNDRAWN` exposure per
    // COMMITTED facility with positive headroom — an uncommitted
    // (unconditionally cancellable) facility generates no undrawn exposure
    // at all. Legacy direct `undrawn_amount` input is honoured when no
    // `limit` is supplied.
    val fac = b.facilities.map { f =>
      val withDrawn = b.facilityMappings match {
        case Some(fm) =>
          val childDrawn = fm.filter(col("child_type") === "loan")
            .join(b.loans.select(col("loan_reference").as("child_reference"),
              col("drawn_amount").cast("double").as("child_drawn")),
              Seq("child_reference"))
            .groupBy(col("parent_facility_reference").as("facility_reference"))
            .agg(sum(col("child_drawn")).as("children_drawn"))
          f.join(broadcast(childDrawn), Seq("facility_reference"), "left")
            .withColumn("children_drawn", coalesce(col("children_drawn"), lit(0.0)))
        case None => f.withColumn("children_drawn", lit(0.0))
      }
      val headroom = coalesce(
        optCol(f, "limit", "double") - col("children_drawn"),
        optCol(f, "undrawn_amount", "double"))
      withDrawn
        .withColumn("undrawn_calc", headroom)
        .filter(col("undrawn_calc") > 0 &&
          coalesce(optCol(f, "committed", "boolean"), lit(true)))
        .select(
          concat(col("facility_reference"), lit("_UNDRAWN")).as("exposure_reference"),
          lit("facility_undrawn").as("exposure_type"),
          col("counterparty_reference"),
          lit(0.0).as("drawn_amount"),
          col("undrawn_calc").as("undrawn_amount"),
          lit(null).cast("double").as("nominal_amount"),
          col("currency"),
          optCol(f, "value_date", "date").as("value_date"),
          optCol(f, "maturity_date", "date").as("maturity_date"),
          optCol(f, "product_type", "string").as("product_type"),
          optCol(f, "seniority", "string").as("seniority"),
          optCol(f, "is_defaulted", "boolean").as("leg_defaulted"),
          optCol(f, "risk_type", "string").as("leg_risk_type"),
          optCol(f, "obs_product", "string").as("obs_product"),
          optCol(f, "original_maturity_years", "double")
            .as("original_maturity_years"),
          optCol(f, "lgd", "double").as("lgd_own"),
          lit(null).cast("boolean").as("has_income_cover_in"),
          optCol(f, "has_sufficient_collateral_data", "boolean")
            .as("has_sufficient_collateral_data"),
          lit(null).cast("string").as("leg_property_type"),
          lit(null).cast("double").as("leg_ltv"))
    }
    val cont = b.contingents.map(c => c.select(
      col("contingent_reference").as("exposure_reference"),
      lit("contingent").as("exposure_type"),
      col("counterparty_reference"),
      lit(0.0).as("drawn_amount"),
      lit(null).cast("double").as("undrawn_amount"),
      col("nominal_amount").cast("double").as("nominal_amount"),
      col("currency"),
      optCol(c, "value_date", "date").as("value_date"),
      optCol(c, "maturity_date", "date").as("maturity_date"),
      optCol(c, "product_type", "string").as("product_type"),
      optCol(c, "seniority", "string").as("seniority"),
      optCol(c, "is_defaulted", "boolean").as("leg_defaulted"),
      optCol(c, "risk_type", "string").as("leg_risk_type"),
      optCol(c, "obs_product", "string").as("obs_product"),
      optCol(c, "original_maturity_years", "double")
        .as("original_maturity_years"),
      lit(null).cast("double").as("lgd_own"),
      lit(null).cast("boolean").as("has_income_cover_in"),
      lit(null).cast("boolean").as("has_sufficient_collateral_data"),
      lit(null).cast("string").as("leg_property_type"),
      lit(null).cast("double").as("leg_ltv")))
    val base = (Seq(loans) ++ fac ++ cont).reduce(_.unionByName(_))
      .withColumns(Map(
        "g_guarantor_reference" -> lit(null).cast("string"),
        "guaranteed_portion_in" -> lit(0.0),
        "g_protection_type" -> lit(null).cast("string"),
        "g_currency" -> lit(null).cast("string"),
        "g_seniority" -> lit(null).cast("string")))
    splitGuaranteedLegs(base, b)
  }

  /** CRM guarantee leg split (reference `engine/crm/guarantees.py`
    * `_build_guarantor_sub_rows` / `_retained_tranche_rows`): a loan with
    * an attached guarantee splits physically into a `__G_<guarantor>`
    * covered leg (drawn = the covered amount, carrying the guarantor
    * reference and protection type) and a `__REM` retained leg (the
    * uncovered remainder). The split happens UPSTREAM of the benefit
    * decision — a declined guarantee still splits, it just must not
    * migrate class/approach or book any outflow/inflow (reference
    * `engine/sa/rw_adjustments.py::apply_guarantee_substitution`, the
    * Art. 193 decline). One guarantee per loan is supported (the
    * reference resolves multi-guarantor stacks by greedy fill —
    * `redistribute_non_beneficial` — which no committed book exercises). */
  private def splitGuaranteedLegs(base: DataFrame, b: RefBundle): DataFrame =
    b.guarantees match {
      case None => base
      case Some(g0) =>
        val g = g0
          .filter(coalesce(optCol(g0, "beneficiary_type", "string"),
            lit("loan")) === "loan")
          .select(
            col("beneficiary_reference").as("gj_beneficiary"),
            col("guarantor").as("gj_guarantor"),
            col("amount_covered").cast("double").as("gj_covered"),
            optCol(g0, "protection_type", "string").as("gj_ptype"),
            optCol(g0, "currency", "string").as("gj_currency"),
            optCol(g0, "guarantor_seniority", "string").as("gj_seniority"))
        val joined = base.join(broadcast(g),
          col("exposure_reference") === col("gj_beneficiary") &&
            col("exposure_type") === "loan", "left")
        val covered = least(coalesce(col("gj_covered"), lit(0.0)),
          col("drawn_amount"))
        // never null: isNotNull collapses the null branch and a null
        // covered coalesces to 0.0, so the complement filter keeps rows
        val split = col("gj_guarantor").isNotNull && covered > 0
        val gjCols = Seq("gj_beneficiary", "gj_guarantor", "gj_covered",
          "gj_ptype", "gj_currency", "gj_seniority")
        val gLeg = joined.filter(split).withColumns(Map(
          "exposure_reference" -> concat(col("exposure_reference"),
            lit("__G_"), col("gj_guarantor")),
          "drawn_amount" -> covered,
          "g_guarantor_reference" -> col("gj_guarantor"),
          "guaranteed_portion_in" -> covered,
          "g_protection_type" -> col("gj_ptype"),
          "g_currency" -> col("gj_currency"),
          "g_seniority" -> col("gj_seniority")))
        val rem = joined.filter(split && col("drawn_amount") - covered > 0)
          .withColumns(Map(
            "exposure_reference" -> concat(col("exposure_reference"), lit("__REM")),
            "drawn_amount" -> (col("drawn_amount") - covered)))
        val plain = joined.filter(!split)
        Seq(plain, gLeg, rem).map(_.drop(gjCols: _*)).reduce(_.unionByName(_))
    }

  /** Build the sealed results ledger for one bundle under one config. */
  /** The C 08.03 / OF 08.03 hierarchical PD scale, (lower, upper, ref)
    * (reference `reporting/corep/templates.py` CRR_C08_03_PD_RANGES /
    * B31_C08_03_PD_RANGES; parents 0010/0070/0100/0130). */
  private def c0803Ranges(isB31: Boolean): Seq[(Double, Double, String)] = {
    val crr = Seq(
      (0.0000, 0.0015, "0010"), (0.0000, 0.0010, "0020"), (0.0010, 0.0015, "0030"),
      (0.0015, 0.0025, "0040"), (0.0025, 0.0050, "0050"), (0.0050, 0.0075, "0060"),
      (0.0075, 0.0250, "0070"), (0.0075, 0.0175, "0080"), (0.0175, 0.0250, "0090"),
      (0.0250, 0.1000, "0100"), (0.0250, 0.0500, "0110"), (0.0500, 0.1000, "0120"),
      (0.1000, 1.0000, "0130"), (0.1000, 0.2000, "0140"), (0.2000, 0.3000, "0150"),
      (0.3000, 1.0000, "0160"), (1.0000, Double.PositiveInfinity, "0170"))
    if (!isB31) crr
    else Seq((0.0000, 0.0015, "0010"), (0.0000, 0.0005, "0015"),
      (0.0005, 0.0010, "0025"), (0.0010, 0.0015, "0030")) ++ crr.drop(3)
  }
  private val c0803ParentRefs = Set("0010", "0070", "0100", "0130")

  /** The Pillar 3 CR6/CR9 17-range scale, framework-invariant (reference
    * `reporting/pillar3/templates.py` CR6_PD_RANGES; parents 1/7/10/13). */
  private val cr6Ranges: Seq[(Double, Double, String)] = Seq(
    (0.0000, 0.0015, "1"), (0.0000, 0.0010, "2"), (0.0010, 0.0015, "3"),
    (0.0015, 0.0025, "4"), (0.0025, 0.0050, "5"), (0.0050, 0.0075, "6"),
    (0.0075, 0.0250, "7"), (0.0075, 0.0175, "8"), (0.0175, 0.0250, "9"),
    (0.0250, 0.1000, "10"), (0.0250, 0.0500, "11"), (0.0500, 0.1000, "12"),
    (0.1000, 1.0000, "13"), (0.1000, 0.2000, "14"), (0.2000, 0.3000, "15"),
    (0.3000, 1.0000, "16"), (1.0000, Double.PositiveInfinity, "17"))
  private val cr6ParentRefs = Set("1", "7", "10", "13")

  /** The C 08.02 coarse PD bands (reference `templates.py` PD_BANDS). */
  private val coarseBands: Seq[(Double, Double, String)] = Seq(
    (0.0, 0.0015, "0.00% - 0.15%"), (0.0015, 0.0025, "0.15% - 0.25%"),
    (0.0025, 0.005, "0.25% - 0.50%"), (0.005, 0.0075, "0.50% - 0.75%"),
    (0.0075, 0.025, "0.75% - 2.50%"), (0.025, 0.10, "2.50% - 10.00%"),
    (0.10, 0.9999, "10.00% - 99.99%"),
    (0.9999, Double.PositiveInfinity, "Default (100%)"))

  private def bandLabel(ranges: Seq[(Double, Double, String)],
      c: org.apache.spark.sql.Column, fallback: String): org.apache.spark.sql.Column = {
    val base: org.apache.spark.sql.Column =
      if (fallback == null) lit(null).cast("string") else lit(fallback)
    ranges.foldLeft(base) {
      case (acc, (lo, hi, ref)) =>
        val in = if (hi.isPosInfinity) c >= lo else c >= lo && c < hi
        when(in, ref).otherwise(acc)
    }
  }

  /** The obligor country's domestic currency (CRR Art. 114(4)/115(2)
    * local-currency limbs). Unknown countries resolve null — a currency
    * we cannot prove domestic never grants the preferential weight. */
  private def domesticCurrency(country: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Seq("GB" -> "GBP", "US" -> "USD", "CA" -> "CAD", "JP" -> "JPY",
      "CH" -> "CHF", "AU" -> "AUD", "FR" -> "EUR", "DE" -> "EUR",
      "IT" -> "EUR", "ES" -> "EUR", "NL" -> "EUR", "IE" -> "EUR")
      .foldLeft(lit(null).cast("string"): org.apache.spark.sql.Column) {
        case (acc, (cc, ccy)) => when(country === cc, ccy).otherwise(acc)
      }

  /** CRR Art. 162 exact fractional years from the reporting date to a date
    * column (reference `engine/utils.py::exact_fractional_years_expr`:
    * (end_year − start_year) + (end_ordinal − start_ordinal)/365). */
  private def fractionalYears(start: LocalDate,
      end: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (year(end) - lit(start.getYear)).cast("double") +
      (dayofyear(end).cast("double") / 365.0 - lit(start.getDayOfYear / 365.0))

  /** Synthetic SA-CCR netting-set exposures (reference
    * `engine/ccr/pipeline_adapter.py` → the aggregator's `ccr__<ns>` rows):
    * trades roll up through [[graft.engine.SaCcrKernel]] (adjusted
    * notionals on the Art. 279b 365.25-day year with the 10-BD start
    * floor, supervisory deltas, maturity factors, the five-class add-on,
    * RC / multiplier / alpha) into one exposure row per netting set whose
    * `drawn_amount` carries the EAD — the shape C 07.00's rows 0090-0130
    * and the C 34 / CCR templates read. */
  private def ccrSynthetic(b: RefBundle, cfg: RefRunConfig): Option[DataFrame] =
    for (trades0 <- b.trades; ns0 <- b.nettingSets) yield {
      import graft.engine.SaCcrKernel
      val rep = cfg.reportingDate
      val repLit = lit(java.sql.Date.valueOf(rep))
      val daysMat = datediff(col("maturity_date"), repLit).cast("double")
      val daysStart = coalesce(
        datediff(optCol(trades0, "start_date", "date"), repLit).cast("double"),
        lit(0.0))
      val bd = floor(daysMat * 5.0 / 7.0)
      val years = daysMat / 365.25
      val t = trades0
        .withColumn("netting_set", col("netting_set_id"))
        .withColumn("mf", SaCcrKernel.maturityFactorUnmargined(bd))
        .withColumn("sd_dur", SaCcrKernel.supervisoryDuration(daysStart, daysMat))
        .withColumn("adj",
          when(col("asset_class").isin("interest_rate", "credit"),
            col("notional") * col("sd_dur"))
            .when(col("asset_class") === "fx",
              greatest(abs(col("notional")),
                abs(coalesce(optCol(trades0, "notional_leg2", "double"),
                  col("notional")))))
            .otherwise(abs(coalesce(optCol(trades0, "market_price", "double"),
              lit(0.0)) * coalesce(optCol(trades0, "number_of_units", "double"),
              lit(1.0)))))
        .withColumn("delta0", coalesce(optCol(trades0, "delta", "double"),
          when(coalesce(optCol(trades0, "is_long", "boolean"), lit(true)),
            1.0).otherwise(-1.0)))
        .withColumn("eff", col("delta0") * col("adj") * col("mf"))
      val tradeFrame = t.select(
        col("netting_set"), col("trade_id"), col("asset_class"),
        col("eff"), years.as("years_to_maturity"),
        col("currency").as("hedging_set"),
        when(col("asset_class") === "commodity",
          optCol(t, "commodity_reference", "string"))
          .otherwise(optCol(t, "reference_entity", "string"))
          .as("reference_entity"),
        optCol(t, "is_index", "boolean").as("is_index"),
        optCol(t, "credit_quality", "string").as("credit_quality"),
        optCol(t, "commodity_type", "string").as("commodity_type"),
        coalesce(optCol(t, "mtm_value", "double"), lit(0.0)).as("mtm"))
      val addons = SaCcrKernel.addonAggregate(tradeFrame)
      val vNet = tradeFrame.groupBy(col("netting_set"))
        .agg(sum(col("mtm")).as("v_net"))
      val collNet = b.ccrCollateral.map(c =>
        c.groupBy(col("netting_set_id").as("netting_set"))
          .agg(sum(optCol(c, "collateral_value", "double")).as("c_net")))
      val nsFrame0 = ns0.select(
        col("netting_set_id").as("netting_set"),
        col("counterparty_reference"),
        coalesce(optCol(ns0, "is_margined", "boolean"), lit(false)).as("margined"),
        coalesce(optCol(ns0, "margin_threshold", "double"), lit(0.0)).as("th"),
        coalesce(optCol(ns0, "minimum_transfer_amount", "double"), lit(0.0)).as("mta"),
        coalesce(optCol(ns0, "nica", "double"), lit(0.0)).as("nica"))
        .join(vNet, Seq("netting_set"), "left")
        .withColumn("v_net", coalesce(col("v_net"), lit(0.0)))
      val withColl = collNet.fold(nsFrame0.withColumn("c_net", lit(0.0)))(cn =>
        nsFrame0.join(cn, Seq("netting_set"), "left")
          .withColumn("c_net", coalesce(col("c_net"), lit(0.0))))
      SaCcrKernel.ead(withColl.join(addons, Seq("netting_set")))
        .select(
          concat(lit("ccr__"), col("netting_set")).as("exposure_reference"),
          lit("ccr_netting_set").as("exposure_type"),
          col("counterparty_reference"),
          col("ead_ccr").as("drawn_amount"),
          lit(null).cast("double").as("undrawn_amount"),
          lit(null).cast("double").as("nominal_amount"),
          lit(null).cast("string").as("currency"),
          lit(null).cast("date").as("value_date"),
          lit(null).cast("date").as("maturity_date"),
          lit("derivative").as("product_type"),
          lit(null).cast("string").as("seniority"),
          lit(null).cast("boolean").as("leg_defaulted"),
          lit(null).cast("string").as("leg_risk_type"),
          lit(null).cast("string").as("obs_product"),
          lit(null).cast("double").as("original_maturity_years"),
          lit(null).cast("double").as("lgd_own"),
          lit(null).cast("boolean").as("has_income_cover_in"),
          lit(null).cast("boolean").as("has_sufficient_collateral_data"),
          lit(null).cast("string").as("leg_property_type"),
          lit(null).cast("double").as("leg_ltv"),
          col("netting_set").as("ccr_netting_set_id"))
    }

  /** Build the sealed results ledger for one bundle under one config. */
  /** Join each guaranteed leg's GUARANTOR attributes — entity/country/
    * revenue (the counterparty dim), best external CQS, internal PD — and
    * the guarantor's SA risk weight as a DIRECT senior exposure.
    *
    * The SA weight comes from the SAME [[graft.engine.SaKernel]] the book's
    * own legs run through, applied to a tiny pseudo-exposure frame at
    * distinct-guarantor grain (reference `data/tables/guarantor_rw.py`
    * `build_guarantor_rw_expr` — "the guaranteed portion is a direct
    * exposure to the guarantor", CRR Art. 235): one row per guarantor with
    * the guarantee's own currency (the Art. 114(4)/(7) + Art. 235(3)
    * domestic-CGCB 0% reads the currency the substituted exposure to the
    * sovereign is denominated in). Distinct-guarantor grain is bounded by
    * the counterparty dim, so the frame broadcasts at any book size. */
  private def joinGuarantorAttributes(b: RefBundle, cfg: RefRunConfig,
      exposures: DataFrame): DataFrame = {
    if (b.guarantees.isEmpty)
      return exposures.withColumns(Map(
        "g_entity_type" -> lit(null).cast("string"),
        "g_country_code" -> lit(null).cast("string"),
        "g_annual_revenue" -> lit(null).cast("double"),
        "g_external_cqs" -> lit(null).cast("int"),
        "g_internal_pd" -> lit(null).cast("double"),
        "g_rw_sa" -> lit(null).cast("double")))
    val gCpty = b.counterparties.select(
      col("counterparty_reference").as("g_guarantor_reference"),
      col("entity_type").as("g_entity_type"),
      col("country_code").as("g_country_code"),
      optCol(b.counterparties, "annual_revenue", "double").as("g_annual_revenue"))
    val gCqs = bestExternalCqs(b.ratings).select(
      col("counterparty_reference").as("g_guarantor_reference"),
      col("external_cqs").as("g_external_cqs"))
    val gPd = internalPd(b.ratings).select(
      col("counterparty_reference").as("g_guarantor_reference"),
      col("internal_pd").as("g_internal_pd"))
    val withG = exposures
      .join(broadcast(gCpty), Seq("g_guarantor_reference"), "left")
      .join(broadcast(gCqs), Seq("g_guarantor_reference"), "left")
      .join(broadcast(gPd), Seq("g_guarantor_reference"), "left")
    // distinct guarantors as direct senior SA exposures through SaKernel
    val gDim = withG.filter(col("g_guarantor_reference").isNotNull)
      .select(col("g_guarantor_reference"), col("g_entity_type"),
        col("g_country_code"), col("g_external_cqs"), col("g_currency"))
      .distinct()
    val gPseudo = gDim.select(
      col("g_guarantor_reference"),
      lit(cfg.framework).as("framework"),
      lit("STANDARDISED").as("approach"),
      chainOf(entityToSaClass, col("g_entity_type"), "other").as("exposure_class"),
      col("g_entity_type").as("entity_type"),
      lit(1.0).as("ead"),
      col("g_external_cqs").as("cqs"),
      lit(null).cast("int").as("sovereign_cqs"),
      col("g_currency").as("currency"),
      domesticCurrency(col("g_country_code")).as("local_currency"),
      col("g_country_code").as("country_code"),
      lit(null).cast("double").as("original_maturity_years"),
      lit(false).as("cp_is_natural_person"),
      lit(false).as("qualifies_as_retail"),
      lit(false).as("is_payroll_loan"),
      lit(false).as("is_qrre_transactor"),
      lit(null).cast("double").as("ltv"),
      lit(null).cast("string").as("property_type"),
      lit(false).as("has_income_cover"),
      lit(false).as("is_adc"),
      lit(false).as("is_presold"),
      lit(false).as("is_defaulted"),
      lit(0.0).as("provision_allocated"),
      lit(null).cast("string").as("scra_grade"),
      lit(null).cast("boolean").as("is_equivalent_jurisdiction"),
      lit(false).as("is_sme"),
      lit(false).as("is_investment_grade"),
      lit(false).as("use_investment_grade_assessment"),
      lit(false).as("is_infrastructure"),
      lit(null).cast("string").as("equity_type"),
      lit(false).as("is_diversified"),
      lit(false).as("is_exchange_traded"),
      lit("STANDARDISED").as("permission"),
      lit(null).cast("string").as("slotting_category"),
      lit(false).as("is_short_maturity"),
      lit(false).as("is_hvcre"))
    val gRwSa = graft.engine.SaKernel.calculate(gPseudo)
      .select(col("g_guarantor_reference"), col("risk_weight").as("g_rw_sa"))
    withG.join(broadcast(gRwSa), Seq("g_guarantor_reference"), "left")
  }

  def ledger(b: RefBundle, cfg: RefRunConfig, s: SparkSession): DataFrame = {
    import graft.engine.IrbKernel
    val isB31 = cfg.isB31
    val cpty = b.counterparties.select(
      col("counterparty_reference"),
      col("entity_type").as("cp_entity_type"),
      col("country_code").as("cp_country_code"),
      optCol(b.counterparties, "annual_revenue", "double").as("annual_revenue"),
      optCol(b.counterparties, "is_sme", "boolean").as("cp_is_sme"),
      optCol(b.counterparties, "default_status", "boolean").as("cp_default_status"),
      optCol(b.counterparties, "is_natural_person", "boolean").as("cp_is_natural_person"),
      optCol(b.counterparties, "is_managed_as_retail", "boolean")
        .as("cp_is_managed_as_retail"),
      optCol(b.counterparties, "is_qccp", "boolean").as("cp_is_qccp_in"))
    // Art. 154(4)(b) facility attributes coalesced onto the drawn child
    // (reference `stages/hierarchy` — the p1_244 pattern): is_revolving /
    // is_secured / limit live on the facility, the classifier reads them
    // off the drawn leg.
    val facAttrs = for (f <- b.facilities; fm <- b.facilityMappings) yield
      fm.filter(col("child_type") === "loan")
        .join(f.select(col("facility_reference").as("parent_facility_reference"),
          optCol(f, "is_revolving", "boolean").as("fac_is_revolving"),
          optCol(f, "is_secured", "boolean").as("fac_is_secured"),
          optCol(f, "limit", "double").as("fac_limit")),
          Seq("parent_facility_reference"))
        .select(col("child_reference").as("exposure_reference"),
          col("fac_is_revolving"), col("fac_is_secured"), col("fac_limit"))
    // Residential-property collateral linked to a loan is what moves a
    // retail exposure into RETAIL_MORTGAGE (reference fixture note: the
    // loan-level property columns alone do not).
    val reColl = b.collateral.map(c =>
      c.filter(col("collateral_type") === "real_estate" &&
          col("beneficiary_type") === "loan")
        .groupBy(col("beneficiary_reference").as("exposure_reference"))
        .agg(max(optCol(c, "property_ltv", "double")).as("coll_ltv"),
          max(optCol(c, "property_type", "string")).as("coll_property_type"),
          sum(optCol(c, "market_value", "double")).as("coll_market_value")))
    // Equity holdings ride their own input table (reference
    // `get_equity_result_bundle`); one `equity` exposure row per holding,
    // EAD = the carrying value.
    val equityRows = b.equityExposures.map(eq => eq.select(
      col("exposure_reference"),
      lit("equity").as("exposure_type"),
      col("counterparty_reference"),
      col("carrying_value").cast("double").as("drawn_amount"),
      lit(null).cast("double").as("undrawn_amount"),
      lit(null).cast("double").as("nominal_amount"),
      optCol(eq, "currency", "string").as("currency"),
      lit(null).cast("date").as("value_date"),
      lit(null).cast("date").as("maturity_date"),
      lit("equity").as("product_type"),
      lit(null).cast("string").as("seniority"),
      lit(null).cast("boolean").as("leg_defaulted"),
      lit(null).cast("string").as("leg_risk_type"),
      lit(null).cast("string").as("obs_product"),
      lit(null).cast("double").as("original_maturity_years"),
      lit(null).cast("double").as("lgd_own"),
      lit(null).cast("boolean").as("has_income_cover_in"),
      lit(null).cast("boolean").as("has_sufficient_collateral_data"),
      lit(null).cast("string").as("leg_property_type"),
      lit(null).cast("double").as("leg_ltv"),
      optCol(eq, "equity_type", "string").as("equity_type_in")))
    val unifiedCredit0 = unifyExposures(b, s)
      .withColumn("equity_type_in", lit(null).cast("string"))
    // equity / CCR synthetic legs carry no guarantee columns — the
    // name-union fills them null (an absent guarantee, exactly the loan
    // default)
    val unifiedCredit = equityRows.fold(unifiedCredit0)(eq =>
      unifiedCredit0.unionByName(eq, allowMissingColumns = true))
      .withColumn("ccr_netting_set_id", lit(null).cast("string"))
    val unified = ccrSynthetic(b, cfg)
      .fold(unifiedCredit)(ccr =>
        unifiedCredit.unionByName(
          ccr.withColumn("equity_type_in", lit(null).cast("string")),
          allowMissingColumns = true))
    val withAttrs = Seq(facAttrs, reColl).flatten
      .foldLeft(unified)((df, extra) =>
        df.join(broadcast(extra), Seq("exposure_reference"), "left"))
    def attr(df: DataFrame, name: String, sqlType: String) = optCol(df, name, sqlType)
    val exposures = withAttrs
      .withColumn("fac_is_revolving", attr(withAttrs, "fac_is_revolving", "boolean"))
      .withColumn("fac_is_secured", attr(withAttrs, "fac_is_secured", "boolean"))
      .withColumn("fac_limit", attr(withAttrs, "fac_limit", "double"))
      .withColumn("coll_ltv", attr(withAttrs, "coll_ltv", "double"))
      .withColumn("coll_property_type", attr(withAttrs, "coll_property_type", "string"))
      .withColumn("coll_market_value", attr(withAttrs, "coll_market_value", "double"))
      .join(broadcast(cpty), Seq("counterparty_reference"), "left")
      .join(broadcast(bestExternalCqs(b.ratings)), Seq("counterparty_reference"), "left")
      .join(broadcast(internalPd(b.ratings)), Seq("counterparty_reference"), "left")
      .join(broadcast(internalModel(b.ratings)), Seq("counterparty_reference"), "left")
      .join(b.specialisedLending.map(sl => broadcast(sl.select(
        col("counterparty_reference"),
        col("sl_type").as("sl_type_in"),
        col("slotting_category").as("slotting_category_in"))))
        .getOrElse(s.emptyDataFrame
          .withColumn("counterparty_reference", lit(null).cast("string"))
          .withColumn("sl_type_in", lit(null).cast("string"))
          .withColumn("slotting_category_in", lit(null).cast("string"))),
        Seq("counterparty_reference"), "left")
      .transform(joinGuarantorAttributes(b, cfg, _))

    // ---- classification (reference `engine/stages/classify`) ----------
    val retailEligible = coalesce(col("cp_is_natural_person"), lit(false)) &&
      coalesce(col("cp_is_managed_as_retail"), lit(false))
    val isMortgage = col("coll_ltv").isNotNull || col("coll_property_type").isNotNull
    // Art. 154(4) QRRE gate: revolving + unsecured + limit under the cap
    // (CRR EUR 100k; PS1/26 GBP 90k).
    val qrreCap = if (isB31) 90000.0 else 100000.0
    val isQrre = coalesce(col("fac_is_revolving"), lit(false)) &&
      !coalesce(col("fac_is_secured"), lit(false)) &&
      coalesce(col("fac_limit"), lit(0.0)) <= qrreCap &&
      col("fac_limit").isNotNull
    // SME: the input flag when supplied, else the turnover test (CRR
    // Art. 501 EUR 50m converted into the GBP book at 0.8732 = 43.66m;
    // PS1/26 GBP 44m directly).
    val smeThreshold = if (isB31) 44e6 else 43.66e6
    val isSme = coalesce(col("cp_is_sme"),
      col("annual_revenue") <= smeThreshold, lit(false))
    // The RAW origination class (sealed `exposure_class`): the Art. 112/147
    // taxonomy with the SME / retail sub-class refinements, but WITHOUT the
    // applied-ladder reassignments (defaulted, the RE-secured corporate
    // reclass) — C 08.07 and the C 09.01 defaulted memo key this.
    def rawRefine(base: org.apache.spark.sql.Column) =
      when(base === "retail_other" && retailEligible && isQrre, "retail_qrre")
        .when(base === "retail_other" && retailEligible && isMortgage, "retail_mortgage")
        .when(base === "corporate" && isSme, "corporate_sme")
        .otherwise(base)
    // The APPLIED class adds the RE-secured reclass (the SA loan-split
    // landing class) on top of the raw taxonomy.
    def refineRetail(base: org.apache.spark.sql.Column) = {
      val raw = rawRefine(base)
      when(base === "corporate" && !isSme && isMortgage &&
        col("coll_property_type") === "commercial", "commercial_mortgage")
        .otherwise(raw)
    }
    val saClassRaw = rawRefine(chainOf(entityToSaClass, col("cp_entity_type"), "other"))
    val saClass = refineRetail(chainOf(entityToSaClass, col("cp_entity_type"), "other"))
    val irbClass = refineRetail(chainOf(entityToIrbClass, col("cp_entity_type"), "other"))
    val isDefaulted =
      coalesce(col("leg_defaulted"), lit(false)) ||
      coalesce(col("cp_default_status"), lit(false))
    // IRB routes only with an internal PD, under IRB permission mode and a
    // granted model (`api/service.py:47-53`; the bundle's model_permissions
    // book), and — under Basel 3.1 — never for the sovereign class
    // (PS1/26 Art. 147A(1)(a): Standardised-only).
    val irbPermitted = cfg.permissionMode == "irb" && b.modelPermissions.nonEmpty
    val irbEligible = lit(irbPermitted) &&
      col("internal_pd").isNotNull && !isDefaulted &&
      !(lit(isB31) && irbClass === "central_govt_central_bank")
    // CRR Art. 153(5): an SL exposure with a granted model but NO internal
    // PD falls to supervisory slotting.
    val slottingEligible = lit(irbPermitted) &&
      coalesce(col("has_internal_model"), lit(false)) &&
      col("internal_pd").isNull && col("sl_type_in").isNotNull && !isDefaulted
    // A-IRB needs own LGD estimates with sufficient data (Art. 143/151);
    // retail is A-IRB-only and carries them, F-IRB covers the rest.
    val aIrb = irbEligible && col("lgd_own").isNotNull &&
      coalesce(col("has_sufficient_collateral_data"), lit(false))

    val isCcrRow = col("exposure_type") === "ccr_netting_set"
    // Under the Basel 3.1 output floor the calc stage relabels CCR rows to
    // `standardised_ccr` so they route into the floor-eligible approaches
    // (reference `engine/stages/calc.py`, noted in `corep/c07.py`).
    val saLabel = when(isCcrRow && lit(isB31), lit("standardised_ccr"))
      .otherwise(lit("standardised"))
    val classified = exposures.withColumns(Map(
      "is_defaulted" -> isDefaulted,
      "is_sme_flag" -> isSme,
      "exposure_class" ->
        when(col("exposure_type") === "equity", "equity")
          .when(isCcrRow, saClass)
          .when(slottingEligible, "specialised_lending")
          .when(irbEligible, irbClass)
          // a defaulted SA exposure reassigns to the defaulted class
          // (C 07.00 defaulted sheet / C 02.00 row 0160; Art. 127)
          .when(isDefaulted, "defaulted")
          .otherwise(saClass),
      "exposure_class_raw" ->
        when(col("exposure_type") === "equity", "equity")
          .when(isCcrRow, saClassRaw)
          .when(slottingEligible, "specialised_lending")
          .when(irbEligible, irbClass)
          .otherwise(saClassRaw),
      "approach_applied" ->
        when(col("exposure_type") === "equity", lit("equity"))
          .when(isCcrRow, saLabel)
          .when(slottingEligible, lit("slotting"))
          .when(aIrb, lit("advanced_irb"))
          .when(irbEligible, lit("foundation_irb"))
          .otherwise(lit("standardised"))))

    // ---- EAD (Art. 111): drawn + CCF-converted off-balance gross ------
    // The Annex I / Table A1 CCF engine (reference `engine/ccf.py`):
    //  1. resolve risk_type from the concrete OBS product only when no
    //     explicit risk_type was supplied (`obs_product_to_risk_type`,
    //     rulepack `packs/common.py:870`);
    //  2. canonicalise via RISK_TYPE_SYNONYMS (`data/schemas.py:2237`);
    //  3. look up the regime's `sa_ccf` table (`packs/crr.py:381` /
    //     `packs/b31.py:354`), MR-equivalent 50% default;
    //  4. CRR-only OC original-maturity split (Annex I items 2(b)/3(b)):
    //     <= 365 days original maturity drops OC to the 20% MLR rate,
    //     keyed on original_maturity_years else (maturity - value) days.
    // A drawn loan carries ccf = 0.0 (the real CRR 0% bucket; the C 07.00
    // off-side narrowing keeps it out of the CCF columns).
    val productToRiskType = Seq(
      "ACCEPTANCE" -> "FR", "PERFORMANCE_BOND" -> "MLR", "WARRANTY" -> "MLR",
      "TENDER_BOND" -> "MLR", "BID_BOND" -> "MLR",
      "DOCUMENTARY_CREDIT" -> "MLR", "TRADE_LC" -> "MLR")
    val riskTypeSynonyms = Seq(
      "fr" -> "FR", "full_risk" -> "FR", "frc" -> "FRC",
      "full_risk_commitment" -> "FRC", "mr" -> "MR", "medium_risk" -> "MR",
      "mr_issued" -> "MR_ISSUED", "medium_risk_issued" -> "MR_ISSUED",
      "oc" -> "OC", "other_commit" -> "OC", "mlr" -> "MLR",
      "medium_low_risk" -> "MLR", "lr" -> "LR", "low_risk" -> "LR")
    val saCcfTable: Seq[(String, Double)] = // regime-resolved Decimal -> Double
      if (isB31) Seq("FR" -> 1.0, "FRC" -> 1.0, "MR" -> 0.5,
        "MR_ISSUED" -> 0.5, "OC" -> 0.4, "MLR" -> 0.2, "LR" -> 0.1)
      else Seq("FR" -> 1.0, "FRC" -> 1.0, "MR" -> 0.5,
        "MR_ISSUED" -> 0.5, "OC" -> 0.5, "MLR" -> 0.2, "LR" -> 0.0)
    val productRt = productToRiskType.foldLeft(lit(null).cast("string")) {
      case (acc, (k, v)) => when(upper(col("obs_product")) === k, v).otherwise(acc)
    }
    val rtBlank = coalesce(col("leg_risk_type"), lit("")) === ""
    val rtFilled = when(rtBlank && productRt.isNotNull, productRt)
      .otherwise(col("leg_risk_type"))
    val rtLowered = lower(coalesce(rtFilled, lit("")))
    val canonicalRt = riskTypeSynonyms.foldLeft(upper(coalesce(rtFilled, lit("")))) {
      case (acc, (k, v)) => when(rtLowered === k, lit(v)).otherwise(acc)
    }
    val ccfLookup = saCcfTable.foldLeft(lit(0.5): org.apache.spark.sql.Column) {
      case (acc, (k, v)) => when(canonicalRt === k, v).otherwise(acc)
    }
    val originalDays = when(col("original_maturity_years").isNotNull,
      col("original_maturity_years") * 365.0)
      .otherwise(when(col("maturity_date").isNotNull && col("value_date").isNotNull,
        datediff(col("maturity_date"), col("value_date")).cast("double")))
    val ccfWithOcSplit =
      if (isB31) ccfLookup
      else when(canonicalRt === "OC" && originalDays.isNotNull &&
        originalDays <= 365.0, 0.2).otherwise(ccfLookup)
    val ccfChain =
      when(col("exposure_type") === "ccr_netting_set", lit(null).cast("double"))
        .when(col("exposure_type") === "loan", 0.0)
        .otherwise(ccfWithOcSplit)
    val offGross = coalesce(col("undrawn_amount"), col("nominal_amount"))
    val withEad = classified.withColumns(Map(
      "ccf" -> ccfChain,
      "ead_final" ->
        (greatest(col("drawn_amount"), lit(0.0)) +
          coalesce(greatest(offGross, lit(0.0)) * ccfChain, lit(0.0)))))

    // ---- SA risk weighting (SaKernel — Art. 114-134 both regimes).
    // Run over EVERY leg: SA-routed legs take it as their own weight and
    // the IRB book keeps it as the S-TREA shadow (`sa_rwa`) the Basel 3.1
    // output-floor comparison reads (OF 02.01 col 0040; `aggregator.py`'s
    // shadow standardised run).
    val originalMaturityYears =
      when(col("maturity_date").isNotNull && col("value_date").isNotNull,
        datediff(col("maturity_date"), col("value_date")) / lit(365.0))
    val sealedPropertyType =
      when(isMortgage, coalesce(col("coll_property_type"), col("leg_property_type")))
        .otherwise(col("leg_property_type"))
    val attrs = withEad.withColumns(Map(
      "framework" -> lit(cfg.framework),
      "approach" -> lit("STANDARDISED"),
      "entity_type" -> col("cp_entity_type"),
      "ead" -> col("ead_final"),
      "cqs" -> col("external_cqs"),
      "sovereign_cqs" -> lit(null).cast("int"),
      // Art. 114(4): "local currency" is the SOVEREIGN's domestic currency
      // — an exposure is local only when denominated in the obligor
      // country's own currency, never merely in the book base.
      "local_currency" -> domesticCurrency(col("cp_country_code")),
      "country_code" -> col("cp_country_code"),
      "original_maturity_years" -> originalMaturityYears,
      "qualifies_as_retail" -> retailEligible,
      "is_payroll_loan" -> lit(false),
      "is_qrre_transactor" -> lit(false),
      "ltv" -> coalesce(col("leg_ltv"), col("coll_ltv")),
      "property_type" -> sealedPropertyType,
      "has_income_cover" -> coalesce(col("has_income_cover_in"), lit(false)),
      "is_adc" -> lit(false),
      "is_presold" -> lit(false),
      "provision_allocated" -> lit(0.0),
      "scra_grade" -> lit(null).cast("string"),
      "is_equivalent_jurisdiction" -> lit(null).cast("boolean"),
      "is_sme" -> col("is_sme_flag"),
      "is_investment_grade" -> lit(false),
      "use_investment_grade_assessment" -> lit(false),
      "is_infrastructure" -> lit(false),
      "equity_type" -> lit(null).cast("string"),
      "is_diversified" -> lit(false),
      "is_exchange_traded" -> lit(false),
      "permission" -> lit(cfg.permissionMode.toUpperCase),
      "slotting_category" -> col("slotting_category_in"),
      "is_short_maturity" -> lit(false),
      "is_hvcre" -> lit(false)))
    // Art. 306(1): a QCCP trade exposure takes the 2% weight; a null
    // is_qccp flag on a `ccp` counterparty is treated as qualifying.
    val qccpTrade = isCcrRow && col("cp_entity_type") === "ccp" &&
      coalesce(col("cp_is_qccp_in"), lit(true))
    val saWeighted0 = SaKernel.calculate(attrs)
    val saWeighted = saWeighted0
      .withColumn("sa_risk_weight",
        when(qccpTrade, 0.02).otherwise(col("risk_weight")))
      .withColumn("sa_rwa_leg",
        when(qccpTrade, lit(0.02) * col("ead_final")).otherwise(col("rwa")))
      .drop("risk_weight", "rwa")

    // ---- IRB risk weighting (IrbKernel parts, golden-precision Φ⁻¹).
    // Composed from the kernel's published formulae rather than
    // `IrbKernel.calculate` so the refbook can (a) exempt the sovereign
    // class from the CRR Art. 160(1) PD floor (it reaches corporates,
    // institutions and retail only) and (b) route the conditional PD
    // through the Halley-refined Φ⁻¹ the reporting goldens need at
    // rtol 1e-9 (`IrbKernel.normPpfPrecise`).
    val isIrb = col("approach_applied").isin("foundation_irb", "advanced_irb")
    val pdFloorVal =
      if (!isB31)
        when(col("exposure_class") === "central_govt_central_bank", 0.0)
          .otherwise(0.0003)
      else
        when(col("exposure_class") === "retail_qrre", 0.001) // non-transactor
          .when(col("exposure_class") === "retail_mortgage", 0.001)
          .otherwise(0.0005)
    val pdFloored = when(isIrb, greatest(col("internal_pd"), pdFloorVal))
    // F-IRB supervisory LGD: senior 45% (CRR) / 40% for non-FSE (PS1/26
    // Art. 161(1)(aa)); subordinated 75%. A-IRB: own estimate with the
    // B3.1 input floors (mortgage 5%, QRRE 50%, other retail 30%).
    val firbLgd = when(col("seniority") === "subordinated", 0.75)
      .otherwise(if (isB31) lit(0.40) else lit(0.45))
    val b31LgdFloor = when(col("exposure_class") === "retail_mortgage", 0.05)
      .when(col("exposure_class") === "retail_qrre", 0.50)
      .when(col("exposure_class") === "retail_other", 0.30)
      .otherwise(0.25)
    val airbLgd =
      if (isB31) greatest(col("lgd_own"), b31LgdFloor) else col("lgd_own")
    val lgdApplied = when(col("approach_applied") === "advanced_irb", airbLgd)
      .when(col("approach_applied") === "foundation_irb", firbLgd)
    // Art. 162: effective maturity = exact fractional years from the
    // reporting date, clipped [1, 5]; 2.5 with no maturity date.
    val mYears = when(col("maturity_date").isNotNull,
      least(greatest(fractionalYears(cfg.reportingDate, col("maturity_date")),
        lit(1.0)), lit(5.0))).otherwise(lit(2.5))
    val corporateLike = col("exposure_class").isin(
      "corporate", "corporate_sme", "institution", "central_govt_central_bank")
    val smeEligible = col("exposure_class").isin("corporate", "corporate_sme")
    val sizeMetricM = col("annual_revenue") / 1e6
    // CRR's Art. 153(4) size bounds are EUR 5m/50m; the reference converts
    // them into the GBP book at eur_gbp_rate = 0.8732 (4.366/43.66 —
    // `engine/irb/formulas.py:685`); PS1/26 states GBP 4.4m/44m directly.
    val corr =
      when(smeEligible && col("annual_revenue").isNotNull,
        if (isB31) IrbKernel.correlationSme(pdFloored, sizeMetricM, 4.4, 44.0)
        else IrbKernel.correlationSme(pdFloored, sizeMetricM, 4.366, 43.66))
        .when(corporateLike, IrbKernel.correlationCorporate(pdFloored))
        .when(col("exposure_class") === "retail_mortgage",
          lit(IrbKernel.CorrelationMortgage))
        .when(col("exposure_class") === "retail_qrre", lit(IrbKernel.CorrelationQrre))
        .otherwise(IrbKernel.correlationRetailOther(pdFloored))
    val scaling = if (isB31) 1.0 else 1.06
    val irbRwBase = lgdApplied *
      (IrbKernel.conditionalPdPrecise(pdFloored, corr) - pdFloored) *
      lit(12.5) * lit(scaling)
    val irbRw = when(corporateLike,
      irbRwBase * IrbKernel.maturityAdjustment(pdFloored, mYears))
      .otherwise(irbRwBase)
    val irbRwaRaw = irbRw * col("ead_final")
    val irbRwa =
      if (isB31) irbRwaRaw
      else when(col("exposure_class") === "corporate_sme",
        // the Art. 501 EUR 2.5m threshold in the GBP book (x 0.8732)
        irbRwaRaw * IrbKernel.smeSupportingFactor(col("ead_final"), 2183000.0))
        .otherwise(irbRwaRaw)
    val expectedLoss = when(isIrb, pdFloored * lgdApplied * col("ead_final"))

    // Supervisory slotting (CRR Art. 153(5) Table 1 + the Art. 158(6) EL
    // rates), keyed on category x the 2.5-year residual-maturity split.
    val isSlotting = col("approach_applied") === "slotting"
    val slShort = mYears < 2.5
    def slTable(short: Seq[(String, Double)], long: Seq[(String, Double)]) =
      when(slShort, short.foldLeft(lit(0.0): org.apache.spark.sql.Column) {
        case (acc, (k, v)) => when(col("slotting_category_in") === k, v).otherwise(acc)
      }).otherwise(long.foldLeft(lit(0.0): org.apache.spark.sql.Column) {
        case (acc, (k, v)) => when(col("slotting_category_in") === k, v).otherwise(acc)
      })
    val slotRw = slTable(
      Seq("strong" -> 0.5, "good" -> 0.7, "satisfactory" -> 1.15,
        "weak" -> 2.5, "default" -> 0.0),
      Seq("strong" -> 0.7, "good" -> 0.9, "satisfactory" -> 1.15,
        "weak" -> 2.5, "default" -> 0.0))
    val slElRate = slTable(
      Seq("strong" -> 0.0, "good" -> 0.004, "satisfactory" -> 0.028,
        "weak" -> 0.08, "default" -> 0.5),
      Seq("strong" -> 0.004, "good" -> 0.008, "satisfactory" -> 0.028,
        "weak" -> 0.08, "default" -> 0.5))
    // Equity (Art. 133 / Art. 155(2) simple; PS1/26 Art. 133A 250% SA-only):
    // with IRB permission CRR routes the simple risk-weight method, with the
    // Art. 158(7)-(9) EL rates; Basel 3.1 routes SA.
    val isEquity = col("approach_applied") === "equity"
    val equityIrbMethod = !isB31 && irbPermitted
    val eqType = coalesce(col("equity_type_in"), lit("other"))
    val eqRw =
      if (isB31) lit(2.5)
      else if (equityIrbMethod)
        when(eqType === "private", 1.9).when(eqType === "listed", 2.9)
          .otherwise(3.7)
      else lit(1.0)
    val eqElRate =
      if (equityIrbMethod)
        when(eqType.isin("private", "listed"), 0.008).otherwise(0.024)
      else lit(null).cast("double")
    // Art. 134 other-items ladder SaKernel's generic `other` arm does not
    // split: items in the course of collection 20%, cash/gold 0%.
    val otherItemsRw =
      when(col("cp_entity_type") === "other_items_in_collection", 0.2)
        .when(col("cp_entity_type").isin("other_cash", "other_gold"), 0.0)
    val saRwAdj = coalesce(otherItemsRw, col("sa_risk_weight"))
    // SaKernel.rwa already applies the CRR SA SME supporting factor.
    val saRwaAdj = when(otherItemsRw.isNotNull, otherItemsRw * col("ead_final"))
      .otherwise(col("sa_rwa_leg"))
    val weighted = saWeighted.withColumns(Map(
      "pd_floored" -> pdFloored,
      "lgd_floored" -> lgdApplied,
      "irb_maturity_m" -> when(isIrb, mYears),
      "sl_short" -> when(isSlotting, slShort),
      "expected_loss" ->
        when(isSlotting, slElRate * col("ead_final"))
          .when(isEquity, eqElRate * col("ead_final"))
          .otherwise(expectedLoss),
      "risk_weight" ->
        when(isSlotting, slotRw)
          .when(isEquity, eqRw)
          .when(isIrb, irbRw)
          .otherwise(saRwAdj),
      "rwa" ->
        when(isSlotting, slotRw * col("ead_final"))
          .when(isEquity, eqRw * col("ead_final"))
          .when(isIrb, irbRwa)
          .otherwise(saRwaAdj),
      // the S-TREA shadow follows the same equity / other-items overrides
      // as the live SA weight (the shadow pass fell through to the
      // counterparty ladder for both)
      "sa_rwa_leg" ->
        when(isEquity, lit(if (isB31) 2.5 else 1.0) * col("ead_final"))
          .when(otherItemsRw.isNotNull, otherItemsRw * col("ead_final"))
          .otherwise(col("sa_rwa_leg"))))

    // ---- CRM guarantee substitution (reference `engine/irb/guarantee.py`
    // `apply_guarantee_substitution` + `engine/sa/rw_adjustments.py` +
    // `engine/crm/guarantees.py::_assign_guarantor_approach`). The `__G_`
    // covered leg is fully covered by construction (the split put the
    // covered amount on it), so the Art. 235(1) blend collapses to
    // `covered × guarantor_rw`. The benefit test is Art. 193(1): the
    // substituted weight must BEAT the leg's own, else the engine
    // DECLINES and the leg keeps the borrower basis end to end.
    val gp = coalesce(col("guaranteed_portion_in"), lit(0.0))
    val gSaClass = chainOf(entityToSaClass, col("g_entity_type"), "other")
    val gIrbClass = chainOf(entityToIrbClass, col("g_entity_type"), "other")
    // Art. 114(4)/(7) + Art. 235(3): a domestic-currency CGCB guarantor is
    // SA-treated unconditionally (its 0% carve-out has no IRB analogue).
    val gDomestic = gSaClass === "central_govt_central_bank" &&
      col("g_currency").isNotNull &&
      col("g_currency") === domesticCurrency(col("g_country_code"))
    // Art. 201(1)(g)/(2): a corporate guarantor is eligible only with an
    // ECAI rating or (IRB beneficiary) an internal rating.
    val gCorpIneligible = gSaClass === "corporate" &&
      !(col("g_external_cqs").isNotNull || (isIrb && col("g_internal_pd").isNotNull))
    // IRB parameter substitution (Art. 161 / CRE22.70-85) reaches F-IRB/
    // A-IRB beneficiaries only — never slotting (Art. 201(2)'s internal-
    // rating limb does not reach it) and never SA beneficiaries.
    val gApproach = when(col("g_guarantor_reference").isNull, lit(null).cast("string"))
      .when(gDomestic, "sa")
      .when(isIrb && lit(irbPermitted) && col("g_internal_pd").isNotNull, "irb")
      .when(!gCorpIneligible, "sa")
      .otherwise(lit(null).cast("string"))
    // Guarantor IRB RW — the full formula with the GUARANTOR's floored PD,
    // class-context correlation and the F-IRB supervisory LGD for a direct
    // obligation of the guarantor's seniority (Art. 161(1)(a)/(aa)/(b));
    // the maturity adjustment stays the LEG's (the exposure's M governs).
    val gPdFloorVal =
      if (!isB31) when(gIrbClass === "central_govt_central_bank", 0.0).otherwise(0.0003)
      else when(gIrbClass === "retail_qrre", 0.001)
        .when(gIrbClass === "retail_mortgage", 0.001).otherwise(0.0005)
    val gPdFloored = greatest(col("g_internal_pd"), gPdFloorVal)
    val gLgd = when(col("g_seniority") === "subordinated", 0.75)
      .otherwise(if (isB31) lit(0.40) else lit(0.45))
    val gCorporateLike = gIrbClass.isin(
      "corporate", "corporate_sme", "institution", "central_govt_central_bank")
    val gCorr =
      when(gIrbClass.isin("corporate", "corporate_sme") && col("g_annual_revenue").isNotNull,
        if (isB31) IrbKernel.correlationSme(gPdFloored, col("g_annual_revenue") / 1e6, 4.4, 44.0)
        else IrbKernel.correlationSme(gPdFloored, col("g_annual_revenue") / 1e6, 4.366, 43.66))
        .when(gCorporateLike, IrbKernel.correlationCorporate(gPdFloored))
        .when(gIrbClass === "retail_mortgage", lit(IrbKernel.CorrelationMortgage))
        .when(gIrbClass === "retail_qrre", lit(IrbKernel.CorrelationQrre))
        .otherwise(IrbKernel.correlationRetailOther(gPdFloored))
    val gRwIrbBase = gLgd *
      (IrbKernel.conditionalPdPrecise(gPdFloored, gCorr) - gPdFloored) *
      lit(12.5) * lit(scaling)
    val gRwIrb = when(gCorporateLike,
      gRwIrbBase * IrbKernel.maturityAdjustment(gPdFloored, mYears))
      .otherwise(gRwIrbBase)
    val guarantorRw = when(gApproach === "irb", gRwIrb)
      .when(gApproach === "sa", col("g_rw_sa"))
    val beneficial = gp > 0 && guarantorRw.isNotNull &&
      guarantorRw < col("risk_weight")
    val gParamSub = beneficial && gApproach === "irb"
    val substituted = weighted.withColumns(Map(
      "risk_weight" -> when(beneficial, guarantorRw).otherwise(col("risk_weight")),
      "rwa" -> when(beneficial, guarantorRw * col("ead_final")).otherwise(col("rwa")),
      // EL follows the benefit (reference `_adjust_expected_loss`): an
      // SA-substituted leg is a direct SA exposure and carries no EL; a
      // parameter-substituted one takes the guarantor's floored PD × the
      // same supervisory LGD the RW used. The sealed PD/LGD/grade columns
      // stay the OBLIGOR's — the reference never reseals them (C 08.02
      // routes an arrived leg to its "Unassigned" residual row precisely
      // because the ledger carries the obligor's grade, never the
      // guarantor's — `c08.py::_C08_02_INFLOW_ROW`, decision R12).
      "expected_loss" -> when(gParamSub, gPdFloored * gLgd * col("ead_final"))
        .when(beneficial, lit(0.0)).otherwise(col("expected_loss")),
      "class_post" -> when(gParamSub, gIrbClass)
        .when(beneficial, gSaClass).otherwise(col("exposure_class")),
      "approach_post" -> when(beneficial && gApproach === "sa", lit("standardised"))
        .otherwise(col("approach_applied")),
      "post_crm_class_g" -> when(col("g_guarantor_reference").isNotNull,
        when(gApproach === "irb", gIrbClass).otherwise(gSaClass)),
      "is_beneficial_g" -> when(gp > 0, beneficial),
      // the S-TREA shadow applies the SAME guarantee under SA rules: the
      // covered leg takes the guarantor's SA weight when it beats the
      // leg's own shadow weight
      "sa_rwa_leg" -> when(gp > 0 && col("g_rw_sa").isNotNull &&
        col("g_rw_sa") * col("ead_final") < col("sa_rwa_leg"),
        col("g_rw_sa") * col("ead_final")).otherwise(col("sa_rwa_leg"))))

    // ---- PD band labels (cfg-aware; cube keys for the C 08.03/05, CR6/
    // CR9 and C 08.02 row axes). Allocation source per the recorded rule:
    // B3.1 the PRE-floor pd, CRR the post-floor pd (`c08.py::_pd_alloc_col`
    // / `cr6.py::_alloc_pd_source`); CR6/CR9 force defaulted legs to the
    // 100% band; the C 08.02 coarse bands key pd_floored under both.
    // Bands stay on the OBLIGOR's pd on every leg, substituted or not
    // (the ledger never carries the guarantor's grade — see the
    // substitution block above).
    val allocPd = if (isB31) col("internal_pd") else col("pd_floored")
    val cr6Alloc = when(isDefaulted, 1.0).otherwise(allocPd)
    val ranges = c0803Ranges(isB31)
    val leafR = ranges.filterNot(r => c0803ParentRefs(r._3))
    val parentR = ranges.filter(r => c0803ParentRefs(r._3))
    val cr6LeafR = cr6Ranges.filterNot(r => cr6ParentRefs(r._3))
    val cr6ParentR = cr6Ranges.filter(r => cr6ParentRefs(r._3))
    val banded = substituted.withColumns(Map(
      "pd_band_leaf" -> when(isIrb, bandLabel(leafR, allocPd, "UNASSIGNED")),
      "pd_band_parent" ->
        when(isIrb, bandLabel(parentR, allocPd, null)).cast("string"),
      "cr6_band_leaf" -> when(isIrb, bandLabel(cr6LeafR, cr6Alloc, "UNASSIGNED")),
      "cr6_band_parent" ->
        when(isIrb, bandLabel(cr6ParentR, cr6Alloc, null)).cast("string"),
      "pd_band_coarse" -> when(isIrb, bandLabel(coarseBands, col("pd_floored"), "Unassigned"))))

    // ---- seal: the reporting projection (`aggregator.py:1016-1056`) ---
    val crr = !isB31
    val rwaPre = col("risk_weight") * col("ead_final")
    val smeApplied = lit(crr) && col("exposure_class") === "corporate_sme" &&
      col("is_sme_flag") &&
      col("approach_applied").isin("standardised", "foundation_irb", "advanced_irb")
    val infraApplied = lit(crr) && coalesce(col("is_infrastructure"), lit(false))
    banded.select(
      col("exposure_reference"),
      col("counterparty_reference"),
      col("exposure_type"),
      when(col("exposure_type") === "ccr_netting_set", "CCR_DERIVATIVE")
        .otherwise("CREDIT").as("risk_type"),
      col("exposure_class_raw").as("exposure_class"),
      col("exposure_class").as("reporting_class_origin"),
      // post-substitution twins (reference `aggregator.py`
      // `exposure_class_post_crm` / `approach_post_crm`): the guarantor's
      // class on a beneficially-substituted `__G_` leg, the obligor's
      // everywhere else — the cross-template inflow routing keys
      col("class_post").as("reporting_class"),
      col("approach_applied"),
      col("approach_applied").as("reporting_approach_origin"),
      col("approach_post").as("reporting_approach"),
      col("cp_entity_type"),
      col("cp_country_code"),
      col("cp_country_code").as("reporting_country_origin"),
      col("cp_country_code").as("reporting_country"),
      col("external_cqs"),
      col("is_defaulted"),
      col("is_sme_flag").as("is_sme"),
      lit(false).as("is_infrastructure"),
      smeApplied.as("sme_supporting_factor_applied"),
      infraApplied.as("infrastructure_factor_applied"),
      lit(false).as("currency_mismatch_multiplier_applied"),
      col("sl_type_in").as("sl_type"),
      col("slotting_category_in").as("slotting_category"),
      col("sl_short"),
      col("property_type"),
      when(isMortgage || col("exposure_class").isin("retail_mortgage",
        "commercial_mortgage", "residential_mortgage"),
        coalesce(col("has_income_cover_in"), lit(false)))
        .as("materially_dependent_on_property"),
      lit(null).cast("boolean").as("is_qualifying_re"),
      lit(false).as("is_adc"),
      col("cp_is_qccp_in").as("cp_is_qccp"),
      lit(false).as("is_under_irb_rollout"),
      // per-side floored gross carriers (null outside the leg's side)
      greatest(col("drawn_amount"), lit(0.0)).as("reporting_gross_drawn"),
      greatest(coalesce(col("undrawn_amount"), col("nominal_amount")), lit(0.0))
        .as("reporting_gross_undrawn"),
      when(col("exposure_type") === "loan", greatest(col("drawn_amount"), lit(0.0)))
        .otherwise(lit(null).cast("double")).as("reporting_gross_on_bs"),
      when(col("exposure_type") === "facility_undrawn",
        greatest(col("undrawn_amount"), lit(0.0)))
        .when(col("exposure_type") === "contingent",
          greatest(col("nominal_amount"), lit(0.0)))
        .when(col("exposure_type") === "loan", lit(0.0))
        .otherwise(lit(null).cast("double")).as("reporting_gross_off_bs"),
      when(col("exposure_type") === "loan", lit(true))
        .when(col("exposure_type").isin("facility_undrawn", "contingent"), lit(false))
        .otherwise(lit(null).cast("boolean")).as("reporting_on_balance_sheet"),
      col("ccf"),
      col("ead_final"),
      col("ead_final").as("reporting_ead"),
      col("risk_weight"),
      col("risk_weight").as("reporting_rw"),
      rwaPre.as("rwa_pre_factor"),
      col("rwa").as("rwa_final"),
      col("rwa").as("rwa_pre_floor"),
      // S-TREA leg: the shadow standardised run of every leg (equal to the
      // leg's own RWA wherever it already routes SA) — the Basel 3.1
      // output-floor comparison basis.
      col("sa_rwa_leg").as("sa_rwa"),
      lit(if (cfg.isB31) cfg.outputFloorPct else null)
        .cast("double").as("output_floor_pct"),
      // IRB parameter seals (null on the standardised book)
      when(isIrb, col("internal_pd")).as("pd"),
      col("pd_floored"),
      col("lgd_floored"),
      // the post-CRM LGD seal carries the UNFLOORED own estimate on the
      // A-IRB book (the floors live in lgd_floored) and the supervisory
      // 45% on slotting legs (C 09.02 col 0090 pins both)
      when(col("approach_applied") === "advanced_irb", col("lgd_own"))
        .when(col("approach_applied") === "slotting", lit(0.45))
        .when(col("approach_applied") === "foundation_irb", col("lgd_floored"))
        .as("lgd_post_crm"),
      col("irb_maturity_m"),
      col("expected_loss"),
      lit(null).cast("string").as("cp_internal_rating_grade"),
      // Art. 199 IRB collateral carriers: the linked RE collateral's market
      // value rides the real-estate column (C 08.01 col 0190 reads it
      // UNCAPPED; CR7-A col d caps it per leg); the other CRM-in-LGD
      // carriers have no source on this book and seal zero.
      when(isMortgage, coalesce(col("coll_market_value"), lit(0.0)))
        .otherwise(lit(0.0)).as("collateral_re_value"),
      lit(0.0).as("collateral_financial_value"),
      lit(0.0).as("collateral_receivables_value"),
      lit(0.0).as("collateral_other_physical_value"),
      when(isEquity,
        lit(if (equityIrbMethod) "irb_simple" else "sa")).as("equity_method"),
      when(isEquity, eqType).as("equity_type"),
      col("pd_band_leaf"), col("pd_band_parent"),
      col("cr6_band_leaf"), col("cr6_band_parent"), col("pd_band_coarse"),
      col("seniority"),
      lit(0.0).as("provision_allocated"),
      lit(0.0).as("provision_deducted"),
      coalesce(col("guaranteed_portion_in"), lit(0.0)).as("guaranteed_portion"),
      col("g_protection_type").as("protection_type"),
      col("is_beneficial_g").as("is_guarantee_beneficial"),
      col("post_crm_class_g").as("post_crm_exposure_class_guaranteed"),
      col("ccr_netting_set_id"),
      lit(0.0).as("collateral_adjusted_value"),
      lit(0.0).as("collateral_market_value"),
      lit(0.0).as("fcsm_collateral_value"),
      lit(0.0).as("life_ins_collateral_value"),
      lit(0.0).as("third_party_deposit_value"))
  }
}
