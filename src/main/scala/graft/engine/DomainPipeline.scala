package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.contracts.{ColumnSpec, EdgeContract}
import graft.sources.Tables
import graft.queries.Q._

/** The composed end-to-end domain pipeline — the reference's core artifact
  * rebuilt Spark-first (reference `engine/registry.py:46-58` stage list,
  * `engine/pipeline.py:184-210` orchestration): derive domain tables →
  * conform to edge contracts → unify exposures → FX conversion → hierarchy
  * roll-ups + rating inheritance → classification → CCF/EAD → CRM waterfall
  * (collateral haircuts + guarantee substitution) → SA risk weights →
  * supporting factors → aggregation.
  *
  * Domain tables are DETERMINISTIC derivations of the harness star schema
  * (orders ≅ loans/facilities, customer ≅ counterparties, lineitem ≅
  * collateral/guarantees, nation/region ≅ country hierarchy + FX), so the
  * whole pipeline is oracle-checkable end-to-end in DuckDB.
  *
  * Every stage is a pure DataFrame → DataFrame function: q90 composes them
  * LAZILY into one Catalyst plan (the optimizer sees the whole pipeline —
  * pushdown/pruning cross stage boundaries), while `stages` wraps the same
  * functions as Orchestrator stages with persist-materialised edges for
  * the long-pipeline execution mode (reference eager stage edges,
  * `engine/materialise.py:220-243`). DomainPipelineSpec asserts both modes
  * produce identical results.
  *
  * Scale shape: one scan of orders (exposure side), one scan of lineitem
  * (CRM side); counterparty/rule joins broadcast; the only data-sized
  * shuffles are the CRM item join + per-exposure waterfall window and the
  * final summary — the plan that holds at 100 TB.
  */
object DomainPipeline {

  // ---- regime-as-data (compiled to broadcast frames + when-chains AND
  //      to the oracle's VALUES clauses, so both engines share one source
  //      of truth; reference `rulebook/packs/*`) --------------------------

  val sectorMap: Seq[(String, String)] = Seq(
    "BUILDING" -> "property", "AUTOMOBILE" -> "manufacturing",
    "MACHINERY" -> "manufacturing", "FURNITURE" -> "institution",
    "HOUSEHOLD" -> "individual")

  /** region → (currency, rate-to-base). */
  val fxTable: Seq[(String, String, Double)] = Seq(
    ("AMERICA", "USD", 1.0), ("EUROPE", "EUR", 1.08),
    ("ASIA", "JPY", 0.0125), ("AFRICA", "ZAR", 0.055),
    ("MIDDLE EAST", "AED", 0.27))

  /** exposure_type → CCF (reference `engine/ccf.py`). */
  val ccfTable: Seq[(String, Double)] = Seq(
    "loan" -> 1.0, "facility_undrawn" -> 0.75)

  /** collateral_type → supervisory haircut (reference
    * `engine/crm/haircuts.py`). */
  val haircutTable: Seq[(String, Double)] = Seq(
    "financial" -> 0.15, "gold" -> 0.20, "re_residential" -> 0.25,
    "re_commercial" -> 0.30, "other" -> 0.40)

  /** part-key mod-5 → collateral type (derivation rule for the synthetic
    * collateral book — the harness lineitem has no shipmode column). */
  val collTypeByMod: Seq[(Int, String)] = Seq(
    0 -> "financial", 1 -> "gold", 2 -> "re_residential",
    3 -> "re_commercial", 4 -> "other")

  /** (exposure_class, cqs) → SA risk weight (reference
    * `engine/sa/risk_weights.py` lookup core; unrated handled by the
    * effective-cqs fallback, not a separate chain). */
  val rwTable: Seq[(String, Int, Double)] = Seq(
    ("sovereign", 1, 0.0), ("sovereign", 2, 0.2), ("sovereign", 3, 0.5),
    ("sovereign", 4, 1.0), ("sovereign", 5, 1.0), ("sovereign", 6, 1.5),
    ("institution", 1, 0.2), ("institution", 2, 0.3), ("institution", 3, 0.5),
    ("institution", 4, 1.0), ("institution", 5, 1.0), ("institution", 6, 1.5),
    ("corporate", 1, 0.2), ("corporate", 2, 0.5), ("corporate", 3, 0.75),
    ("corporate", 4, 1.0), ("corporate", 5, 1.5), ("corporate", 6, 1.5),
    ("sme_corporate", 1, 0.2), ("sme_corporate", 2, 0.5), ("sme_corporate", 3, 0.75),
    ("sme_corporate", 4, 0.85), ("sme_corporate", 5, 1.0), ("sme_corporate", 6, 1.5),
    ("retail", 1, 0.75), ("retail", 2, 0.75), ("retail", 3, 0.75),
    ("retail", 4, 0.75), ("retail", 5, 0.75), ("retail", 6, 0.75))

  /** Candidate-regime (B3.1-style recalibration) SA risk weights — the
    * second rulepack a parallel-run comparison evaluates (reference
    * framework switch `api/service.py` CRR vs BASEL_3_1 + the per-regime
    * rule packs under `rulebook/packs`). Differs from [[rwTable]] in the institution
    * SCRA-style grades, the corporate investment grades, and the retail
    * transactor band. */
  val rwTableB31: Seq[(String, Int, Double)] = Seq(
    ("sovereign", 1, 0.0), ("sovereign", 2, 0.2), ("sovereign", 3, 0.5),
    ("sovereign", 4, 1.0), ("sovereign", 5, 1.0), ("sovereign", 6, 1.5),
    ("institution", 1, 0.2), ("institution", 2, 0.4), ("institution", 3, 0.4),
    ("institution", 4, 0.75), ("institution", 5, 1.0), ("institution", 6, 1.5),
    ("corporate", 1, 0.2), ("corporate", 2, 0.5), ("corporate", 3, 0.65),
    ("corporate", 4, 1.0), ("corporate", 5, 1.5), ("corporate", 6, 1.5),
    ("sme_corporate", 1, 0.2), ("sme_corporate", 2, 0.5), ("sme_corporate", 3, 0.75),
    ("sme_corporate", 4, 0.85), ("sme_corporate", 5, 1.0), ("sme_corporate", 6, 1.5),
    ("retail", 1, 0.45), ("retail", 2, 0.45), ("retail", 3, 0.75),
    ("retail", 4, 0.75), ("retail", 5, 0.75), ("retail", 6, 0.75))

  val sovereignCountries: Seq[String] =
    Seq("UNITED STATES", "GERMANY", "CHINA", "FRANCE", "JAPAN")

  /** Secured-by-collateral flat risk weight (simple FCCM-style treatment). */
  val collateralRw = 0.2

  // ---- edge contracts (reference `data/schemas.py:166,310,565,...`) ----

  val counterpartyEdge: EdgeContract = EdgeContract("counterparties", Seq(
    "counterparty_reference" -> ColumnSpec(StringType, required = true),
    "parent_group" -> ColumnSpec(StringType),
    "country_key" -> ColumnSpec(IntegerType),
    "sector" -> ColumnSpec(StringType),
    "country" -> ColumnSpec(StringType),
    "region_name" -> ColumnSpec(StringType),
    "turnover" -> ColumnSpec(DoubleType),
    "own_cqs" -> ColumnSpec(IntegerType)))

  val exposureEdge: EdgeContract = EdgeContract("exposures", Seq(
    "exposure_reference" -> ColumnSpec(StringType, required = true),
    "exposure_type" -> ColumnSpec(StringType, required = true),
    "counterparty_reference" -> ColumnSpec(StringType, required = true),
    "drawn" -> ColumnSpec(DoubleType),
    "undrawn" -> ColumnSpec(DoubleType),
    "maturity_years" -> ColumnSpec(DoubleType),
    "is_defaulted" -> ColumnSpec(BooleanType, default = Some(false)),
    "committed" -> ColumnSpec(BooleanType, default = Some(true))))

  /** (cqs → PD) proxy scale for the composed book's EL summary
    * (reference IRB PD bands; shared by q100's Spark and oracle sides). */
  val cqsPdTable: Seq[(Int, Double)] = Seq(
    1 -> 0.0003, 2 -> 0.001, 3 -> 0.005, 4 -> 0.02, 5 -> 0.08, 6 -> 0.25)

  /** Downturn LGD for the composed book's EL proxy (senior unsecured). */
  val elLgd = 0.45

  val provisionEdge: EdgeContract = EdgeContract("provisions", Seq(
    "provision_reference" -> ColumnSpec(StringType, required = true),
    "beneficiary_type" -> ColumnSpec(StringType, required = true),
    "beneficiary_reference" -> ColumnSpec(StringType, required = true),
    "amount" -> ColumnSpec(DoubleType)))

  val collateralEdge: EdgeContract = EdgeContract("collateral", Seq(
    "collateral_reference" -> ColumnSpec(StringType, required = true),
    "exposure_reference" -> ColumnSpec(StringType, required = true),
    "collateral_type" -> ColumnSpec(StringType),
    "market_value" -> ColumnSpec(DoubleType)))

  val guaranteeEdge: EdgeContract = EdgeContract("guarantees", Seq(
    "guarantee_reference" -> ColumnSpec(StringType, required = true),
    "exposure_reference" -> ColumnSpec(StringType, required = true),
    "guarantor_cqs" -> ColumnSpec(IntegerType),
    "coverage_pct" -> ColumnSpec(DoubleType)))

  // ---- stage 1: derive + conform domain tables -------------------------

  /** Multi-rating book (reference RATINGS_SCHEMA `data/schemas.py:929`):
    * each non-negative-balance customer carries 1-3 agency assessments,
    * cqs varying by agency — the input the best-rating pick resolves.
    * Negative-balance customers are unrated (no rows). */
  def ratings(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_acctbal") >= 0)
      .select(col("c_custkey"),
        explode(sequence(lit(0), col("c_custkey") % 3)).as("rating_agency"))
      .select(
        concat(lit("CP-"), col("c_custkey").cast("string")).as("counterparty_reference"),
        col("rating_agency").cast("int").as("rating_agency"),
        ((col("c_custkey") + col("rating_agency") * 7) % 6 + 1).cast("int").as("cqs"))

  /** Counterparties: customer ⋈ nation ⋈ region; parent group = nation
    * (org_mappings analogue). `own_cqs` comes from the multi-rating
    * book via the rank-1 best-rating pick (reference
    * `stages/hierarchy/ratings.py:106-127`: lowest cqs wins,
    * deterministic agency tie-break) — the inheritance join runs INSIDE
    * the composed pipeline, not just as the isolated q22 demo. The pick
    * windows on the counterparty key and the join back shares that same
    * key, so the two exchanges co-partition; unrated counterparties get
    * null and fall through to the group-best inheritance in
    * [[hierarchy]]. */
  def counterparties(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    val sectorChain = sectorMap.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (None, (seg, sec)) => Some(when(col("c_mktsegment") === seg, sec))
      case (Some(acc), (seg, sec)) => Some(acc.when(col("c_mktsegment") === seg, sec))
    }.get.otherwise("corporate")
    val wRating = Window.partitionBy(col("counterparty_reference"))
      .orderBy(col("cqs"), col("rating_agency"))
    val best = ratings(s, dir)
      .withColumn("rn", row_number().over(wRating))
      .filter(col("rn") === 1)
      .select(col("counterparty_reference"), col("cqs").as("own_cqs"))
    val df = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(
        concat(lit("CP-"), col("c_custkey").cast("string")).as("counterparty_reference"),
        concat(lit("GRP-"), col("n_nationkey").cast("string")).as("parent_group"),
        col("n_nationkey").cast("int").as("country_key"),
        sectorChain.as("sector"),
        col("n_name").as("country"),
        col("r_name").as("region_name"),
        (col("c_acctbal") * lit(10000.0)).as("turnover"))
      .join(best, Seq("counterparty_reference"), "left")
    counterpartyEdge.conform(df)
  }

  /** Unify (reference `stages/hierarchy/unify.py:56-115`): loans from all
    * orders plus synthetic undrawn-facility rows for open orders — the
    * schema-aligning union that gives one exposures frame. */
  def exposuresUnified(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val loans = o.select(
      concat(lit("ORD-"), col("o_orderkey").cast("string")).as("exposure_reference"),
      lit("loan").as("exposure_type"),
      concat(lit("CP-"), col("o_custkey").cast("string")).as("counterparty_reference"),
      col("o_totalprice").as("drawn"),
      lit(0.0).as("undrawn"),
      (lit(1.0) + (col("o_orderkey") % 5).cast("double")).as("maturity_years"),
      (col("o_orderkey") % 41 === 0).as("is_defaulted"))
    val facilities = o.filter(col("o_orderstatus") === "O").select(
      concat(lit("FAC-"), col("o_orderkey").cast("string")).as("exposure_reference"),
      lit("facility_undrawn").as("exposure_type"),
      concat(lit("CP-"), col("o_custkey").cast("string")).as("counterparty_reference"),
      lit(0.0).as("drawn"),
      (col("o_totalprice") * lit(0.25)).as("undrawn"),
      (lit(1.0) + (col("o_orderkey") % 5).cast("double")).as("maturity_years"),
      (col("o_orderkey") % 41 === 0).as("is_defaulted"))
    exposureEdge.conform(loans.unionByName(facilities))
  }

  /** Collateral book: returned lineitems, typed off the part key. */
  def collateral(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val typeChain = collTypeByMod.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (None, (m, t)) => Some(when(col("l_partkey") % 5 === m, t))
      case (Some(acc), (m, t)) => Some(acc.when(col("l_partkey") % 5 === m, t))
    }.get.otherwise("other")
    val df = li.filter(col("l_returnflag") === "R").select(
      concat(lit("COLL-"), col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("collateral_reference"),
      concat(lit("ORD-"), col("l_orderkey").cast("string")).as("exposure_reference"),
      typeChain.as("collateral_type"),
      (col("l_extendedprice") * lit(0.5)).as("market_value"))
    collateralEdge.conform(df)
  }

  /** Provision book (reference PROVISION_SCHEMA `data/schemas.py:916`):
    * specific credit-risk adjustments at two beneficiary levels, derived
    * deterministically from the star schema so the whole chain stays
    * oracle-checkable:
    *  - direct (loan-level): lineitems flagged 'A' — a provision against
    *    that line's order exposure, 10% of the line value;
    *  - counterparty-level: customers with a negative account balance —
    *    a blanket provision to be allocated pro-rata across the
    *    counterparty's exposures (reference `engine/crm/provisions.py`
    *    multi-level allocation).
    * Amounts are q2-quantised at the row so decimal sums are exact in
    * both engines. */
  def provisions(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val c = Tables.customer(s, dir)
    val direct = li.filter(col("l_returnflag") === "A").select(
      concat(lit("PROV-"), col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("provision_reference"),
      lit("direct").as("beneficiary_type"),
      concat(lit("ORD-"), col("l_orderkey").cast("string")).as("beneficiary_reference"),
      q2(col("l_extendedprice") * lit(0.10)).as("amount"))
    val cpLevel = c.filter(col("c_acctbal") < 0).select(
      concat(lit("PROVCP-"), col("c_custkey").cast("string")).as("provision_reference"),
      lit("counterparty").as("beneficiary_type"),
      concat(lit("CP-"), col("c_custkey").cast("string")).as("beneficiary_reference"),
      q2(-col("c_acctbal") * lit(50.0)).as("amount"))
    provisionEdge.conform(direct.unionByName(cpLevel))
  }

  /** Guarantee book: first lineitem of discounted orders; guarantor rated
    * 1-4 off the supplier key. */
  def guarantees(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val df = li.filter(col("l_linenumber") === 1 && col("l_discount") >= 0.05)
      .select(
        concat(lit("G-"), col("l_orderkey").cast("string")).as("guarantee_reference"),
        concat(lit("ORD-"), col("l_orderkey").cast("string")).as("exposure_reference"),
        (lit(1) + col("l_suppkey") % 4).cast("int").as("guarantor_cqs"),
        when(col("l_tax") > 0.04, 0.75).otherwise(0.5).as("coverage_pct"))
    guaranteeEdge.conform(df)
  }

  // ---- stage 2: enrich + FX -------------------------------------------

  /** Counterparty-attribute join + FX conversion to base currency
    * (reference FX stage; `queries/Joins.scala:22` broadcast pattern). */
  def enrichFx(exposures: DataFrame, cptys: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    val fx = broadcast(fxTable.toDF("region_name", "currency", "fx_rate"))
    exposures
      .join(broadcast(cptys), Seq("counterparty_reference"), "left")
      .join(fx, Seq("region_name"), "left")
      // one projection per independent batch: every withColumn call runs
      // a FULL analyzer pass over the accumulated plan, and the ledger
      // chain is deep enough that per-column calls dominate the cold
      // driver cost (measured ~12 s of pure analysis at sf0.1)
      .withColumns(Map(
        "drawn_base" -> q2(col("drawn") * col("fx_rate")),
        "undrawn_base" -> q2(col("undrawn") * col("fx_rate"))))
  }

  // ---- stage 3: hierarchy roll-ups + rating inheritance ----------------

  /** Lending-group totals via window (never a self-join) + best-rating
    * inheritance for unrated counterparties (reference
    * `stages/hierarchy/graph.py` + rating inheritance rank-pick). */
  def hierarchy(enriched: DataFrame): DataFrame = {
    val wGroup = Window.partitionBy(col("parent_group"))
    enriched
      .withColumns(Map(
        "group_drawn" -> dsumOver(col("drawn_base"), 2, wGroup),
        "group_best_cqs" -> min(col("own_cqs")).over(wGroup)))
      .withColumn("effective_cqs",
        coalesce(col("own_cqs"), col("group_best_cqs"), lit(4)))
  }

  // ---- stage 4: classification ----------------------------------------

  /** Model-permission grants as an input table (reference permission
    * mode "irb", `api/service.py:47-53`: each row grants IRB approval for
    * a model_id + exposure_class scoped by geography; exposures without a
    * matching grant fall back to SA). Derived deterministically from the
    * star schema: even country keys hold IRB permission for corporate and
    * institution books — one grant row per (class, country). */
  def modelPermissions(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .filter(col("n_nationkey") % 2 === 0)
      .select(col("n_name").as("perm_country"),
        explode(array(lit("corporate"), lit("institution"))).as("perm_class"))
      .withColumn("model_id",
        concat(lit("IRB-"), upper(substring(col("perm_class"), 1, 4)), lit("-1")))

  /** Exposure-class cascade + approach routing (reference
    * `stages/classify` attribute cascade + the model-permission join:
    * grants are a small dimension → broadcast; unmatched rows take the SA
    * fallback). `irbMode = false` is the reference's "standardised"
    * permission mode — every exposure routes SA and grants are ignored. */
  def classify(h: DataFrame, grants: DataFrame, irbMode: Boolean = true): DataFrame = {
    val classed = h.withColumn("exposure_class",
      when(col("country").isin(sovereignCountries: _*) &&
           col("effective_cqs") <= 2, "sovereign")
        .when(col("sector") === "individual" && col("drawn_base") < 100000, "retail")
        .when(col("sector") === "institution", "institution")
        .when(col("turnover") < 50000000.0, "sme_corporate")
        .otherwise("corporate"))
    classed
      .join(broadcast(grants),
        col("exposure_class") === col("perm_class") &&
          col("country") === col("perm_country"), "left")
      .withColumn("approach",
        when(lit(irbMode) && col("model_id").isNotNull, "IRB").otherwise("SA"))
      .drop("perm_class", "perm_country", "model_id")
  }

  // ---- stage 5: provisions + CCF / EAD --------------------------------

  /** Provision resolution + CCF/EAD (reference `engine/crm/provisions.py`
    * resolve_provisions → CCF → EAD initialisation; CRR Art. 110-111):
    *
    *  - direct provisions join 1:1 on the exposure key;
    *  - counterparty-level provisions allocate pro-rata by the gross-EAD
    *    weight via a window over the counterparty key (the reference's
    *    `allocate_multi_level` kernel; never a self-join);
    *  - SA takes the drawn-first deduction (Art. 111(2)): provisions net
    *    against drawn, the remainder against the undrawn nominal BEFORE
    *    the CCF, so `ead_pre_crm = max(0, drawn − prov_drawn) +
    *    (nominal − prov_nominal) · CCF`;
    *  - IRB deducts nothing (provisions feed the EL shortfall/excess
    *    comparison instead — q100); `provision_allocated` is tracked.
    *
    * Scale shape: the provision books aggregate to beneficiary grain
    * BEFORE joining (one small shuffle each), the direct join shares the
    * exposure key, and the pro-rata window shuffles on the counterparty
    * key once. */
  def eadCalc(c: DataFrame, prov: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    val ccf = broadcast(ccfTable.toDF("ccf_type", "ccf"))
    val provDirect = prov.filter(col("beneficiary_type") === "direct")
      .groupBy(col("beneficiary_reference").as("pd_ref"))
      .agg(dsum(col("amount"), 2).as("prov_direct"))
    val provCp = prov.filter(col("beneficiary_type") === "counterparty")
      .groupBy(col("beneficiary_reference").as("pc_ref"))
      .agg(dsum(col("amount"), 2).as("prov_cp"))
    val wCp = Window.partitionBy(col("counterparty_reference"))
    val isSa = col("approach") === "SA"
    // dependent columns are INLINED as expression values so the whole
    // fill lands in two projections (one analyzer pass each) instead of
    // eight; the inlined trees are value-identical to the column
    // references they replace, and whole-stage codegen's subexpression
    // elimination collapses the duplicates at execution
    val provAlloc =
      q2(coalesce(col("prov_direct"), lit(0.0)) +
        when(col("cp_basis") > 0,
          q2(coalesce(col("prov_cp"), lit(0.0)) * col("ead_gross") / col("cp_basis")))
          .otherwise(0.0))
    val provOnDrawn =
      when(isSa, least(provAlloc, greatest(col("drawn_base"), lit(0.0))))
        .otherwise(0.0)
    val provOnNominal =
      when(isSa, least(
        greatest(provAlloc - provOnDrawn, lit(0.0)),
        col("undrawn_base"))).otherwise(0.0)
    c.join(ccf, col("exposure_type") === col("ccf_type"), "left")
      .withColumns(Map(
        "ccf_eff" -> coalesce(col("ccf"), lit(1.0)),
        "ead_gross" ->
          q2(col("drawn_base") + col("undrawn_base") * coalesce(col("ccf"), lit(1.0)))))
      .join(provDirect, col("exposure_reference") === col("pd_ref"), "left")
      .join(provCp, col("counterparty_reference") === col("pc_ref"), "left")
      .drop("pd_ref", "pc_ref")
      .withColumn("cp_basis", dsumOver(col("ead_gross"), 2, wCp))
      .withColumns(Map(
        "provision_allocated" -> provAlloc,
        "provision_on_drawn" -> provOnDrawn,
        "provision_on_nominal" -> provOnNominal,
        "provision_deducted" -> q2(provOnDrawn + provOnNominal),
        "ead_pre_crm" ->
          q2(greatest(col("drawn_base") - provOnDrawn, lit(0.0)) +
            (col("undrawn_base") - provOnNominal) * col("ccf_eff"))))
      .drop("prov_direct", "prov_cp", "cp_basis")
  }

  /** Own SA risk weight: (class, cqs) decision table, broadcast. The
    * defaulted book takes the CRR Art. 127 override in BOTH regimes:
    * 100% when specific provisions reach 20% of the gross exposure value
    * (the pre-deduction basis — the provision test is on the
    * pre-adjustment value), else 150%. */
  def ownRiskWeight(e: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    val rw = broadcast(rwTable.toDF("rw_class", "rw_cqs", "rw"))
    val rwB31 = broadcast(rwTableB31.toDF("b31_class", "b31_cqs", "rw_b31x"))
    val defaultedRw =
      when(col("provision_allocated") >= col("ead_gross") * 0.2, 1.0).otherwise(1.5)
    val isDefaultedSa = col("is_defaulted") && col("approach") === "SA"
    e.join(rw,
        col("exposure_class") === col("rw_class") &&
        col("effective_cqs") === col("rw_cqs"), "left")
      .withColumn("own_rw",
        when(isDefaultedSa, defaultedRw).otherwise(coalesce(col("rw"), lit(1.0))))
      .drop("rw_class", "rw_cqs", "rw")
      // shadow regime: the candidate rule-set's weight resolved in the
      // SAME scan (the reference runs the pipeline once per framework and
      // compares materialised runs — at scale, one pass computing both
      // regimes dominates two full runs)
      .join(rwB31,
        col("exposure_class") === col("b31_class") &&
        col("effective_cqs") === col("b31_cqs"), "left")
      .withColumn("own_rw_b31",
        when(isDefaultedSa, defaultedRw).otherwise(coalesce(col("rw_b31x"), lit(1.0))))
      .drop("b31_class", "b31_cqs", "rw_b31x")
  }

  // ---- stage 6: CRM waterfall -----------------------------------------

  /** Guarantor risk weight = the institution row of the rw table, compiled
    * to a when-chain off guarantor_cqs. */
  private def guarantorRwChain(cqs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    rwTable.filter(_._1 == "institution")
      .foldLeft(Option.empty[org.apache.spark.sql.Column]) {
        case (None, (_, q, w)) => Some(when(cqs === q, w))
        case (Some(acc), (_, q, w)) => Some(acc.when(cqs === q, w))
      }.get.otherwise(1.0)

  /** The composed CRM kernel (reference `engine/crm/processor.py:228-443`,
    * `engine/kernels/allocation.py`, `crm/guarantees.py:1419-1480`):
    * collateral and guarantees become one prioritised item list per
    * exposure (collateral first), allocated greedily against EAD with an
    * ordered cumulative-sum window — never exceeding EAD — then collapsed
    * back to exposure grain with covered/uncovered conservation.
    */
  def crmWaterfall(
      withRw0: DataFrame, coll: DataFrame, guar: DataFrame,
      s: SparkSession): DataFrame = {
    import s.implicits._
    // This frame is consumed THREE times in one plan: the exposure spine
    // plus the collateral-item and guarantee-item EAD lookups. Catalyst
    // does not CSE across join branches, so without materialisation the
    // entire upstream chain (scan → enrich → rating/group/provision
    // windows → rule joins) executes three times per ledger action. The
    // persist is the reference's materialised stage edge
    // (`engine/materialise.py:220-243`) re-expressed — MEMORY_AND_DISK so
    // a 100 TB book spills instead of recomputing; session-managed (the
    // bench clears cache between queries). Measured at sf0.1: q94
    // 6.0s → ~2.5s, q106 6.1s → ~2s.
    val withRw = withRw0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pendingEdges.get += withRw
    val haircuts = broadcast(haircutTable.toDF("hc_type", "haircut"))
    val exposureSide = withRw.select(
      col("exposure_reference"), col("fx_rate"), col("ead_pre_crm"))
    // One unified item book, ONE join to the exposure side. A union of
    // separately-joined collateral and guarantee frames would scan each
    // book's source once AND shuffle-join the exposure side twice; the
    // diagonal union (null-padded type-specific columns) halves both —
    // the item join is the data-sized shuffle of this stage at 100 TB.
    val rawItems = coll.select(
        col("exposure_reference"),
        lit(1).as("priority"),
        col("collateral_reference").as("item_ref"),
        col("collateral_type"),
        col("market_value"),
        lit(null).cast("int").as("guarantor_cqs"),
        lit(null).cast("double").as("coverage_pct"))
      .unionByName(guar.select(
        col("exposure_reference"),
        lit(2).as("priority"),
        col("guarantee_reference").as("item_ref"),
        lit(null).cast("string").as("collateral_type"),
        lit(null).cast("double").as("market_value"),
        col("guarantor_cqs"),
        col("coverage_pct")))
    val items = rawItems
      .join(haircuts, col("collateral_type") === col("hc_type"), "left")
      .join(exposureSide, Seq("exposure_reference"))
      .select(
        col("exposure_reference"),
        col("priority"),
        col("item_ref"),
        col("collateral_type"),
        when(col("priority") === 1,
          q2(col("market_value") * col("fx_rate") *
            (lit(1.0) - coalesce(col("haircut"), lit(0.40)))))
          .otherwise(q2(col("coverage_pct") * col("ead_pre_crm"))).as("amount"),
        when(col("priority") === 2, guarantorRwChain(col("guarantor_cqs")))
          .cast("double").as("guarantor_rw"),
        col("ead_pre_crm"))
    // TOTAL order: the synthetic books can carry duplicate item
    // references (the harness lineitem table repeats (orderkey,
    // linenumber) pairs), and a greedy cutoff landing on a tie would
    // allocate engine-dependently — invisible in the covered TOTAL
    // (tie-invariant) but visible in the per-type split. Tie-break by
    // every column that affects downstream attribution; the null
    // columns are constant within each priority class, so engine
    // null-ordering defaults never engage.
    val wWf = Window.partitionBy(col("exposure_reference"))
      .orderBy(col("priority"), col("item_ref"), col("collateral_type"),
        col("amount"), col("guarantor_rw"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one projection: the inlined window expressions are canonically
    // identical, so ExtractWindowExpressions computes the cumsum once
    val cum = dsumOver(col("amount"), 2, wWf)
    val alloc = items
      .withColumns(Map(
        "cum" -> cum,
        "allocated" -> q2(greatest(lit(0.0),
          least(col("amount"), col("ead_pre_crm") - (cum - col("amount")))))))
    // Per-type collateral tracking (reference ledger columns for COREP
    // C 08.01 cols 0170-0210, `data/schemas.py:2966-2971`): the same
    // allocated legs split by collateral family — an exact partition of
    // coll_covered, proven by q94's v_colltype rules.
    val isColl = col("priority") === 1
    val perExposure = alloc.groupBy(col("exposure_reference")).agg(
      dsum(when(isColl, col("allocated")).otherwise(0.0), 2)
        .as("coll_covered"),
      dsum(when(isColl && col("collateral_type").isin("financial", "gold"),
        col("allocated")).otherwise(0.0), 2).as("collateral_financial_value"),
      dsum(when(isColl && col("collateral_type").isin("re_residential", "re_commercial"),
        col("allocated")).otherwise(0.0), 2).as("collateral_re_value"),
      dsum(when(isColl && col("collateral_type") === "other",
        col("allocated")).otherwise(0.0), 2).as("collateral_other_value"),
      dsum(when(col("priority") === 2, col("allocated")).otherwise(0.0), 2)
        .as("guar_covered"),
      max(col("guarantor_rw")).as("guarantor_rw"))
    withRw.join(perExposure, Seq("exposure_reference"), "left")
      .withColumns(Map(
        "coll_covered" -> coalesce(col("coll_covered"), lit(0.0)),
        "collateral_financial_value" ->
          coalesce(col("collateral_financial_value"), lit(0.0)),
        "collateral_re_value" -> coalesce(col("collateral_re_value"), lit(0.0)),
        "collateral_other_value" ->
          coalesce(col("collateral_other_value"), lit(0.0)),
        "guar_covered" -> coalesce(col("guar_covered"), lit(0.0)),
        "unsecured" -> greatest(lit(0.0),
          q2(col("ead_pre_crm") - coalesce(col("coll_covered"), lit(0.0)) -
            coalesce(col("guar_covered"), lit(0.0))))))
  }

  // ---- stage 7: RWA + supporting factor --------------------------------

  /** RWA per exposure: secured portion at the flat collateral weight,
    * guaranteed portion at min(own, guarantor) (substitution only when
    * beneficial — reference `crm/guarantees.py`), remainder at own weight;
    * then the SME supporting factor off lending-group drawn (CRR Art. 501
    * banding, reference `engine/supporting_factors.py:456-560`). */
  def rwaCalc(ledger: DataFrame): DataFrame = {
    ledger
      .withColumns(Map(
        "rwa_pre_sf" -> (
          q2(col("coll_covered") * lit(collateralRw)) +
          q2(col("guar_covered") *
            least(col("own_rw"), coalesce(col("guarantor_rw"), col("own_rw")))) +
          q2(col("unsecured") * col("own_rw"))),
        // candidate-regime shadow: identical formula over the B3.1
        // weight, evaluated in the same projection (no second run)
        "rwa_pre_sf_b31" -> (
          q2(col("coll_covered") * lit(collateralRw)) +
          q2(col("guar_covered") *
            least(col("own_rw_b31"), coalesce(col("guarantor_rw"), col("own_rw_b31")))) +
          q2(col("unsecured") * col("own_rw_b31"))),
        "sf_factor" ->
          when(col("exposure_class") === "sme_corporate",
            when(col("group_drawn") <= 1500000, 0.7619)
              .when(col("group_drawn") <= 3000000, 0.85)
              .otherwise(1.0))
            .otherwise(1.0)))
      .withColumns(Map(
        "rwa" -> q2(col("rwa_pre_sf") * col("sf_factor")),
        "rwa_b31" -> q2(col("rwa_pre_sf_b31") * col("sf_factor"))))
  }

  // ---- stage 8: audit / lineage columns --------------------------------

  /** Audit-ledger breadth (reference ledger schema
    * `data/schemas.py:2877-3121`: `facility_hierarchy_path`,
    * `exposure_class_reason`, `approach_selection_reason`, `ccf_source`,
    * `calculation_warnings`): the columns that make the per-exposure
    * ledger AUDITABLE — every derived decision carries its reason, and
    * data-quality caveats accumulate into one warnings string
    * (`concat_ws` skips the null branches in both engines, so the
    * composite is deterministic with no array carrier). Pure projection —
    * zero new shuffles at any scale. */
  def auditColumns(led: DataFrame): DataFrame = led
    .withColumns(Map(
      "hierarchy_path" ->
        concat_ws("/", col("parent_group"), col("counterparty_reference"),
          col("exposure_reference")),
      "exposure_class_reason" ->
        when(col("exposure_class") === "sovereign", "sovereign_country_cqs_le_2")
          .when(col("exposure_class") === "retail", "individual_below_size_threshold")
          .when(col("exposure_class") === "institution", "sector_institution")
          .when(col("exposure_class") === "sme_corporate", "turnover_below_sme_threshold")
          .otherwise("corporate_default"),
      "approach_selection_reason" ->
        when(col("approach") === "IRB", "irb_permission_grant")
          .otherwise("sa_fallback"),
      "ccf_source" ->
        when(col("exposure_type") === "facility_undrawn", "art_111_75pct_commitment")
          .otherwise("art_111_full_risk"),
      "calculation_warnings" ->
        concat_ws(";",
          when(col("own_cqs").isNull, "UNRATED_CPTY"),
          when(col("own_cqs").isNull && col("group_best_cqs").isNotNull,
            "RATING_INHERITED_FROM_GROUP"),
          when(col("fx_rate").isNull, "FX_RATE_MISSING"),
          when(col("is_defaulted"), "DEFAULTED_EXPOSURE"),
          when(col("provision_allocated") > col("ead_gross"),
            "PROVISION_EXCEEDS_EXPOSURE"),
          when(col("coll_covered") + col("guar_covered") >= col("ead_pre_crm"),
            "FULLY_COVERED"))))

  // ---- composition -----------------------------------------------------

  /** Session-scoped memo of the sealed ledger edge, keyed by
    * (session, data dir, permission regime). The reference materialises
    * each stage edge at most once per run (`engine/materialise.py:220-243`,
    * one-materialisation-per-edge); without the memo every ledger consumer
    * (q85/q86/q90/q93/q94/q100/q102/q106) re-built an identical plan whose
    * persist entries did not unify, re-paying the full CRM fill per query
    * (~1.4 s × 8 at sf0.1). Returning the SAME DataFrame object guarantees
    * cache-hit by identity rather than relying on canonical-plan matching. */
  private val ledgerMemo = scala.collection.concurrent.TrieMap[
    (SparkSession, String, Boolean), (DataFrame, DataFrame, Seq[DataFrame])]()

  /** Stage edges persisted during the in-flight ledger build (crmWaterfall
    * registers its CRM edge here; `ledger` drains the buffer into the memo
    * entry so `releaseLedger` can unpersist the WHOLE edge set).
    * THREAD-LOCAL: a crmWaterfall invoked outside `ledger` (stage mode,
    * specs) on another thread must never leak its edge into a build that
    * happens to be in flight — each thread drains only what it itself
    * registered. */
  private val pendingEdges =
    ThreadLocal.withInitial[scala.collection.mutable.ArrayBuffer[DataFrame]](
      () => new scala.collection.mutable.ArrayBuffer[DataFrame])

  /** The full per-exposure audit ledger (wide frame), one lazy plan,
    * memoised + persisted per (session, dir, regime).
    * `irbMode = false` runs the reference's "standardised" permission
    * mode (all exposures route SA). If an external cache sweep (e.g. the
    * bench's between-query `clearCache`) evicted the data, the memo
    * entry is DROPPED and a fresh plan is built and persisted — never
    * re-persist a stale, already-executed frame: its frozen
    * QueryExecution still references the evicted InMemoryRelation, and
    * downstream consumers then re-execute the whole unpersisted chain
    * per join branch (measured: q86 6.5 s → 12 s round-over-round). */
  def ledger(s: SparkSession, dir: String, irbMode: Boolean = true): DataFrame = {
    val key = (s, dir, irbMode)
    def live: Option[DataFrame] = ledgerMemo.get(key)
      .filter(_._1.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      .map(_._2)
    // Check-then-act must be atomic and edge registration must be
    // attributable to exactly one build: the REST server executes
    // requests on a thread pool, so two concurrent consumers of the same
    // (or a different) key would otherwise interleave — one build's CRM
    // stage edge cleared by, or drained into, the other's memo entry,
    // leaving releaseLedger to unpersist a live run's edge or leak the
    // loser's. Builds are plan construction only (no Spark action:
    // persist() is lazy), so serialising them is microseconds — the lock
    // is never held across an executor round-trip.
    buildLock.synchronized {
      live.getOrElse {
        pendingEdges.get.clear()
        val df = buildLedger(s, dir, irbMode)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // RE-ROOT before handing out: consumers receive a LogicalRDD leaf
        // over the persisted plan's compiled RDD, not the ~300-node ledger
        // subtree itself. Persisting dedups EXECUTION but not PLAN size —
        // every consumer branch (q86's 4-way diamond, 20+ reporting
        // sheets) re-analyzes and re-canonicalises the full subtree per
        // action, which is pure single-threaded driver work that grows
        // with ledger width × consumer count (the q75 disease, same cure:
        // `Dedup.reroot`). Measured: q86 9.5 s → ~1 s at sf0.1. `df.rdd`
        // is lazy (no job) but plans through the CacheManager, so the
        // RDD scans the InMemoryRelation and all consumers share the
        // cached blocks. The PERSISTED handle (not the rooted leaf, whose
        // storageLevel is always NONE) stays in the memo for the
        // liveness check and releaseLedger.
        val rooted = s.createDataFrame(df.rdd, df.schema)
        val edges = pendingEdges.get.toList
        pendingEdges.get.clear()
        ledgerMemo.put(key, (df, rooted, edges))
        rooted
      }
    }
  }

  /** Serialises ledger builds: guards the memo check-then-act AND scopes
    * `pendingEdges` to the single in-flight build. */
  private val buildLock = new Object

  /** Test hook: the PERSISTED (un-rooted) ledger handle, if memoised —
    * the frame whose QueryExecution carries the real build plan (broadcast
    * joins, the materialised CRM edge) and whose storageLevel reflects
    * cache liveness. Consumers never see this frame; specs asserting
    * plan-shape promises inspect it here. */
  private[graft] def persistedHandle(
      s: SparkSession, dir: String, irbMode: Boolean = true): Option[DataFrame] =
    ledgerMemo.get((s, dir, irbMode)).map(_._1)

  /** Release one memoised ledger edge: drop the memo entry and unpersist
    * the ledger AND the stage edges its build persisted (the CRM
    * waterfall's materialised input). Long-lived callers (the REST run
    * store) call this on eviction so the Spark cache does not grow
    * without bound; `unpersist` on an already-evicted frame is a no-op. */
  def releaseLedger(s: SparkSession, dir: String, irbMode: Boolean = true): Unit =
    ledgerMemo.remove((s, dir, irbMode)).foreach { case (df, _, edges) =>
      df.unpersist(false)
      edges.foreach(_.unpersist(false))
    }

  /** Probe hook: the un-memoised composed plan (no persist, no re-root). */
  private[graft] def rawLedgerPlan(
      s: SparkSession, dir: String, irbMode: Boolean = true): DataFrame =
    buildLedger(s, dir, irbMode)

  /** The un-memoised ledger plan (the composition itself). */
  private def buildLedger(s: SparkSession, dir: String, irbMode: Boolean): DataFrame = {
    val trace = sys.env.get("PROBE_BUILD").contains("1")
    def t[A](tag: String)(f: => A): A =
      if (!trace) f else {
        val t0 = System.nanoTime(); val r = f
        println(f"[build-probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
    val exp = t("exposuresUnified")(exposuresUnified(s, dir))
    val cpty = t("counterparties")(counterparties(s, dir))
    val enriched = t("enrichFx")(enrichFx(exp, cpty, s))
    val h = t("hierarchy")(hierarchy(enriched))
    val cls = t("classify")(classify(h, modelPermissions(s, dir), irbMode))
    val ead = t("eadCalc")(eadCalc(cls, provisions(s, dir), s))
    val withRw = t("ownRiskWeight")(ownRiskWeight(ead, s))
    val crm = t("crmWaterfall")(crmWaterfall(withRw, collateral(s, dir), guarantees(s, dir), s))
    t("rwaCalc+audit")(auditColumns(rwaCalc(crm)))
  }

  /** The (class, approach) roll-up of a ledger frame — shared by the lazy
    * and staged execution modes so both emit the identical summary. */
  private def summarise(led: DataFrame): DataFrame = {
    val perClass = led.groupBy(col("exposure_class"), col("approach")).agg(
      count(lit(1)).as("n_exposures"),
      dsum(col("ead_pre_crm"), 2).as("total_ead"),
      dsum(col("coll_covered"), 2).as("collateral_covered"),
      dsum(col("guar_covered"), 2).as("guarantee_covered"),
      dsum(col("unsecured"), 2).as("unsecured_ead"),
      dsum(col("provision_deducted"), 2).as("provisions_deducted"),
      dsum(col("rwa"), 2).as("total_rwa"))
    val totals = led.agg(dsum(col("rwa"), 2).as("portfolio_rwa"))
    perClass.crossJoin(broadcast(totals))
      .select(
        col("exposure_class"), col("approach"), col("n_exposures"),
        col("total_ead"), col("collateral_covered"), col("guarantee_covered"),
        col("unsecured_ead"), col("provisions_deducted"), col("total_rwa"),
        q6(col("total_rwa") / col("portfolio_rwa")).as("rwa_share"))
      .orderBy(col("exposure_class"), col("approach"))
  }

  /** The (class, approach) summary with portfolio shares — q90's output. */
  def summary(s: SparkSession, dir: String, irbMode: Boolean = true): DataFrame =
    summarise(ledger(s, dir, irbMode))

  /** The same pipeline as Orchestrator stages with materialised edges —
    * execution-mode parity is asserted by DomainPipelineSpec. */
  def stages(s: SparkSession, dir: String): (Seq[Stage], ArtifactKey[DataFrame]) = {
    val kEnriched = ArtifactKey[DataFrame]("enriched")
    val kClassified = ArtifactKey[DataFrame]("classified")
    val kLedger = ArtifactKey[DataFrame]("ledger")
    val kSummary = ArtifactKey[DataFrame]("summary")
    val sts = Seq(
      new Stage {
        def name = "load_enrich"
        def run(ctx: PipelineContext) = ctx.put(kEnriched,
          enrichFx(exposuresUnified(s, dir), counterparties(s, dir), s))
        override def edgeFrames = Seq(kEnriched)
      },
      new Stage {
        def name = "hierarchy_classify"
        def run(ctx: PipelineContext) =
          ctx.put(kClassified,
            classify(hierarchy(ctx.get(kEnriched)), modelPermissions(s, dir)))
        override def edgeFrames = Seq(kClassified)
      },
      new Stage {
        def name = "calc_crm_rwa"
        def run(ctx: PipelineContext) = {
          val withRw = ownRiskWeight(eadCalc(ctx.get(kClassified), provisions(s, dir), s), s)
          ctx.put(kLedger,
            auditColumns(rwaCalc(
              crmWaterfall(withRw, collateral(s, dir), guarantees(s, dir), s))))
        }
        override def edgeFrames = Seq(kLedger)
      },
      new Stage {
        def name = "aggregate"
        def run(ctx: PipelineContext) =
          ctx.put(kSummary, summarise(ctx.get(kLedger)))
      })
    (sts, kSummary)
  }
}
