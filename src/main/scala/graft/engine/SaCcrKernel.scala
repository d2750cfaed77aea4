package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SA-CCR kernel: the Art. 274-285 counterparty-credit-risk chain as pure
  * Spark columns + two netting-set-grain aggregations.
  *
  * Re-expresses the reference's SA-CCR engine
  * (reference `engine/ccr/adjusted_notional.py`, `supervisory_delta.py`,
  * `maturity_factor.py:69-228`, `pfe.py:148-612`, `rc.py`) Spark-first:
  *
  *  - every per-trade quantity (supervisory duration, delta, maturity
  *    factor, adjusted notional) is a codegen'd `Column` expression in the
  *    scan projection — no UDFs, no lookup joins for the supervisory
  *    parameter tables (when-chains compile into the same codegen stage);
  *  - the add-on roll-up is ONE shuffle on the finest hedging grain
  *    `(netting_set, asset_class, sub-keys)` followed by class-specific
  *    rollups that all derive from the same aggregated subtree (the five
  *    class branches share the base exchange via ReuseExchange), then a
  *    final tiny netting-set-grain aggregate — candidates for skew don't
  *    exist (netting sets are the natural partition key at any scale);
  *  - the EAD composition (RC, PFE multiplier, alpha) is netting-set
  *    grain: pure columns over an already-small frame.
  *
  * Supervisory constants are CRR Art. 280/280a-d Table 1/2 values
  * (reference `rulebook/packs/common.py:255-394`). Time conventions are
  * the reference's exactly: calendar-day/365.25 year fractions for the
  * supervisory duration and IR buckets, business-day/250 for maturity
  * factors, calendar-day/365 for the option delta's T.
  */
object SaCcrKernel {

  // ---- supervisory parameter tables (CRR Art. 280 Table 1/2) ----------
  val Alpha = 1.4
  val SfIr = 0.005
  val SfFx = 0.04
  val SfEquitySn = 0.32
  val SfEquityIdx = 0.20
  val RhoCreditSn = 0.50
  val RhoCreditIdx = 0.80
  val RhoEquitySn = 0.50
  val RhoEquityIdx = 0.80
  val RhoCommodity = 0.40
  val RhoIr12 = 0.7
  val RhoIr23 = 0.7
  val RhoIr13 = 0.3
  val MultiplierFloorF = 0.05
  val SupervisoryDurationRate = 0.05
  val StartFloorYears = 0.04 // 10 BD on the 250-BD year (Art. 279b)
  val BdPerYear = 250
  val MfUnmarginedFloorDays = 10 // BCBS CRE52.47-48 fn.13 residual-M floor
  val MporFloorDaysOtc = 10 // Art. 285(2)(b)
  val MporDaysLargeOrIlliquid = 20 // Art. 285(3)
  val MporLargeNettingSetTradeCount = 5000
  val MporDisputeThreshold = 2 // Art. 285(4)
  val MporDisputeMultiplier = 2

  /** Single-name credit supervisory factor by quality (Art. 280 Table 2). */
  def sfCreditSn(quality: Column): Column =
    when(quality === "IG", 0.0046).when(quality === "HY", 0.013)
      .otherwise(0.06)

  /** Index credit supervisory factor by quality (Art. 280 Table 2). */
  def sfCreditIdx(quality: Column): Column =
    when(quality === "IG", 0.0038).otherwise(0.0106)

  /** Commodity supervisory factor by bucket (Art. 280 Table 2). */
  def sfCommodity(commodityType: Column): Column =
    when(commodityType === "ELECTRICITY", 0.40).otherwise(0.18)

  /** Supervisory option volatility by asset class (BCBS CRE52.47 table;
    * the bare credit/equity classes take the INDEX vol — the reference's
    * `_OPTION_VOLATILITY_BY_ASSET_CLASS` mapping). */
  def optionVolatility(assetClass: Column, isIndexLike: Column): Column =
    when(assetClass === "interest_rate", 0.50)
      .when(assetClass === "fx", 0.15)
      .when(assetClass === "credit", when(isIndexLike, 0.80).otherwise(1.00))
      .when(assetClass === "equity", when(isIndexLike, 0.75).otherwise(1.20))
      .when(assetClass === "commodity_electricity", 1.50)
      .otherwise(0.70)

  // ---- per-trade quantities -------------------------------------------

  /** Supervisory duration SD(S, E) = (e^(−rS) − e^(−rE)) / r with r = 0.05
    * and S floored at 10 BD = 0.04y (Art. 279b(1)(a)); day counts are
    * calendar days from the reporting date on the 365.25 convention. */
  def supervisoryDuration(daysToStart: Column, daysToMaturity: Column): Column = {
    val s = greatest(daysToStart.cast("double") / 365.25, lit(StartFloorYears))
    val e = daysToMaturity.cast("double") / 365.25
    (exp(lit(-SupervisoryDurationRate) * s) -
      exp(lit(-SupervisoryDurationRate) * e)) / SupervisoryDurationRate
  }

  /** Unmargined maturity factor MF = sqrt(min(max(BD, 10), 250)/250)
    * (Art. 279c(1) on the 250-business-day year, CRE52.47-48 fn.13). */
  def maturityFactorUnmargined(bdToMaturity: Column): Column =
    sqrt(least(greatest(bdToMaturity.cast("double"),
      lit(MfUnmarginedFloorDays.toDouble)), lit(BdPerYear.toDouble)) / BdPerYear)

  /** Effective MPOR per the Art. 285(2)-(5) cascade: 10-BD OTC base,
    * 20-BD large/illiquid upgrade, dispute doubling, remargining
    * adjustment `base + freq − 1`, then the firm-supplied MPOR floor. */
  def mporEffective(nTrades: Column, hasIlliquid: Column,
      disputeCountQtr: Column, remarginFreqDays: Column,
      mporDaysInput: Column): Column = {
    val base1 = when(nTrades > MporLargeNettingSetTradeCount || hasIlliquid,
      MporDaysLargeOrIlliquid).otherwise(MporFloorDaysOtc)
    val base2 = when(disputeCountQtr > MporDisputeThreshold,
      base1 * MporDisputeMultiplier).otherwise(base1)
    greatest(base2 + remarginFreqDays - lit(1),
      coalesce(mporDaysInput, lit(MporFloorDaysOtc)))
  }

  /** Margined maturity factor MF = 1.5·sqrt(MPOR_eff/250) (Art. 279c(2)). */
  def maturityFactorMargined(mporEff: Column): Column =
    lit(1.5) * sqrt(mporEff.cast("double") / BdPerYear)

  /** Supervisory delta: ±1 linear (Art. 279a(1)); Black Φ(d1) for rows
    * carrying a strike and underlying price (Art. 279a(2)) with
    * T = calendar days/365 and the supervisory vol table. */
  def supervisoryDelta(isLong: Column, optionType: Column,
      optionStrike: Column, optionUnderlying: Column,
      daysStartToMaturity: Column, sigma: Column): Column = {
    import graft.functions.normal
    val t = daysStartToMaturity.cast("double") / 365.0
    val d1 = (log(optionUnderlying / optionStrike) +
      lit(0.5) * sigma * sigma * t) / (sigma * sqrt(t))
    val call = when(isLong, normal.norm_cdf(d1)).otherwise(-normal.norm_cdf(d1))
    val putd = when(isLong, -normal.norm_cdf(-d1)).otherwise(normal.norm_cdf(-d1))
    // Degenerate-row guard (expired option t=0, zero/negative strike or
    // price): the Black term divides by σ√t and logs P/K — Polars yields
    // NaN there (the reference's latent shape), Spark ANSI fails the JOB.
    // Degenerate rows take the Art. 279a(1) linear ±1 delta instead: the
    // conservative bound, and the job survives the billionth edge row.
    // `coalesce(..., false)`: a NULL daysStartToMaturity makes the
    // three-way conjunction NULL, and `!NULL` is NULL — the row would
    // slip past the guard into the Black branch and produce a NULL delta
    // that the add-on sum() then silently drops, UNDERSTATING the add-on
    // instead of taking the documented linear ±1 fallback.
    val blackDefined = coalesce(
      optionStrike > 0.0 && optionUnderlying > 0.0 && daysStartToMaturity > 0,
      lit(false))
    when(optionStrike.isNull || optionUnderlying.isNull || !blackDefined,
      when(isLong, 1.0).otherwise(-1.0))
      .otherwise(when(optionType === "put", putd).otherwise(call))
  }

  /** FX adjusted notional (Art. 279b(1)(b)): when one leg is the base
    * currency, the OTHER leg's |notional| converted to base; both foreign
    * → the larger converted leg. Callers supply both legs pre-converted. */
  def adjustedNotionalFx(absLeg1Base: Column, absLeg2Base: Column,
      leg1IsBase: Column, leg2IsBase: Column): Column =
    when(leg1IsBase && !leg2IsBase, absLeg2Base)
      .when(leg2IsBase && !leg1IsBase, absLeg1Base)
      .otherwise(greatest(absLeg1Base, absLeg2Base))

  /** IR maturity bucket from calendar-years-to-maturity (Art. 277(2)):
    * 1 = M < 1y, 2 = 1y ≤ M ≤ 5y, 3 = M > 5y. */
  def irBucket(yearsToMaturity: Column): Column =
    when(yearsToMaturity < 1.0, 1).when(yearsToMaturity <= 5.0, 2).otherwise(3)

  // ---- netting-set add-on roll-up -------------------------------------

  /** Decimal-exact effective-notional sum: per-trade eff values are
    * summed as DECIMAL(38,6) so the result is independent of partition
    * order and bit-identical across engines (the repo's dsum
    * discipline); downstream scalar math stays double. At 1e-6 absolute
    * quantisation on 1e8-scale notionals the relative effect is ~1e-14
    * — far inside the acceptance gate. */
  private def dsum6(c: Column): Column =
    sum(c.cast("decimal(38,6)")).cast("double")

  /** Engine-portable 1e-6 quantiser (floor arithmetic on the same double
    * is bit-identical in Spark and DuckDB). Applied to every
    * level-crossing intermediate BEFORE its decimal sum: a product of
    * pretty decimals (sf × a 6-decimal sum) can land exactly on the
    * decimal cast's .5 boundary, where Spark (shortest-string HALF_UP)
    * and DuckDB (binary rounding) disagree — the floor form cannot. */
  private def qz(c: Column): Column = floor(c * 1e6 + lit(0.5)) / 1e6

  /** Asset-class add-on aggregation (Art. 277a/278(2)).
    *
    * Input: trade grain with columns
    *  - `netting_set`, `asset_class`
    *    (interest_rate | fx | credit | equity | commodity),
    *  - `eff` — per-trade effective notional δ·d·MF,
    *  - `years_to_maturity` (IR bucketing), `hedging_set` (FX pair),
    *  - `reference_entity` (credit/equity netting; commodity reference),
    *  - `is_index`, `credit_quality`, `commodity_type`.
    *
    * Output: `(netting_set, addon_aggregate)` — the Art. 278(2) simple
    * sum of asset-class add-ons.
    *
    * Shape: ONE shuffle aggregates the finest hedging grain; the five
    * class rollups derive from that shared subtree; the final cross-class
    * sum is a netting-set-grain aggregate. No joins, no windows.
    */
  def addonAggregate(trades: DataFrame): DataFrame = {
    // finest shared grain: per-class sub-keys projected into one pair of
    // generic key columns so a single exchange serves all five branches.
    // Class-IRRELEVANT attributes are nulled per class before grouping —
    // a credit quality carried on an equity row, or an index flag on a
    // commodity row, must not subdivide that class's netting grain (the
    // per-entity / per-hedging-set nets of Art. 277a would silently
    // lose cancellation otherwise).
    val base = trades.select(
      col("netting_set"), col("asset_class"),
      when(col("asset_class") === "interest_rate",
          irBucket(col("years_to_maturity")).cast("string"))
        .when(col("asset_class") === "fx", col("hedging_set"))
        .when(col("asset_class") === "commodity", col("commodity_type"))
        .otherwise(coalesce(col("reference_entity"), lit("-"))).as("k1"),
      when(col("asset_class") === "commodity",
          coalesce(col("reference_entity"), col("trade_id")))
        .otherwise(lit("-")).as("k2"),
      when(col("asset_class").isin("credit", "equity"),
        coalesce(col("is_index"), lit(false))).otherwise(lit(false))
        .as("is_index"),
      when(col("asset_class") === "credit", col("credit_quality"))
        .as("credit_quality"),
      when(col("asset_class") === "commodity", col("commodity_type"))
        .as("commodity_type"),
      col("eff"))
      .groupBy("netting_set", "asset_class", "k1", "k2",
        "is_index", "credit_quality", "commodity_type")
      .agg(dsum6(col("eff")).as("d_k"))

    // IR (Art. 277a(1)(a)): bucket pivot by conditional aggregation, then
    // the three-bucket correlation composition
    val ir = base.filter(col("asset_class") === "interest_rate")
      .groupBy("netting_set")
      .agg(dsum6(when(col("k1") === "1", col("d_k")).otherwise(0.0)).as("b1"),
        dsum6(when(col("k1") === "2", col("d_k")).otherwise(0.0)).as("b2"),
        dsum6(when(col("k1") === "3", col("d_k")).otherwise(0.0)).as("b3"))
      .select(col("netting_set"), qz(lit(SfIr) * sqrt(
        col("b1") * col("b1") + col("b2") * col("b2") + col("b3") * col("b3") +
          lit(2.0 * RhoIr12) * col("b1") * col("b2") +
          lit(2.0 * RhoIr23) * col("b2") * col("b3") +
          lit(2.0 * RhoIr13) * col("b1") * col("b3"))).as("addon"))

    // FX (Art. 277a(2) + CRE52.55): SF·|D_HS| summed across hedging sets
    val fx = base.filter(col("asset_class") === "fx")
      .groupBy("netting_set")
      .agg(qz(dsum6(qz(lit(SfFx) * abs(col("d_k"))))).as("addon"))

    // credit (Art. 280a): one hedging set per netting set; entity-grain
    // systematic/idiosyncratic split with ρ by single-name vs index
    val crRho = when(col("is_index"), RhoCreditIdx).otherwise(RhoCreditSn)
    val crSf = when(col("is_index"), sfCreditIdx(col("credit_quality")))
      .otherwise(sfCreditSn(col("credit_quality")))
    val credit = base.filter(col("asset_class") === "credit")
      .select(col("netting_set"), crRho.as("rho"),
        qz(crSf * col("d_k")).as("a"))
      .groupBy("netting_set")
      .agg(dsum6(qz(col("rho") * col("a"))).as("sys"),
        dsum6(qz((lit(1.0) - col("rho") * col("rho")) * col("a") * col("a")))
          .as("idio"))
      .select(col("netting_set"),
        qz(sqrt(col("sys") * col("sys") + col("idio"))).as("addon"))

    // equity (Art. 280b): SN and IDX sub-classes aggregate separately
    // (ρ/SF per sub-class), then sum — no cross-sub-class correlation
    val eqRho = when(col("is_index"), RhoEquityIdx).otherwise(RhoEquitySn)
    val eqSf = when(col("is_index"), SfEquityIdx).otherwise(SfEquitySn)
    val equity = base.filter(col("asset_class") === "equity")
      .groupBy("netting_set", "is_index")
      .agg(dsum6(col("d_k")).as("sum_d"),
        dsum6(col("d_k") * col("d_k")).as("sum_d2"))
      .select(col("netting_set"), qz(eqSf * sqrt(
        (eqRho * col("sum_d")) * (eqRho * col("sum_d")) +
          (lit(1.0) - eqRho * eqRho) * col("sum_d2"))).as("sub_addon"))
      .groupBy("netting_set").agg(qz(dsum6(col("sub_addon"))).as("addon"))

    // commodity (Art. 280c): per-commodity netting already in the base
    // grain (k2 = commodity reference); bucket ρ=0.40 composition, then
    // cross-bucket sqrt-sum-of-squares (CRE52.69)
    val commodity = base.filter(col("asset_class") === "commodity" &&
        col("commodity_type").isNotNull)
      .groupBy("netting_set", "commodity_type")
      .agg(dsum6(col("d_k")).as("d_b"),
        dsum6(col("d_k") * col("d_k")).as("sum_dk2"))
      .select(col("netting_set"),
        qz(sfCommodity(col("commodity_type")) * sqrt(
          lit(RhoCommodity * RhoCommodity) * col("d_b") * col("d_b") +
            lit(1.0 - RhoCommodity * RhoCommodity) * col("sum_dk2")))
          .as("addon_b"))
      .groupBy("netting_set")
      .agg(qz(sqrt(dsum6(col("addon_b") * col("addon_b")))).as("addon"))

    // Art. 278(2): simple sum across asset classes
    ir.unionByName(fx).unionByName(credit).unionByName(equity)
      .unionByName(commodity)
      .groupBy("netting_set").agg(dsum6(col("addon")).as("addon_aggregate"))
  }

  // ---- EAD composition (netting-set grain) -----------------------------

  /** RC + PFE multiplier + EAD (Art. 274(2)/275/278) over a netting-set
    * frame with `v_net`, `c_net`, `margined`, `th`, `mta`, `nica`,
    * `addon_aggregate`. Adds `rc`, `pfe_multiplier`, `pfe_addon`,
    * `ead_ccr`. */
  def ead(ns: DataFrame): DataFrame = {
    val f = MultiplierFloorF
    ns.withColumn("rc",
        when(col("margined"),
          greatest(col("v_net") - col("c_net"),
            col("th") + col("mta") - col("nica"), lit(0.0)))
          .otherwise(greatest(col("v_net") - col("c_net"), lit(0.0))))
      .withColumn("pfe_multiplier",
        when(col("addon_aggregate") > 0.0, least(lit(1.0),
          lit(f) + lit(1.0 - f) * exp((col("v_net") - col("c_net")) /
            (lit(2.0 * (1.0 - f)) * col("addon_aggregate")))))
          .otherwise(lit(1.0)))
      .withColumn("pfe_addon", col("pfe_multiplier") * col("addon_aggregate"))
      .withColumn("ead_ccr", lit(Alpha) * (col("rc") + col("pfe_addon")))
  }
}
