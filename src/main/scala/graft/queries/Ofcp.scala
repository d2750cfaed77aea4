package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.OtherFundedProtection
import Q._

/** Other-funded-credit-protection calculators (CRR Art. 200/232/233) as
  * oracle-checked queries — the life-insurance and third-party-deposit
  * treatments the q112 census routed but did not compute (reference
  * `engine/crm/life_insurance.py`, `engine/crm/third_party_deposit.py`,
  * blending consumers `engine/sa/rw_adjustments.py:126-196`).
  */
object Ofcp {

  /** Synthetic exposure book: orders as loans, with a currency, a
    * counterparty, a (sometimes-null) facility and an own SA risk weight.
    * ORD-/FAC-/CUST- prefixes keep the three beneficiary namespaces
    * disjoint (reference repo convention, `life_insurance.py:17-19`). */
  private def lifeExposures(o: DataFrame): DataFrame = o.select(
    concat(lit("ORD-"), col("o_orderkey").cast("string")).as("exposure_reference"),
    col("o_totalprice").as("ead"),
    when(col("o_orderkey") % 3 === 0, "GBP")
      .when(col("o_orderkey") % 3 === 1, "USD").otherwise("EUR").as("currency"),
    concat(lit("CUST-"), col("o_custkey").cast("string")).as("counterparty_reference"),
    when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
      .otherwise(concat(lit("FAC-"), col("o_custkey").cast("string"), lit("-"),
        (col("o_orderkey") % 2).cast("string"))).as("parent_facility_reference"),
    when(col("o_orderkey") % 4 === 0, 0.5).when(col("o_orderkey") % 4 === 1, 0.75)
      .when(col("o_orderkey") % 4 === 2, 1.0).otherwise(1.5).as("own_rw"))

  private val lifeExposuresSql = """
    SELECT 'ORD-' || CAST(o_orderkey AS VARCHAR) AS exposure_reference,
           o_totalprice AS ead,
           CASE WHEN o_orderkey % 3 = 0 THEN 'GBP'
                WHEN o_orderkey % 3 = 1 THEN 'USD' ELSE 'EUR' END AS currency,
           'CUST-' || CAST(o_custkey AS VARCHAR) AS counterparty_reference,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE 'FAC-' || CAST(o_custkey AS VARCHAR) || '-' ||
                     CAST(o_orderkey % 2 AS VARCHAR) END AS parent_facility_reference,
           CASE WHEN o_orderkey % 4 = 0 THEN 0.5 WHEN o_orderkey % 4 = 1 THEN 0.75
                WHEN o_orderkey % 4 = 2 THEN 1.0 ELSE 1.5 END AS own_rw
    FROM orders"""

  /** q113: life-insurance CRM (Art. 232(3)/233(3)) — pledged policies at
    * all three beneficiary levels (direct / facility pro-rata /
    * counterparty pro-rata), the per-policy 8% FX cut (cut-then-sum,
    * including the null-currency conservative branch), the insurer-RW →
    * secured-RW band map with the null-RW → 100% → 70% default, the
    * EAD cap, and the SA risk-weight blend — summarised per exposure
    * currency. Reference `engine/crm/life_insurance.py` +
    * `engine/sa/rw_adjustments.py:126-156`. */
  val q113LifeInsurance = QueryDef(
    "q113_life_insurance",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val expo = lifeExposures(o)
      val pol = li.filter(col("l_linenumber") === 3)
        .join(o.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          when(col("l_suppkey") % 3 === 0,
            concat(lit("ORD-"), col("l_orderkey").cast("string")))
            .when(col("l_suppkey") % 3 === 1,
              concat(lit("FAC-"), col("o_custkey").cast("string"), lit("-"),
                (col("l_orderkey") % 2).cast("string")))
            .otherwise(concat(lit("CUST-"), col("o_custkey").cast("string")))
            .as("beneficiary_reference"),
          lit("life_insurance").as("collateral_type"),
          q2(col("l_extendedprice") * 0.5).as("market_value"),
          when(col("l_partkey") % 5 === 0, 0.20).when(col("l_partkey") % 5 === 1, 0.30)
            .when(col("l_partkey") % 5 === 2, 0.65).when(col("l_partkey") % 5 === 3, 1.50)
            .otherwise(lit(null).cast("double")).as("insurer_risk_weight"),
          when(col("l_partkey") % 4 === 0, "GBP").when(col("l_partkey") % 4 === 1, "USD")
            .when(col("l_partkey") % 4 === 2, "EUR")
            .otherwise(lit(null).cast("string")).as("currency"))
      val withLi = OtherFundedProtection.lifeInsuranceColumns(expo, pol)
      // SA blend (reference rw_adjustments.py:141-155): secured share at
      // the mapped RW, remainder at the obligor RW; no 20% floor.
      val pct = when(col("ead") > lit(0.0),
        col("life_ins_collateral_value") / col("ead")).otherwise(lit(0.0))
      val blended = when(col("life_ins_collateral_value") > lit(0.0),
        pct * col("life_ins_secured_rw") + (lit(1.0) - pct) * col("own_rw"))
        .otherwise(col("own_rw"))
      withLi.withColumn("blended_rw", blended)
        .groupBy(col("currency"))
        .agg(
          count(lit(1)).as("n_exposures"),
          count(when(col("life_ins_collateral_value") > lit(0.0), lit(1))).as("n_secured"),
          dsum(q2(col("life_ins_collateral_value")), 2).as("life_ins_value"),
          dsum(q2(col("ead") * col("own_rw")), 2).as("rwa_unmitigated"),
          dsum(q2(col("ead") * col("blended_rw")), 2).as("rwa_post_crm"))
        .orderBy(col("currency"))
    },
    Some(s"""
      WITH expo0 AS ($lifeExposuresSql),
      expo AS MATERIALIZED (
        SELECT *,
          CASE WHEN parent_facility_reference IS NULL THEN 0.0
               ELSE (CASE WHEN fac_tot > 0.0 THEN ead / fac_tot ELSE 0.0 END)
          END AS w_f,
          CASE WHEN counterparty_reference IS NULL THEN 0.0
               ELSE (CASE WHEN cp_tot > 0.0 THEN ead / cp_tot ELSE 0.0 END)
          END AS w_c
        FROM (
          SELECT *,
            ${sqlDsumOver("ead", 2,
              "PARTITION BY coalesce(parent_facility_reference, exposure_reference)")}
              AS fac_tot,
            ${sqlDsumOver("ead", 2,
              "PARTITION BY coalesce(counterparty_reference, exposure_reference)")}
              AS cp_tot
          FROM expo0)),
      pol AS (
        SELECT CASE WHEN l_suppkey % 3 = 0 THEN 'ORD-' || CAST(l_orderkey AS VARCHAR)
                    WHEN l_suppkey % 3 = 1 THEN 'FAC-' ||
                      CAST(o_custkey AS VARCHAR) || '-' ||
                      CAST(l_orderkey % 2 AS VARCHAR)
                    ELSE 'CUST-' || CAST(o_custkey AS VARCHAR)
               END AS beneficiary_reference,
               ${sql2("l_extendedprice * 0.5")} AS market_value,
               CASE WHEN l_partkey % 5 = 0 THEN 0.20 WHEN l_partkey % 5 = 1 THEN 0.30
                    WHEN l_partkey % 5 = 2 THEN 0.65 WHEN l_partkey % 5 = 3 THEN 1.50
               END AS insurer_risk_weight,
               CASE WHEN l_partkey % 4 = 0 THEN 'GBP' WHEN l_partkey % 4 = 1 THEN 'USD'
                    WHEN l_partkey % 4 = 2 THEN 'EUR' END AS pol_ccy
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber = 3),
      pol_rw AS (
        SELECT *, ${OtherFundedProtection.sqlMapInsurerRw("insurer_risk_weight")} AS li_rw
        FROM pol),
      li_total AS MATERIALIZED (
        SELECT beneficiary_reference,
               ${sqlDsum("market_value", 2)} AS tv,
               ${sqlDsum("market_value * li_rw", 4)} AS tvrw
        FROM pol_rw GROUP BY 1),
      li_matched AS MATERIALIZED (
        SELECT beneficiary_reference, pol_ccy,
               ${sqlDsum("market_value", 2)} AS mv,
               ${sqlDsum("market_value * li_rw", 4)} AS mvrw
        FROM pol_rw GROUP BY 1, 2),
      joined AS (
        SELECT e.*,
               td.tv AS tv_d, td.tvrw AS tvrw_d, md.mv AS mv_d, md.mvrw AS mvrw_d,
               tf.tv AS tv_f, tf.tvrw AS tvrw_f, mf.mv AS mv_f, mf.mvrw AS mvrw_f,
               tc.tv AS tv_c, tc.tvrw AS tvrw_c, mc.mv AS mv_c, mc.mvrw AS mvrw_c
        FROM expo e
        LEFT JOIN li_total td ON e.exposure_reference = td.beneficiary_reference
        LEFT JOIN li_matched md ON e.exposure_reference = md.beneficiary_reference
          AND e.currency = md.pol_ccy
        LEFT JOIN li_total tf ON e.parent_facility_reference = tf.beneficiary_reference
        LEFT JOIN li_matched mf ON e.parent_facility_reference = mf.beneficiary_reference
          AND e.currency = mf.pol_ccy
        LEFT JOIN li_total tc ON e.counterparty_reference = tc.beneficiary_reference
        LEFT JOIN li_matched mc ON e.counterparty_reference = mc.beneficiary_reference
          AND e.currency = mc.pol_ccy),
      eff AS (
        SELECT *,
          1.0 * (0.92 * tv_d + 0.08 * coalesce(mv_d, 0.0)) AS ev_d,
          1.0 * (0.92 * tvrw_d + 0.08 * coalesce(mvrw_d, 0.0)) AS evrw_d,
          w_f * (0.92 * tv_f + 0.08 * coalesce(mv_f, 0.0)) AS ev_f,
          w_f * (0.92 * tvrw_f + 0.08 * coalesce(mvrw_f, 0.0)) AS evrw_f,
          w_c * (0.92 * tv_c + 0.08 * coalesce(mv_c, 0.0)) AS ev_c,
          w_c * (0.92 * tvrw_c + 0.08 * coalesce(mvrw_c, 0.0)) AS evrw_c
        FROM joined),
      tot AS (
        SELECT *,
          coalesce(ev_d, 0.0) + coalesce(ev_f, 0.0) + coalesce(ev_c, 0.0) AS total_v,
          coalesce(evrw_d, 0.0) + coalesce(evrw_f, 0.0) + coalesce(evrw_c, 0.0)
            AS total_vrw
        FROM eff),
      calc AS (
        SELECT *, least(total_v, ead) AS li_value,
          CASE WHEN total_v > 0.0 THEN total_vrw / total_v ELSE 0.0 END AS li_rw
        FROM tot),
      blend AS (
        SELECT *, CASE WHEN li_value > 0.0
            THEN (CASE WHEN ead > 0.0 THEN li_value / ead ELSE 0.0 END) * li_rw
               + (1.0 - (CASE WHEN ead > 0.0 THEN li_value / ead ELSE 0.0 END)) * own_rw
            ELSE own_rw END AS blended_rw
        FROM calc)
      SELECT currency, count(*) AS n_exposures,
             count(CASE WHEN li_value > 0.0 THEN 1 END) AS n_secured,
             ${sqlDsum(sql2("li_value"), 2)} AS life_ins_value,
             ${sqlDsum(sql2("ead * own_rw"), 2)} AS rwa_unmitigated,
             ${sqlDsum(sql2("ead * blended_rw"), 2)} AS rwa_post_crm
      FROM blend GROUP BY currency ORDER BY currency
    """.stripMargin.trim))

  /** Holder-institution SA RW by CQS (the deposit's issuer IS the holder;
    * reference `third_party_deposit.py:20-24` via the shared institution
    * table `engine/sa/guarantor_rw.py`). */
  private def holderRw(cqs: Column): Column =
    graft.engine.DomainPipeline.rwTable.filter(_._1 == "institution")
      .foldLeft(Option.empty[Column]) {
        case (None, (_, q, w)) => Some(when(cqs === q, w))
        case (Some(acc), (_, q, w)) => Some(acc.when(cqs === q, w))
      }.get.otherwise(1.0)

  private val holderRwSql = graft.engine.DomainPipeline.rwTable
    .filter(_._1 == "institution")
    .map { case (_, q, w) => s"WHEN issuer_cqs = $q THEN CAST($w AS DOUBLE)" }
    .mkString("CASE ", " ", " ELSE 1.0 END")

  /** q114: third-party-deposit CRM (Art. 200(a)/232(2)) — cash/deposit
    * collateral held at ANOTHER institution partitioned OUT of the
    * ordinary channel and treated as a guarantee by the holder: the
    * covered part takes the holder's institution-table RW (benefit-only
    * cap — substitution can never increase RWA), a non-institution holder
    * is out of scope (no benefit, censused), and under F-IRB the
    * substitution is deferred (no benefit + CRM017 census). Summarised
    * per approach. Reference `engine/crm/third_party_deposit.py` +
    * `engine/sa/rw_adjustments.py:159-196`. */
  val q114ThirdPartyDeposit = QueryDef(
    "q114_third_party_deposit",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val expo = o.select(
        concat(lit("ORD-"), col("o_orderkey").cast("string")).as("exposure_reference"),
        col("o_totalprice").as("ead"),
        when(col("o_orderkey") % 4 === 0, "FIRB").otherwise("SA").as("approach"),
        when(col("o_orderkey") % 3 === 0, 0.5).when(col("o_orderkey") % 3 === 1, 1.0)
          .otherwise(1.5).as("own_rw"))
      val colls = li.filter(col("l_linenumber") === 4).select(
        concat(lit("ORD-"), col("l_orderkey").cast("string")).as("beneficiary_reference"),
        when(col("l_partkey") % 3 === 0, "cash").when(col("l_partkey") % 3 === 1, "deposit")
          .otherwise("bond").as("collateral_type"),
        when(col("l_suppkey") % 4 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("HOLD-"), (col("l_suppkey") % 7).cast("string")))
          .as("held_by_counterparty_reference"),
        when(col("l_suppkey") % 3 === 0, "institution")
          .when(col("l_suppkey") % 3 === 1, "bank").otherwise("corporate").as("issuer_type"),
        (lit(1) + col("l_partkey") % 6).cast("int").as("issuer_cqs"),
        q2(col("l_extendedprice") * 0.35).as("market_value"))
      val (_, tpd) = OtherFundedProtection.splitThirdPartyDeposits(colls)
      val withTpd = OtherFundedProtection.thirdPartyDepositColumns(expo, tpd, holderRw)
      val v = col("third_party_deposit_value")
      val pct = when(col("ead") > lit(0.0), v / col("ead")).otherwise(lit(0.0))
      val blended = pct * col("third_party_deposit_secured_rw") +
        (lit(1.0) - pct) * col("own_rw")
      val finalRw = when(v > lit(0.0), least(blended, col("own_rw")))
        .otherwise(col("own_rw"))
      withTpd.withColumn("final_rw", finalRw)
        .groupBy(col("approach"))
        .agg(
          count(lit(1)).as("n_exposures"),
          count(when(v > lit(0.0), lit(1))).as("n_benefit"),
          count(when(col("tpd_firb_deferred"), lit(1))).as("n_firb_deferred"),
          count(when(col("tpd_non_institution_holder"), lit(1))).as("n_out_of_scope"),
          dsum(q2(v), 2).as("tpd_value"),
          dsum(q2(col("ead") * col("own_rw")), 2).as("rwa_unmitigated"),
          dsum(q2(col("ead") * col("final_rw")), 2).as("rwa_post_crm"))
        .orderBy(col("approach"))
    },
    Some(s"""
      WITH expo AS (
        SELECT 'ORD-' || CAST(o_orderkey AS VARCHAR) AS exposure_reference,
               o_totalprice AS ead,
               CASE WHEN o_orderkey % 4 = 0 THEN 'FIRB' ELSE 'SA' END AS approach,
               CASE WHEN o_orderkey % 3 = 0 THEN 0.5 WHEN o_orderkey % 3 = 1 THEN 1.0
                    ELSE 1.5 END AS own_rw
        FROM orders),
      colls AS (
        SELECT 'ORD-' || CAST(l_orderkey AS VARCHAR) AS beneficiary_reference,
               CASE WHEN l_partkey % 3 = 0 THEN 'cash'
                    WHEN l_partkey % 3 = 1 THEN 'deposit' ELSE 'bond' END
                 AS collateral_type,
               CASE WHEN l_suppkey % 4 = 0 THEN NULL
                    ELSE 'HOLD-' || CAST(l_suppkey % 7 AS VARCHAR) END
                 AS held_by_counterparty_reference,
               CASE WHEN l_suppkey % 3 = 0 THEN 'institution'
                    WHEN l_suppkey % 3 = 1 THEN 'bank' ELSE 'corporate' END
                 AS issuer_type,
               1 + l_partkey % 6 AS issuer_cqs,
               ${sql2("l_extendedprice * 0.35")} AS market_value
        FROM lineitem WHERE l_linenumber = 4),
      tpd AS (
        SELECT *, $holderRwSql AS item_rw,
          lower(issuer_type) IN ('institution', 'bank', 'credit_institution') AS is_inst
        FROM colls
        WHERE lower(collateral_type) IN ('cash', 'deposit')
          AND held_by_counterparty_reference IS NOT NULL),
      agg AS MATERIALIZED (
        SELECT beneficiary_reference,
               ${sqlDsum("CASE WHEN is_inst THEN market_value END", 2)} AS v,
               ${sqlDsum("CASE WHEN is_inst THEN market_value * item_rw END", 4)} AS vrw,
               count(CASE WHEN NOT is_inst THEN 1 END) AS n_non_inst
        FROM tpd GROUP BY 1),
      joined AS (
        SELECT e.*, coalesce(a.v, 0.0) AS inst_v, coalesce(a.vrw, 0.0) AS wrw,
               coalesce(a.n_non_inst, 0) AS n_non_inst
        FROM expo e LEFT JOIN agg a ON e.exposure_reference = a.beneficiary_reference),
      calc AS (
        SELECT *,
          CASE WHEN approach IN ('FIRB', 'AIRB') THEN 0.0
               ELSE least(inst_v, ead) END AS tpd_value,
          CASE WHEN inst_v > 0.0 THEN wrw / inst_v ELSE 0.0 END AS tpd_rw,
          (approach IN ('FIRB', 'AIRB')) AND inst_v > 0.0 AS firb_deferred,
          n_non_inst > 0 AS non_inst_holder
        FROM joined),
      blend AS (
        SELECT *, CASE WHEN tpd_value > 0.0
            THEN least(
              (CASE WHEN ead > 0.0 THEN tpd_value / ead ELSE 0.0 END) * tpd_rw
                + (1.0 - (CASE WHEN ead > 0.0 THEN tpd_value / ead ELSE 0.0 END)) * own_rw,
              own_rw)
            ELSE own_rw END AS final_rw
        FROM calc)
      SELECT approach, count(*) AS n_exposures,
             count(CASE WHEN tpd_value > 0.0 THEN 1 END) AS n_benefit,
             count(CASE WHEN firb_deferred THEN 1 END) AS n_firb_deferred,
             count(CASE WHEN non_inst_holder THEN 1 END) AS n_out_of_scope,
             ${sqlDsum(sql2("tpd_value"), 2)} AS tpd_value,
             ${sqlDsum(sql2("ead * own_rw"), 2)} AS rwa_unmitigated,
             ${sqlDsum(sql2("ead * final_rw"), 2)} AS rwa_post_crm
      FROM blend GROUP BY approach ORDER BY approach
    """.stripMargin.trim))

  // ---- q166: two-layer protection look-through -------------------------

  /** q166: the Art. 191A(2)(e)(i) funded-only look-through census over
    * synthetic guarantee/collateral books (reference
    * `engine/crm/look_through.py` — the CRM Step 0 transform,
    * `operators/LookThrough.applyFundedOnly`):
    *
    *  - guarantee-posted collateral behind an electing guarantee
    *    re-anchors onto the obligor exposure; the guarantee row itself
    *    is suppressed from the substitution path;
    *  - `both` elections stay untouched and emit the not-implemented
    *    warning; `none` (and null) preserve existing behaviour;
    *  - the output is the post-transform census: guarantee rows by
    *    election, collateral rows by (beneficiary_type, re-anchored)
    *    with value sums — the re-anchored slice lands under
    *    beneficiary_type `exposure` — and the warning counts by code,
    *    so a regression in any leg of the transform breaks the hash.
    */
  val q166LookThrough = QueryDef(
    "q166_look_through",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val guarantees = li.filter(col("l_linenumber") === 2)
        .select(
          concat(lit("G-"), col("l_orderkey").cast("string"))
            .as("guarantee_reference"),
          lit("exposure").as("beneficiary_type"),
          concat(lit("ORD-"), col("l_orderkey").cast("string"))
            .as("beneficiary_reference"),
          q2(col("l_extendedprice") * 0.5).as("coverage_value"),
          when(col("l_partkey") % 5 === 0, "funded_only")
            .when(col("l_partkey") % 5 === 1, "both")
            .otherwise("none").as("look_through_election"))
      val collateral = li.filter(col("l_linenumber") === 3)
        .select(
          concat(lit("COLL-"), col("l_orderkey").cast("string"), lit("-"),
            col("l_suppkey").cast("string")).as("collateral_reference"),
          when(col("l_partkey") % 3 === 0, "guarantee")
            .otherwise("exposure").as("beneficiary_type"),
          when(col("l_partkey") % 3 === 0,
            concat(lit("G-"), col("l_orderkey").cast("string")))
            .otherwise(concat(lit("ORD-"), col("l_orderkey").cast("string")))
            .as("beneficiary_reference"),
          q2(col("l_extendedprice") * 0.3).as("market_value"))
      val (g2, c2, warnings) =
        graft.operators.LookThrough.applyFundedOnly(guarantees, collateral)
      val gCensus = g2.groupBy(col("look_through_election"))
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("coverage_value"), 2).as("total_value"))
        .select(lit("guarantee").as("section"),
          col("look_through_election").as("key"),
          col("n_rows"), col("total_value"))
      val cCensus = c2.groupBy(col("beneficiary_type"), col("re_anchored"))
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("market_value"), 2).as("total_value"))
        .select(lit("collateral").as("section"),
          concat(col("beneficiary_type"), lit(":"),
            col("re_anchored").cast("string")).as("key"),
          col("n_rows"), col("total_value"))
      val wCensus = warnings.groupBy(col("code"))
        .agg(count(lit(1)).as("n_rows"))
        .select(lit("warning").as("section"), col("code").as("key"),
          col("n_rows"), lit(null).cast("double").as("total_value"))
      gCensus.unionByName(cCensus).unionByName(wCensus)
        .orderBy(col("section"), col("key"))
    },
    Some(s"""
      WITH x166guar AS (
        SELECT 'G-' || CAST(l_orderkey AS VARCHAR) AS guarantee_reference,
               'exposure' AS beneficiary_type,
               'ORD-' || CAST(l_orderkey AS VARCHAR) AS beneficiary_reference,
               ${sql2("l_extendedprice * 0.5")} AS coverage_value,
               CASE WHEN l_partkey % 5 = 0 THEN 'funded_only'
                    WHEN l_partkey % 5 = 1 THEN 'both'
                    ELSE 'none' END AS look_through_election
        FROM lineitem WHERE l_linenumber = 2),
      x166coll AS (
        SELECT 'COLL-' || CAST(l_orderkey AS VARCHAR) || '-' ||
                 CAST(l_suppkey AS VARCHAR) AS collateral_reference,
               CASE WHEN l_partkey % 3 = 0 THEN 'guarantee'
                    ELSE 'exposure' END AS beneficiary_type,
               CASE WHEN l_partkey % 3 = 0
                    THEN 'G-' || CAST(l_orderkey AS VARCHAR)
                    ELSE 'ORD-' || CAST(l_orderkey AS VARCHAR) END
                 AS beneficiary_reference,
               ${sql2("l_extendedprice * 0.3")} AS market_value
        FROM lineitem WHERE l_linenumber = 3),
      x166flag AS (
        SELECT guarantee_reference AS lt_ref,
               beneficiary_type AS lt_bt,
               beneficiary_reference AS lt_br
        FROM x166guar WHERE look_through_election = 'funded_only'),
      x166coll2 AS (
        SELECT c.collateral_reference,
               CASE WHEN f.lt_ref IS NOT NULL THEN f.lt_bt
                    ELSE c.beneficiary_type END AS beneficiary_type,
               CASE WHEN f.lt_ref IS NOT NULL THEN f.lt_br
                    ELSE c.beneficiary_reference END AS beneficiary_reference,
               c.market_value,
               f.lt_ref IS NOT NULL AS re_anchored
        FROM x166coll c
        LEFT JOIN x166flag f
          ON c.beneficiary_type = 'guarantee'
         AND c.beneficiary_reference = f.lt_ref),
      x166out AS (
        SELECT 'guarantee' AS section, look_through_election AS key,
               count(*) AS n_rows,
               ${sqlDsum("coverage_value", 2)} AS total_value
        FROM x166guar WHERE look_through_election <> 'funded_only'
        GROUP BY look_through_election
        UNION ALL
        SELECT 'collateral',
               beneficiary_type || ':' || CAST(re_anchored AS VARCHAR),
               count(*), ${sqlDsum("market_value", 2)}
        FROM x166coll2 GROUP BY beneficiary_type, re_anchored
        UNION ALL
        SELECT 'warning',
               CASE WHEN look_through_election = 'funded_only'
                    THEN 'CRM_LOOK_THROUGH_APPLIED'
                    ELSE 'CRM_LOOK_THROUGH_NOT_IMPLEMENTED' END,
               count(*), NULL::DOUBLE
        FROM x166guar WHERE look_through_election IN ('funded_only', 'both')
        GROUP BY 2)
      SELECT * FROM x166out
      ORDER BY section, key
    """.stripMargin.trim))

  val all: Seq[QueryDef] = Seq(
    q113LifeInsurance, q114ThirdPartyDeposit, q166LookThrough)
}
