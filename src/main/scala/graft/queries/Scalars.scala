package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Q._

/** Scalar-function + projection battery (SURVEY.md §2.2, §2.7, §2.8): the
  * when-chain conditional projection (the reference's single most-used
  * operator, 849 occurrences), math/string/date function families,
  * horizontal min/max (greatest/least), null discipline, and the
  * schema-aligning union. All stay inside whole-stage codegen — no UDFs.
  */
object Scalars {

  /** q40: wide conditional projection — a when/then/otherwise cascade like
    * the B3.1 risk-weight override chain (reference
    * `engine/sa/risk_weights.py:1034-1243`; 849 `.when(` calls engine-wide).
    * Codegen compiles the chain to nested branches; the reference's
    * step-decomposition (split huge chains into sequential withColumns)
    * is the same discipline SURVEY §7.4 prescribes for the 64KB limit.
    */
  val q40WhenChain = QueryDef(
    "q40_when_chain",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      o.withColumn("risk_class",
          when(col("o_orderstatus") === "F", "settled")
            .when(col("o_totalprice") > 300000, "jumbo")
            .when(col("o_totalprice") > 150000 && col("o_orderpriority").startsWith("1"), "large_urgent")
            .when(col("o_totalprice") > 150000, "large")
            .when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "small_urgent")
            .otherwise("standard"))
        .withColumn("rw",
          when(col("risk_class") === "settled", 0.0)
            .when(col("risk_class") === "jumbo", 1.5)
            .when(col("risk_class") === "large_urgent", 1.2)
            .when(col("risk_class") === "large", 1.0)
            .when(col("risk_class") === "small_urgent", 0.75)
            .otherwise(0.5))
        .groupBy(col("risk_class"))
        .agg(count(lit(1)).as("n"),
             dsum(col("o_totalprice") * col("rw"), 6).as("rwa"))
        .orderBy(col("risk_class"))
    },
    Some(s"""
      WITH classified AS (
        SELECT o_totalprice,
               CASE WHEN o_orderstatus = 'F' THEN 'settled'
                    WHEN o_totalprice > 300000 THEN 'jumbo'
                    WHEN o_totalprice > 150000 AND o_orderpriority LIKE '1%' THEN 'large_urgent'
                    WHEN o_totalprice > 150000 THEN 'large'
                    WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'small_urgent'
                    ELSE 'standard' END AS risk_class
        FROM orders),
      weighted AS (
        SELECT *, CASE risk_class WHEN 'settled' THEN 0.0 WHEN 'jumbo' THEN 1.5
                       WHEN 'large_urgent' THEN 1.2 WHEN 'large' THEN 1.0
                       WHEN 'small_urgent' THEN 0.75 ELSE 0.5 END AS rw
        FROM classified)
      SELECT risk_class, count(*) AS n,
             ${sqlDsum("o_totalprice * rw", 6)} AS rwa
      FROM weighted
      GROUP BY risk_class
      ORDER BY risk_class
    """.stripMargin.trim))

  /** q41: math-function battery — sqrt/ln/exp/pow/abs + clip via
    * greatest/least, the IRB formula building blocks (reference maturity
    * adjustment `engine/irb/formulas.py:879-884`, correlation exp terms,
    * `ccr/pfe.py:564` pow; horizontal min/max 50+37 uses → greatest/least).
    * Per-row IEEE double math is bit-identical across engines; outputs are
    * quantised then decimal-summed for the order-independent aggregate.
    */
  val q41MathBattery = QueryDef(
    "q41_math_battery",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.select(
          col("l_returnflag"),
          q6(sqrt(col("l_quantity"))).as("sqrt_qty"),
          q6(log(col("l_extendedprice")) ).as("ln_price"),
          q6(exp(-col("l_discount") * lit(50.0))).as("exp_term"),
          q6(pow(lit(1.0) + col("l_tax"), 2.0)).as("pow_term"),
          q6(abs(col("l_discount") - col("l_tax"))).as("abs_diff"),
          q6(least(greatest(col("l_discount"), lit(0.02)), lit(0.08))).as("clipped"))
        .groupBy(col("l_returnflag"))
        .agg(
          dsum(col("sqrt_qty"), 6).as("s_sqrt"),
          dsum(col("ln_price"), 6).as("s_ln"),
          dsum(col("exp_term"), 6).as("s_exp"),
          dsum(col("pow_term"), 6).as("s_pow"),
          dsum(col("abs_diff"), 6).as("s_abs"),
          dsum(col("clipped"), 6).as("s_clip"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      WITH m AS (
        SELECT l_returnflag,
               ${sql6("sqrt(l_quantity)")} AS sqrt_qty,
               ${sql6("ln(l_extendedprice)")} AS ln_price,
               ${sql6("exp(-l_discount * 50.0)")} AS exp_term,
               ${sql6("pow(1.0 + l_tax, 2.0)")} AS pow_term,
               ${sql6("abs(l_discount - l_tax)")} AS abs_diff,
               ${sql6("least(greatest(l_discount, 0.02), 0.08)")} AS clipped
        FROM lineitem)
      SELECT l_returnflag,
             ${sqlDsum("sqrt_qty", 6)} AS s_sqrt,
             ${sqlDsum("ln_price", 6)} AS s_ln,
             ${sqlDsum("exp_term", 6)} AS s_exp,
             ${sqlDsum("pow_term", 6)} AS s_pow,
             ${sqlDsum("abs_diff", 6)} AS s_abs,
             ${sqlDsum("clipped", 6)} AS s_clip
      FROM m
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """.stripMargin.trim))

  /** q42: string-function battery — lower/upper/contains/concat/isin
    * classification (reference `irb/formulas.py:173`, `graph.py:207`;
    * reference suffixed `source_exposure_reference` `schemas.py:2884`).
    */
  val q42StringBattery = QueryDef(
    "q42_string_battery",
    (s, dir) => {
      val p = Tables.part(s, dir)
      p.select(
          concat(lit("PART#"), col("p_partkey").cast("string")).as("ref"),
          lower(col("p_name")).as("name_lc"),
          upper(col("p_brand")).as("brand_uc"),
          col("p_type").contains("BRUSHED").as("is_brushed"),
          col("p_brand").isin("Brand#11", "Brand#22", "Brand#33").as("is_watch_brand"),
          length(col("p_name")).as("name_len"))
        .filter(col("is_brushed") || col("is_watch_brand"))
        .orderBy(col("ref"))
    },
    Some("""
      SELECT 'PART#' || CAST(p_partkey AS VARCHAR) AS ref,
             lower(p_name) AS name_lc,
             upper(p_brand) AS brand_uc,
             contains(p_type, 'BRUSHED') AS is_brushed,
             p_brand IN ('Brand#11','Brand#22','Brand#33') AS is_watch_brand,
             length(p_name) AS name_len
      FROM part
      WHERE contains(p_type, 'BRUSHED') OR p_brand IN ('Brand#11','Brand#22','Brand#33')
      ORDER BY ref
    """.stripMargin.trim))

  /** q43: date-function battery — residual maturity in days/years and a
    * maturity banding chain (reference CCF orig-maturity `engine/ccf.py`,
    * slotting maturity derivation `engine/slotting/transforms.py`,
    * transitional schedules keyed by reporting date).
    */
  val q43DateBattery = QueryDef(
    "q43_date_battery",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(
          datediff(col("l_shipdate"), col("o_orderdate")).as("lag_days"),
          year(col("o_orderdate")).as("vintage"))
        .withColumn("maturity_band",
          when(col("lag_days") < 30, "lt_1m")
            .when(col("lag_days") < 90, "1m_3m")
            .otherwise("gt_3m"))
        .groupBy(col("vintage"), col("maturity_band"))
        .agg(count(lit(1)).as("n"),
             (dsum(col("lag_days").cast("double"), 6) / count(lit(1))).as("avg_lag_days"))
        .orderBy(col("vintage"), col("maturity_band"))
    },
    Some(s"""
      WITH d AS (
        SELECT date_diff('day', o_orderdate, l_shipdate) AS lag_days,
               year(o_orderdate) AS vintage
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      banded AS (
        SELECT *, CASE WHEN lag_days < 30 THEN 'lt_1m'
                       WHEN lag_days < 90 THEN '1m_3m'
                       ELSE 'gt_3m' END AS maturity_band
        FROM d)
      SELECT vintage, maturity_band, count(*) AS n,
             ${sqlDsum("CAST(lag_days AS DOUBLE)", 6)} / count(*) AS avg_lag_days
      FROM banded
      GROUP BY vintage, maturity_band
      ORDER BY vintage, maturity_band
    """.stripMargin.trim))

  /** q44: non-finite scrub + null discipline — NaN/±Inf → null before any
    * consumer (reference DQ011 `contracts/validation.py`
    * scrub_non_finite_values, called `engine/pipeline.py:255-269`), plus the
    * coalesce/fill family (475 fill_null + 48 coalesce uses). Division by
    * overflow (`exp` of a large argument → +Inf; Inf−Inf → NaN — pure IEEE,
    * identical in both engines, and legal under Spark 4 ANSI mode)
    * manufactures the non-finite values; the scrub nulls them; float nulls
    * then PROPAGATE (the anti-conservative-fill invariant,
    * `contracts/edges.py:24-30` — only Booleans get defaults).
    */
  val q44NullScrub = QueryDef(
    "q44_null_scrub",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val raw = exp((col("l_quantity") - lit(20.0)) * lit(100.0))
      val mixed = when(col("l_linenumber") % 2 === 1, raw).otherwise(raw - raw)
      val scrubbed = when(isnan(mixed) || mixed === Double.PositiveInfinity ||
                          mixed === Double.NegativeInfinity, lit(null)).otherwise(mixed)
      val clamped = when(scrubbed.isNull, lit(null))
        .otherwise(least(scrubbed, lit(1e6)))
      li.select(col("l_returnflag"),
                isnan(mixed).as("was_nan"),
                (mixed === Double.PositiveInfinity).as("was_inf"),
                clamped.as("ratio"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("ratio")).as("n_finite"),
          count(when(col("was_nan"), lit(1))).as("n_nan"),
          count(when(col("was_inf"), lit(1))).as("n_inf"),
          dsum(coalesce(col("ratio"), lit(0.0)), 4).as("sum_filled"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      WITH gen AS (
        SELECT l_returnflag,
               CASE WHEN l_linenumber % 2 = 1
                    THEN exp((l_quantity - 20.0) * 100.0)
                    ELSE exp((l_quantity - 20.0) * 100.0) - exp((l_quantity - 20.0) * 100.0)
               END AS mixed
        FROM lineitem),
      scrubbed AS (
        SELECT l_returnflag,
               isnan(mixed) AS was_nan,
               mixed = 'infinity'::DOUBLE AS was_inf,
               CASE WHEN isnan(mixed) OR isinf(mixed) THEN NULL
                    ELSE least(mixed, 1e6) END AS ratio
        FROM gen)
      SELECT l_returnflag,
             count(*) AS n_rows,
             count(ratio) AS n_finite,
             count(CASE WHEN was_nan THEN 1 END) AS n_nan,
             count(CASE WHEN was_inf THEN 1 END) AS n_inf,
             ${sqlDsum("coalesce(ratio, 0.0)", 4)} AS sum_filled
      FROM scrubbed
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """.stripMargin.trim))

  /** q45: schema-aligning union — `pl.concat(how="diagonal_relaxed")` of
    * frames with differing columns (reference `stages/hierarchy/unify.py:107`
    * unifying loans + contingents + facility_undrawn into one exposures
    * frame) → `unionByName(allowMissingColumns=true)`, with the
    * exposure_type discriminator column the reference adds.
    */
  val q45UnionDiagonal = QueryDef(
    "q45_union_diagonal",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val loans = o.select(
        concat(lit("ORD-"), col("o_orderkey").cast("string")).as("exposure_reference"),
        lit("loan").as("exposure_type"),
        q2(col("o_totalprice")).as("drawn_amount"))
      val contingents = li.filter(col("l_linenumber") === 1).select(
        concat(lit("LI-"), col("l_orderkey").cast("string")).as("exposure_reference"),
        lit("contingent").as("exposure_type"),
        q2(col("l_extendedprice")).as("nominal_amount"))
      loans.unionByName(contingents, allowMissingColumns = true)
        .groupBy(col("exposure_type"))
        .agg(count(lit(1)).as("n"),
             dsum(coalesce(col("drawn_amount"), lit(0.0)), 2).as("drawn_total"),
             dsum(coalesce(col("nominal_amount"), lit(0.0)), 2).as("nominal_total"))
        .orderBy(col("exposure_type"))
    },
    Some(s"""
      WITH unified AS (
        SELECT 'ORD-' || CAST(o_orderkey AS VARCHAR) AS exposure_reference,
               'loan' AS exposure_type,
               ${sql2("o_totalprice")} AS drawn_amount,
               NULL::DOUBLE AS nominal_amount
        FROM orders
        UNION ALL BY NAME
        SELECT 'LI-' || CAST(l_orderkey AS VARCHAR) AS exposure_reference,
               'contingent' AS exposure_type,
               NULL::DOUBLE AS drawn_amount,
               ${sql2("l_extendedprice")} AS nominal_amount
        FROM lineitem WHERE l_linenumber = 1)
      SELECT exposure_type, count(*) AS n,
             ${sqlDsum("coalesce(drawn_amount, 0.0)", 2)} AS drawn_total,
             ${sqlDsum("coalesce(nominal_amount, 0.0)", 2)} AS nominal_total
      FROM unified
      GROUP BY exposure_type
      ORDER BY exposure_type
    """.stripMargin.trim))

  val all: Seq[QueryDef] = Seq(
    q40WhenChain, q41MathBattery, q42StringBattery, q43DateBattery,
    q44NullScrub, q45UnionDiagonal)
}
