package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.DomainPipeline
import graft.sources.Tables
import graft.functions.{normal, NormalMath}
import Q._

/** RWA-domain battery: the reference's regulatory calculators re-expressed
  * over the harness star schema (orders ≅ exposures, customer ≅
  * counterparties, nation/region ≅ country hierarchy). These exercise the
  * same operator composition the real pipeline uses end-to-end:
  * unify → enrich joins → classify when-chain → CCF → risk-weight lookup →
  * rwa = ead×rw → summary aggregation (SURVEY.md §7.2 minimum slice), and
  * the IRB capital formula through the custom norm_cdf/norm_ppf
  * expressions (reference `engine/irb/formulas.py:844-884`).
  */
object Rwa {

  /** q50: the flagship — SA RWA mini-pipeline (reference
    * `engine/pipeline.py:184-210` orchestration; classifier
    * `stages/classify`; CCF `engine/ccf.py`; SA risk weights
    * `engine/sa/risk_weights.py`; aggregator `engine/aggregator/_summaries.py`).
    * Single scan of the fact side, all dimension/rule joins broadcast, one
    * shuffle at the final summary — the plan shape that holds at 100 TB.
    */
  val q50SaRwaFlagship = QueryDef(
    "q50_sa_rwa_flagship",
    (s, dir) => {
      import s.implicits._
      // rulepack-as-data: CCF by status, RW by (class, size band)
      val ccfRules = Seq(
        ("O", 0.75), ("F", 1.0), ("P", 0.5)
      ).toDF("ccf_status", "ccf")
      val rwRules = Seq(
        ("retail", "small", 0.75), ("retail", "large", 1.00),
        ("corporate", "small", 1.00), ("corporate", "large", 1.50),
        ("sovereign", "small", 0.00), ("sovereign", "large", 0.20)
      ).toDF("rw_class", "rw_band", "risk_weight")

      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)

      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        // classifier when-chain (reference stages/classify cascade)
        .withColumn("exposure_class",
          when(col("n_name").isin("UNITED STATES", "GERMANY", "CHINA") &&
               col("c_acctbal") > 9000, "sovereign")
            .when(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
                  col("o_totalprice") < 50000, "retail")
            .otherwise("corporate"))
        .withColumn("size_band",
          when(col("o_totalprice") < 150000, "small").otherwise("large"))
        // CCF resolution (drawn ⇒ EAD = amount × ccf)
        .join(broadcast(ccfRules), col("o_orderstatus") === col("ccf_status"), "left")
        .withColumn("ead", col("o_totalprice") * coalesce(col("ccf"), lit(1.0)))
        // SA risk-weight decision table
        .join(broadcast(rwRules),
              col("exposure_class") === col("rw_class") &&
              col("size_band") === col("rw_band"), "left")
        .withColumn("rwa", col("ead") * coalesce(col("risk_weight"), lit(1.0)))
        // aggregator summary
        .groupBy(col("exposure_class"))
        .agg(
          count(lit(1)).as("n_exposures"),
          dsum(col("ead"), 6).as("total_ead"),
          dsum(col("rwa"), 6).as("total_rwa"),
          (dsum(col("rwa"), 6) / dsum(col("ead"), 6)).as("avg_rw"))
        .orderBy(col("exposure_class"))
    },
    Some(s"""
      WITH ccf_rules(ccf_status, ccf) AS (VALUES ('O', 0.75), ('F', 1.0), ('P', 0.5)),
      rw_rules(rw_class, rw_band, risk_weight) AS (VALUES
        ('retail','small',0.75), ('retail','large',1.00),
        ('corporate','small',1.00), ('corporate','large',1.50),
        ('sovereign','small',0.00), ('sovereign','large',0.20)),
      enriched AS (
        SELECT o.*, c.c_acctbal, c.c_mktsegment, n.n_name
        FROM orders o
        LEFT JOIN customer c ON o_custkey = c_custkey
        LEFT JOIN nation n ON c_nationkey = n_nationkey),
      classified AS (
        SELECT *,
          CASE WHEN n_name IN ('UNITED STATES','GERMANY','CHINA') AND c_acctbal > 9000
               THEN 'sovereign'
               WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') AND o_totalprice < 50000
               THEN 'retail'
               ELSE 'corporate' END AS exposure_class,
          CASE WHEN o_totalprice < 150000 THEN 'small' ELSE 'large' END AS size_band
        FROM enriched),
      ead_calc AS (
        SELECT classified.*, o_totalprice * coalesce(ccf, 1.0) AS ead
        FROM classified LEFT JOIN ccf_rules ON o_orderstatus = ccf_status),
      weighted AS (
        SELECT ead_calc.*, ead * coalesce(risk_weight, 1.0) AS rwa
        FROM ead_calc LEFT JOIN rw_rules
          ON exposure_class = rw_class AND size_band = rw_band)
      SELECT exposure_class,
             count(*) AS n_exposures,
             ${sqlDsum("ead", 6)} AS total_ead,
             ${sqlDsum("rwa", 6)} AS total_rwa,
             ${sqlDsum("rwa", 6)} / ${sqlDsum("ead", 6)} AS avg_rw
      FROM weighted
      GROUP BY exposure_class
      ORDER BY exposure_class
    """.stripMargin.trim))

  // ---- SQL replicas of the normal kernels (oracle side) ----------------
  // The oracle must evaluate the SAME op tree DuckDB-side that NormalMath
  // evaluates Spark-side, so the polynomial strings are generated from the
  // same coefficient arrays (transcription-proof).

  private val A = Seq(3.16112374387056560e0, 1.13864154151050156e2,
    3.77485237685302021e2, 3.20937758913846947e3, 1.85777706184603153e-1)
  private val B = Seq(2.36012909523441209e1, 2.44024637934444173e2,
    1.28261652607737228e3, 2.84423683343917062e3)
  private val C = Seq(5.64188496988670089e-1, 8.88314979438837594e0,
    6.61191906371416295e1, 2.98635138197400131e2, 8.81952221241769090e2,
    1.71204761263407058e3, 2.05107837782607147e3, 1.23033935479799725e3,
    2.15311535474403846e-8)
  private val D = Seq(1.57449261107098347e1, 1.17693950891312499e2,
    5.37181101862009858e2, 1.62138957456669019e3, 3.29079923573345963e3,
    4.36261909014324716e3, 3.43936767414372164e3, 1.23033935480374942e3)
  private val IA = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02, -3.066479806614716e+01,
    2.506628277459239e+00)
  private val IB = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)

  /** CALERF-style Horner chain: start `last*v`, fold +coef then *v. */
  private def horner(last: String, coefs: Seq[String], v: String): String =
    coefs.foldLeft(s"($last)*$v")((acc, c) => s"($acc+($c))*$v")

  /** erf(ax) for 0 <= ax <= 0.46875 (Cody branch 1), SQL string.
    * xnum starts at A4*z, xden at z (written 1.0*z), each folding 3 coefs.
    */
  private[queries] def sqlErf1(ax: String, z: String): String = {
    val num = horner(A(4).toString, A.take(3).map(_.toString), z)
    val den = horner("1.0", B.take(3).map(_.toString), z)
    s"($ax)*(($num)+(${A(3)}))/(($den)+(${B(3)}))"
  }

  /** erfc(ax) for 0.46875 < ax <= 4 (Cody branch 2), SQL string. */
  private[queries] def sqlErfc2(ax: String): String = {
    val num = s"(${horner(C(8).toString, C.take(7).map(_.toString), ax)})+(${C(7)})"
    val den = s"(${horner("1.0", D.take(7).map(_.toString), ax)})+(${D(7)})"
    val xsq = s"(floor(($ax)*16.0)/16.0)"
    s"exp(-$xsq*$xsq)*exp(-((($ax)-$xsq)*(($ax)+$xsq)))*(($num)/($den))"
  }

  /** Φ(x) = 0.5*erfc(-x/√2), branches 1+2 (valid for |x| ≤ 5.65), SQL. */
  private[queries] def sqlNormCdf(x: String): String = {
    val t = s"(-($x)*0.7071067811865476)"
    val ax = s"abs($t)"
    val z = s"($ax*$ax)"
    val r = s"(CASE WHEN $ax <= 0.46875 THEN 1.0-(${sqlErf1(ax, z)}) " +
      s"ELSE ${sqlErfc2(ax)} END)"
    s"0.5*(CASE WHEN $t < 0 THEN 2.0-$r ELSE $r END)"
  }

  /** Φ⁻¹(p), Acklam CENTRAL branch only (valid for p ∈ [0.02425, 0.97575]). */
  private[queries] def sqlNormPpfCentral(p: String): String = {
    val q = s"(($p)-0.5)"
    val r = s"($q*$q)"
    val num = s"(${horner(IA(0).toString, IA.slice(1, 5).map(_.toString), r)})+(${IA(5)})"
    val den = s"(${horner(IB(0).toString, IB.slice(1, 4).map(_.toString), r)})+(${IB(4)})"
    s"(($num)*$q)/(($den)*$r+1.0)"
  }

  /** q51: IRB capital kernel — the Basel corporate K formula per exposure
    * through the custom norm_cdf/norm_ppf expressions, then aggregated
    * (reference `engine/irb/formulas.py:844-884`: correlation, maturity
    * adjustment b(pd), K, RWA = K·12.5·1.06·EAD). PD is driven off
    * l_discount so it stays in Acklam's central branch; the DuckDB oracle
    * replicates the identical published polynomials op-for-op.
    */
  val q51IrbKernel = QueryDef(
    "q51_irb_kernel",
    (s, dir) => {
      val g999 = NormalMath.normPpf(0.999) // inlined constant, both sides
      val li = Tables.lineitem(s, dir)
      val pd = col("l_discount") + lit(0.03)
      val lgd = lit(0.45)
      val expTerm = (lit(1.0) - exp(lit(-50.0) * col("pd"))) / (lit(1.0) - exp(lit(-50.0)))
      val df = li.select(
          col("l_returnflag"), col("l_extendedprice").as("ead"),
          pd.as("pd"), (lit(1.0) + col("l_linenumber") * lit(0.5)).as("m"))
        .withColumn("r_corr",
          lit(0.12) * expTerm + lit(0.24) * (lit(1.0) - expTerm))
        .withColumn("b_adj", pow(lit(0.11852) - lit(0.05478) * log(col("pd")), 2.0))
        .withColumn("g",
          sqrt(lit(1.0) / (lit(1.0) - col("r_corr"))) * normal.norm_ppf(col("pd")) +
          sqrt(col("r_corr") / (lit(1.0) - col("r_corr"))) * lit(g999))
        .withColumn("k",
          lgd * (normal.norm_cdf(col("g")) - col("pd")) *
          (lit(1.0) + (col("m") - lit(2.5)) * col("b_adj")) /
          (lit(1.0) - lit(1.5) * col("b_adj")))
        .withColumn("rwa", col("k") * lit(12.5) * lit(1.06) * col("ead"))
      df.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          dsum(q6(col("k")), 6).as("sum_k"),
          dsum(q2(col("rwa")), 2).as("total_rwa"))
        .orderBy(col("l_returnflag"))
    },
    Some {
      val g999 = NormalMath.normPpf(0.999)
      s"""
      WITH base AS (
        SELECT l_returnflag, l_extendedprice AS ead,
               l_discount + 0.03 AS pd,
               1.0 + l_linenumber * 0.5 AS m
        FROM lineitem),
      corr AS (
        SELECT *,
          0.12 * ((1.0 - exp(-50.0 * pd)) / (1.0 - exp(-50.0))) +
          0.24 * (1.0 - ((1.0 - exp(-50.0 * pd)) / (1.0 - exp(-50.0)))) AS r_corr,
          pow(0.11852 - 0.05478 * ln(pd), 2.0) AS b_adj
        FROM base),
      garg AS (
        SELECT *,
          sqrt(1.0 / (1.0 - r_corr)) * (${sqlNormPpfCentral("pd")}) +
          sqrt(r_corr / (1.0 - r_corr)) * ($g999) AS g
        FROM corr),
      kcalc AS (
        SELECT *,
          0.45 * ((${sqlNormCdf("g")}) - pd) *
          (1.0 + (m - 2.5) * b_adj) / (1.0 - 1.5 * b_adj) AS k
        FROM garg),
      final AS (SELECT *, k * 12.5 * 1.06 * ead AS rwa FROM kcalc)
      SELECT l_returnflag, count(*) AS n,
             ${sqlDsum(sql6("k"), 6)} AS sum_k,
             ${sqlDsum(sql2("rwa"), 2)} AS total_rwa
      FROM final
      GROUP BY l_returnflag
      ORDER BY l_returnflag
      """.stripMargin.trim
    })

  /** q52: Basel 3.1 output floor — portfolio scalars U-TREA (modelled) and
    * S-TREA (standardised), floored total = max(U, 72.5%·S), and the
    * pro-rata distribution of the floor uplift back to class grain
    * (reference `engine/aggregator/_floor.py` ~480 LoC). Two single-row
    * aggregates broadcast onto the class summary — no extra shuffle of
    * exposure rows at any scale.
    */
  val q52OutputFloor = QueryDef(
    "q52_output_floor",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val base = o.select(
        when(col("o_orderstatus") === "F", "settled")
          .when(col("o_totalprice") > 150000, "large").otherwise("standard")
          .as("exposure_class"),
        (col("o_totalprice") * lit(0.60)).as("irb_rwa"),
        (col("o_totalprice") * lit(1.0)).as("sa_rwa"))
      val perClass = base.groupBy(col("exposure_class"))
        .agg(dsum(col("irb_rwa"), 6).as("class_irb"),
             dsum(col("sa_rwa"), 6).as("class_sa"),
             count(lit(1)).as("n"))
      val totals = base.agg(
        dsum(col("irb_rwa"), 6).as("u_trea"),
        dsum(col("sa_rwa"), 6).as("s_trea"))
      perClass.crossJoin(broadcast(totals))
        .select(
          col("exposure_class"), col("n"),
          q2(col("class_irb")).as("unfloored_rwa"),
          q2(greatest(col("u_trea"), col("s_trea") * lit(0.725))).as("floored_total"),
          q2(col("class_irb") *
             (greatest(col("u_trea"), col("s_trea") * lit(0.725)) / col("u_trea")))
            .as("floored_rwa"),
          (col("u_trea") < col("s_trea") * lit(0.725)).as("floor_binds"))
        .orderBy(col("exposure_class"))
    },
    Some(s"""
      WITH base AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 'settled'
                    WHEN o_totalprice > 150000 THEN 'large'
                    ELSE 'standard' END AS exposure_class,
               o_totalprice * 0.60 AS irb_rwa,
               o_totalprice * 1.0 AS sa_rwa
        FROM orders),
      per_class AS (
        SELECT exposure_class,
               ${sqlDsum("irb_rwa", 6)} AS class_irb,
               ${sqlDsum("sa_rwa", 6)} AS class_sa,
               count(*) AS n
        FROM base GROUP BY exposure_class),
      totals AS (
        SELECT ${sqlDsum("irb_rwa", 6)} AS u_trea,
               ${sqlDsum("sa_rwa", 6)} AS s_trea
        FROM base)
      SELECT exposure_class, n,
             ${sql2("class_irb")} AS unfloored_rwa,
             ${sql2("greatest(u_trea, s_trea * 0.725)")} AS floored_total,
             ${sql2("class_irb * (greatest(u_trea, s_trea * 0.725) / u_trea)")} AS floored_rwa,
             u_trea < s_trea * 0.725 AS floor_binds
      FROM per_class CROSS JOIN totals
      ORDER BY exposure_class
    """.stripMargin.trim))

  /** q53: SME supporting factor — lending-group drawn totals via a window
    * sum (no self-join, reference `engine/supporting_factors.py:456-560`
    * `sum().over("_sme_group_key")`; CRR Art. 501 factor bands), factor
    * applied per exposure, aggregated per band. One shuffle on the group
    * key for the window, then the summary.
    */
  val q53SupportingFactor = QueryDef(
    "q53_supporting_factor",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
      val staged = o.select(
          col("o_custkey"), col("o_totalprice"),
          dsumOver(col("o_totalprice"), 2, w).as("group_drawn"))
        .withColumn("sf",
          when(col("group_drawn") <= 500000, 0.7619)
            .when(col("group_drawn") <= 1000000, 0.85)
            .otherwise(1.0))
      staged.groupBy(col("sf"))
        .agg(countDistinct(col("o_custkey")).as("n_groups"),
             count(lit(1)).as("n_exposures"),
             dsum(q2(col("o_totalprice") * lit(0.75) * col("sf")), 2).as("supported_rwa"))
        .orderBy(col("sf"))
    },
    Some(s"""
      WITH staged AS (
        SELECT o_custkey, o_totalprice,
               ${sqlDsumOver("o_totalprice", 2, "PARTITION BY o_custkey")} AS group_drawn
        FROM orders),
      banded AS (
        SELECT *, CASE WHEN group_drawn <= 500000 THEN 0.7619
                       WHEN group_drawn <= 1000000 THEN 0.85
                       ELSE 1.0 END AS sf
        FROM staged)
      SELECT sf, count(DISTINCT o_custkey) AS n_groups,
             count(*) AS n_exposures,
             ${sqlDsum(sql2("o_totalprice * 0.75 * sf"), 2)} AS supported_rwa
      FROM banded
      GROUP BY sf
      ORDER BY sf
    """.stripMargin.trim))

  /** q54: SFT FCCM E* at netting-set grain — E* = max(0, E(1+HE) −
    * C(1−HC)) per netting set, emitted as SYNTHETIC exposure rows and
    * unioned back into the exposure frame with `source_exposure_reference`
    * lineage (reference `engine/sft/fccm.py:315-545`; synthetic-row
    * discipline SURVEY §7.4). One groupBy on the netting-set key; the
    * union is schema-aligning, no shuffle.
    */
  val q54FccmNetting = QueryDef(
    "q54_fccm_netting",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val ns = o.groupBy(col("o_custkey").as("netting_set"))
        .agg(
          dsum(col("o_totalprice"), 6).as("e_gross"),
          dsum(col("o_totalprice") *
            when(col("o_orderstatus") === "F", 0.5).otherwise(0.0), 6).as("c_gross"))
        .select(
          concat(lit("NS-"), col("netting_set").cast("string")).as("exposure_reference"),
          concat(lit("NS-"), col("netting_set").cast("string")).as("source_exposure_reference"),
          lit("sft_net").as("exposure_type"),
          q2(greatest(lit(0.0),
            col("e_gross") * lit(1.01) - col("c_gross") * lit(0.85))).as("ead"))
      val direct = o.select(
        concat(lit("ORD-"), col("o_orderkey").cast("string")).as("exposure_reference"),
        lit(null).cast("string").as("source_exposure_reference"),
        lit("loan").as("exposure_type"),
        q2(col("o_totalprice")).as("ead"))
      direct.unionByName(ns)
        .groupBy(col("exposure_type"))
        .agg(count(lit(1)).as("n"),
             count(col("source_exposure_reference")).as("n_synthetic"),
             dsum(col("ead"), 2).as("total_ead"))
        .orderBy(col("exposure_type"))
    },
    Some(s"""
      WITH ns AS (
        SELECT 'NS-' || CAST(o_custkey AS VARCHAR) AS exposure_reference,
               'NS-' || CAST(o_custkey AS VARCHAR) AS source_exposure_reference,
               'sft_net' AS exposure_type,
               ${sql2(s"greatest(0.0, ${sqlDsum("o_totalprice", 6)} * 1.01 - " +
                 s"${sqlDsum("o_totalprice * (CASE WHEN o_orderstatus = 'F' THEN 0.5 ELSE 0.0 END)", 6)} * 0.85)")} AS ead
        FROM orders GROUP BY o_custkey),
      direct AS (
        SELECT 'ORD-' || CAST(o_orderkey AS VARCHAR) AS exposure_reference,
               NULL::VARCHAR AS source_exposure_reference,
               'loan' AS exposure_type,
               ${sql2("o_totalprice")} AS ead
        FROM orders),
      unified AS (SELECT * FROM direct UNION ALL SELECT * FROM ns)
      SELECT exposure_type, count(*) AS n,
             count(source_exposure_reference) AS n_synthetic,
             ${sqlDsum("ead", 2)} AS total_ead
      FROM unified
      GROUP BY exposure_type
      ORDER BY exposure_type
    """.stripMargin.trim))

  /** q55: RE-split — each exposure splits into covered/uncovered sub-rows
    * (explode of a struct array) carrying `parent_exposure_reference`
    * lineage, then the reconciliation-side collapse back to key grain
    * proves conservation (reference `stages/re_split`;
    * `engine/aggregator/_collapse.py` aggregate_to_key_grain). Generators
    * run inside the scan stage; conservation is checked in the output.
    */
  val q55ReSplit = QueryDef(
    "q55_re_split",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val split = o.select(
          concat(lit("ORD-"), col("o_orderkey").cast("string"))
            .as("parent_exposure_reference"),
          col("o_totalprice"),
          explode(array(
            struct(lit("covered").as("kind"), lit(0.3).as("share")),
            struct(lit("uncovered").as("kind"), lit(0.7).as("share")))).as("leg"))
        .select(col("parent_exposure_reference"),
          col("leg.kind").as("kind"),
          (col("o_totalprice") * col("leg.share")).as("leg_ead"))
      val collapsed = split.groupBy(col("parent_exposure_reference"))
        .agg(dsum(col("leg_ead"), 6).as("parent_ead"),
             count(lit(1)).as("n_legs"))
      val byKind = split.groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), dsum(col("leg_ead"), 6).as("total_ead"))
        .select(col("kind").as("grp"), col("n"), col("total_ead"))
      val conservation = collapsed.agg(
        lit("collapsed_total").as("grp"),
        count(lit(1)).as("n"),
        dsum(col("parent_ead"), 6).as("total_ead"))
      byKind.unionByName(conservation).orderBy(col("grp"))
    },
    Some(s"""
      WITH split AS (
        SELECT 'ORD-' || CAST(o_orderkey AS VARCHAR) AS parent_exposure_reference,
               leg.kind AS kind,
               o_totalprice * leg.share AS leg_ead
        FROM orders,
             unnest([struct_pack(kind := 'covered', share := CAST(0.3 AS DOUBLE)),
                     struct_pack(kind := 'uncovered', share := CAST(0.7 AS DOUBLE))]) AS t(leg)),
      collapsed AS (
        SELECT parent_exposure_reference,
               ${sqlDsum("leg_ead", 6)} AS parent_ead, count(*) AS n_legs
        FROM split GROUP BY 1),
      by_kind AS (
        SELECT kind AS grp, count(*) AS n, ${sqlDsum("leg_ead", 6)} AS total_ead
        FROM split GROUP BY 1),
      conservation AS (
        SELECT 'collapsed_total' AS grp, count(*) AS n,
               ${sqlDsum("parent_ead", 6)} AS total_ead
        FROM collapsed)
      SELECT * FROM by_kind UNION ALL SELECT * FROM conservation
      ORDER BY grp
    """.stripMargin.trim))

  /** Transitional output-floor phase-in factors, one row per calendar
    * year (reference `contracts/config.py:232-235`: 60% in 2027 rising to
    * the fully-phased 72.5% in 2030; `analysis/transition.py` sweeps the
    * pipeline across these dates). Shared Scala data compiled to BOTH the
    * Spark frame and the oracle's VALUES clause. */
  val floorSchedule: Seq[(Int, Double)] = Seq(
    2027 -> 0.60, 2028 -> 0.65, 2029 -> 0.70, 2030 -> 0.725)

  /** q101: transitional output-floor schedule — the year-by-year floor
    * timeline (reference `analysis/transition.py:87-147`,
    * `contracts/bundles.py:1020-1053` TransitionalScheduleBundle). The
    * portfolio totals (U-TREA modelled / S-TREA standardised, the q52
    * machinery) are computed ONCE as a 1-row aggregate and broadcast onto
    * the 4-row schedule — at 100 TB the exposure scan happens once, not
    * once per phase-in year (the reference re-runs the full pipeline per
    * year because effective maturity shifts; our synthetic book is
    * date-invariant, so the single-scan sweep is exact). */
  val q101FloorSchedule = QueryDef(
    "q101_floor_schedule",
    (s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val base = o.select(
        (col("o_totalprice") * lit(0.60)).as("irb_rwa"),
        (col("o_totalprice") * lit(1.0)).as("sa_rwa"))
      val totals = base.agg(
        dsum(col("irb_rwa"), 6).as("u_trea"),
        dsum(col("sa_rwa"), 6).as("s_trea"))
      val years = floorSchedule.toDF("phase_year", "floor_percentage")
      years.crossJoin(broadcast(totals))
        .select(
          col("phase_year"), col("floor_percentage"),
          q2(col("u_trea")).as("unfloored_rwa"),
          q2(col("s_trea")).as("sa_rwa"),
          q2(greatest(col("u_trea"), col("s_trea") * col("floor_percentage")))
            .as("floored_rwa"),
          q2(greatest(lit(0.0),
            col("s_trea") * col("floor_percentage") - col("u_trea")))
            .as("floor_impact"),
          (col("u_trea") < col("s_trea") * col("floor_percentage"))
            .as("floor_binds"))
        .orderBy(col("phase_year"))
    },
    Some(s"""
      WITH schedule(phase_year, floor_percentage) AS (VALUES ${
        floorSchedule.map { case (y, p) => s"($y, CAST($p AS DOUBLE))" }.mkString(", ")}),
      base AS (
        SELECT o_totalprice * 0.60 AS irb_rwa,
               o_totalprice * 1.0 AS sa_rwa
        FROM orders),
      totals AS (
        SELECT ${sqlDsum("irb_rwa", 6)} AS u_trea,
               ${sqlDsum("sa_rwa", 6)} AS s_trea
        FROM base)
      SELECT phase_year, floor_percentage,
             ${sql2("u_trea")} AS unfloored_rwa,
             ${sql2("s_trea")} AS sa_rwa,
             ${sql2("greatest(u_trea, s_trea * floor_percentage)")} AS floored_rwa,
             ${sql2("greatest(0.0, s_trea * floor_percentage - u_trea)")} AS floor_impact,
             u_trea < s_trea * floor_percentage AS floor_binds
      FROM schedule CROSS JOIN totals
      ORDER BY phase_year
    """.stripMargin.trim))

  /** q111: Financial Collateral Simple Method — CRR Art. 222 (reference
    * `engine/crm/simple_method.py`): the collateralised fraction takes
    * the COLLATERAL's risk weight floored at 20% per item
    * (Art. 222(1)/(3)), with the Art. 222(4) same-currency carve-out to
    * 0% for cash and 0%-RW sovereign paper; EAD is NOT reduced (that is
    * the Comprehensive Method's mechanism — q54/q104). Items allocate
    * against EAD lowest-RW-first (most beneficial) via the ordered
    * cumulative-sum waterfall; the remainder stays at the obligor RW.
    */
  val q111SimpleMethod = QueryDef(
    "q111_simple_method",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val expo = o.select(
        concat(lit("ORD-"), col("o_orderkey").cast("string")).as("exposure_reference"),
        col("o_totalprice").as("ead"),
        when(col("o_orderkey") % 3 === 0, 0.5).when(col("o_orderkey") % 3 === 1, 1.0)
          .otherwise(1.5).as("own_rw"))
      val items = li.filter(col("l_returnflag") === "R" && col("l_linenumber") === 1)
        .select(
          concat(lit("ORD-"), col("l_orderkey").cast("string")).as("exposure_reference"),
          concat(lit("FC-"), col("l_orderkey").cast("string"), lit("-"),
            col("l_partkey").cast("string")).as("item_ref"),
          when(col("l_partkey") % 3 === 0, "cash")
            .when(col("l_partkey") % 3 === 1, "sovereign_cqs1")
            .otherwise("institution_cqs2").as("issuer_type"),
          q2(col("l_extendedprice") * 0.4).as("value"),
          (col("l_suppkey") % 2 === 0).as("same_currency"))
        .withColumn("item_rw",
          when(col("issuer_type").isin("cash", "sovereign_cqs1"), 0.0).otherwise(0.3))
        .withColumn("secured_rw",
          when(col("item_rw") === 0.0 && col("same_currency"), 0.0)
            .otherwise(greatest(col("item_rw"), lit(0.2))))
      val wWf = org.apache.spark.sql.expressions.Window
        .partitionBy(col("exposure_reference"))
        .orderBy(col("secured_rw"), col("item_ref"), col("value"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val alloc = items.join(expo, Seq("exposure_reference"))
        .withColumn("cum", dsumOver(col("value"), 2, wWf))
        .withColumn("allocated",
          q2(greatest(lit(0.0), least(col("value"), col("ead") - (col("cum") - col("value"))))))
      val byIssuer = alloc.groupBy(col("issuer_type")).agg(
        count(lit(1)).as("n_items"),
        dsum(col("allocated"), 2).as("covered"),
        dsum(q2(col("allocated") * col("secured_rw")), 2).as("rwa"))
      val unsec = alloc.groupBy(col("exposure_reference"), col("ead"), col("own_rw"))
        .agg(dsum(col("allocated"), 2).as("covered"))
        .select(lit("unsecured_remainder").as("issuer_type"),
          col("ead"), col("own_rw"), col("covered"))
        .groupBy(col("issuer_type")).agg(
          count(lit(1)).as("n_items"),
          dsum(q2(col("ead") - col("covered")), 2).as("covered"),
          dsum(q2(q2(col("ead") - col("covered")) * col("own_rw")), 2).as("rwa"))
      byIssuer.unionByName(unsec).orderBy(col("issuer_type"))
    },
    Some(s"""
      WITH expo AS (
        SELECT 'ORD-' || CAST(o_orderkey AS VARCHAR) AS exposure_reference,
               o_totalprice AS ead,
               CASE WHEN o_orderkey % 3 = 0 THEN 0.5
                    WHEN o_orderkey % 3 = 1 THEN 1.0 ELSE 1.5 END AS own_rw
        FROM orders),
      items AS (
        SELECT 'ORD-' || CAST(l_orderkey AS VARCHAR) AS exposure_reference,
               'FC-' || CAST(l_orderkey AS VARCHAR) || '-' ||
                 CAST(l_partkey AS VARCHAR) AS item_ref,
               CASE WHEN l_partkey % 3 = 0 THEN 'cash'
                    WHEN l_partkey % 3 = 1 THEN 'sovereign_cqs1'
                    ELSE 'institution_cqs2' END AS issuer_type,
               ${sql2("l_extendedprice * 0.4")} AS value,
               (l_suppkey % 2 = 0) AS same_currency
        FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber = 1),
      rwd AS (
        SELECT *,
          CASE WHEN issuer_type IN ('cash', 'sovereign_cqs1') THEN 0.0
               ELSE 0.3 END AS item_rw
        FROM items),
      secured AS (
        SELECT *,
          CASE WHEN item_rw = 0.0 AND same_currency THEN 0.0
               ELSE greatest(item_rw, 0.2) END AS secured_rw
        FROM rwd),
      wf AS (
        SELECT s.*, e.ead, e.own_rw,
          ${sqlDsumOver("value", 2,
            "PARTITION BY s.exposure_reference " +
            "ORDER BY secured_rw, item_ref, value ROWS UNBOUNDED PRECEDING")} AS cum
        FROM secured s JOIN expo e USING (exposure_reference)),
      alloc AS (
        SELECT *,
          ${sql2("greatest(0.0, least(value, ead - (cum - value)))")} AS allocated
        FROM wf),
      by_issuer AS (
        SELECT issuer_type, count(*) AS n_items,
               ${sqlDsum("allocated", 2)} AS covered,
               ${sqlDsum(sql2("allocated * secured_rw"), 2)} AS rwa
        FROM alloc GROUP BY issuer_type),
      per_expo AS (
        SELECT exposure_reference, ead, own_rw,
               ${sqlDsum("allocated", 2)} AS covered
        FROM alloc GROUP BY exposure_reference, ead, own_rw),
      unsec AS (
        SELECT 'unsecured_remainder' AS issuer_type, count(*) AS n_items,
               ${sqlDsum(sql2("ead - covered"), 2)} AS covered,
               ${sqlDsum(sql2(sql2("ead - covered") + " * own_rw"), 2)} AS rwa
        FROM per_expo)
      SELECT * FROM (
        SELECT * FROM by_issuer UNION ALL SELECT * FROM unsec)
      ORDER BY issuer_type
    """.stripMargin.trim))

  // ---- q165: SA pre-ladder CQS lifts + EU domestic-currency 0% ---------

  /** q165: the pre-ladder adjustments the SA risk-weight lookup applies
    * BEFORE the CQS ladder join (reference `engine/sa/cqs_lift.py`,
    * `engine/sa/central_bank.py`, `engine/eu_sovereign.py`):
    *
    *  - named MDBs take the Art. 117(2) 0% without touching a ladder;
    *  - EU central-government exposures denominated in the member
    *    state's domestic currency take the Art. 114(4) 0% regardless of
    *    rating (the domestic-currency match is the eligibility gate);
    *  - non-named MDBs (Art. 117(1)) and demoted non-qualifying CCPs
    *    (Art. 107(2)(a)) LIFT the counterparty-carried institution CQS
    *    into the exposure's own cqs and then ride the ordinary
    *    institution ladder — a lift never fabricates a rating: a null
    *    source leaves cqs null and the row keeps its unrated fallback;
    *  - central banks lift the SOVEREIGN's CQS (Art. 114(2A)) onto the
    *    sovereign ladder;
    *  - everything else rides its own ladder on its own rating.
    *
    * Scale shape: the lifts are pure when-chain projections in the scan;
    * ONE broadcast ladder join serves every lifted and unlifted row; one
    * census shuffle.
    */
  val q165SaPreladder = QueryDef(
    "q165_sa_preladder",
    (s, dir) => {
      import s.implicits._
      val rw = broadcast(DomainPipeline.rwTable.toDF("rw_class", "rw_cqs", "rw"))
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val book = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(
          when(col("c_custkey") % 7 === 0, "named_mdb")
            .when(col("c_custkey") % 7 === 1, "non_named_mdb")
            .when(col("c_custkey") % 7 === 2, "nonq_ccp")
            .when(col("c_custkey") % 7 === 3, "central_bank")
            .when(col("c_custkey") % 7 === 4, "eu_sovereign")
            .otherwise("corporate").as("entity_kind"),
          (lit(1) + col("c_custkey") % 6).cast("int").as("cp_institution_cqs"),
          (lit(1) + col("c_nationkey") % 6).cast("int").as("cp_sovereign_cqs"),
          when(col("o_orderkey") % 5 === 0, lit(null).cast("int"))
            .otherwise((lit(1) + col("o_orderkey") % 6).cast("int"))
            .as("own_cqs"),
          (col("o_orderkey") % 3 === 0).as("domestic_ccy"),
          q2(col("o_totalprice")).as("ead"))
      val lifted = book
        .withColumn("treatment",
          when(col("entity_kind") === "named_mdb", "art117_2_named_mdb_0pct")
            .when(col("entity_kind") === "eu_sovereign" && col("domestic_ccy"),
              "art114_4_domestic_0pct")
            .when(col("entity_kind") === "non_named_mdb",
              "art117_1_institution_ladder")
            .when(col("entity_kind") === "nonq_ccp",
              "art107_2a_institution_ladder")
            .when(col("entity_kind") === "central_bank",
              "art114_2a_sovereign_ladder")
            .when(col("entity_kind") === "eu_sovereign", "sovereign_ladder")
            .otherwise("corporate_ladder"))
        .withColumn("ladder_class",
          when(col("treatment").endsWith("institution_ladder"), "institution")
            .when(col("treatment").endsWith("sovereign_ladder"), "sovereign")
            .when(col("treatment") === "corporate_ladder", "corporate"))
        .withColumn("cqs",
          when(col("treatment").endsWith("institution_ladder"),
            col("cp_institution_cqs"))
            .when(col("treatment") === "art114_2a_sovereign_ladder",
              col("cp_sovereign_cqs"))
            .otherwise(col("own_cqs")))
      lifted
        .join(rw, col("ladder_class") === col("rw_class") &&
          col("cqs") === col("rw_cqs"), "left")
        .withColumn("risk_weight",
          when(col("ladder_class").isNull, 0.0)
            .otherwise(coalesce(col("rw"), lit(1.0))))
        .groupBy(col("entity_kind"), col("treatment"))
        .agg(
          count(lit(1)).as("n_exposures"),
          count(when(col("ladder_class").isNotNull && col("cqs").isNull,
            lit(1))).as("n_unrated_fallback"),
          dsum(col("ead"), 2).as("total_ead"),
          dsum(q2(col("ead") * col("risk_weight")), 2).as("total_rwa"))
        .withColumn("avg_rw",
          when(col("total_ead") > 0, q6(col("total_rwa") / col("total_ead"))))
        .orderBy(col("entity_kind"), col("treatment"))
    },
    Some {
      val rwValues = DomainPipeline.rwTable
        .map { case (c0, q0, w) => s"('$c0', $q0, CAST($w AS DOUBLE))" }
        .mkString(", ")
      s"""
      WITH x165rw(rw_class, rw_cqs, rw) AS (VALUES $rwValues),
      x165book AS (
        SELECT CASE WHEN c_custkey % 7 = 0 THEN 'named_mdb'
                    WHEN c_custkey % 7 = 1 THEN 'non_named_mdb'
                    WHEN c_custkey % 7 = 2 THEN 'nonq_ccp'
                    WHEN c_custkey % 7 = 3 THEN 'central_bank'
                    WHEN c_custkey % 7 = 4 THEN 'eu_sovereign'
                    ELSE 'corporate' END AS entity_kind,
               CAST(1 + c_custkey % 6 AS INT) AS cp_institution_cqs,
               CAST(1 + c_nationkey % 6 AS INT) AS cp_sovereign_cqs,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE CAST(1 + o_orderkey % 6 AS INT) END AS own_cqs,
               o_orderkey % 3 = 0 AS domestic_ccy,
               ${sql2("o_totalprice")} AS ead
        FROM orders JOIN customer ON o_custkey = c_custkey),
      x165lift AS (
        SELECT *,
          CASE WHEN entity_kind = 'named_mdb' THEN 'art117_2_named_mdb_0pct'
               WHEN entity_kind = 'eu_sovereign' AND domestic_ccy
                 THEN 'art114_4_domestic_0pct'
               WHEN entity_kind = 'non_named_mdb'
                 THEN 'art117_1_institution_ladder'
               WHEN entity_kind = 'nonq_ccp'
                 THEN 'art107_2a_institution_ladder'
               WHEN entity_kind = 'central_bank'
                 THEN 'art114_2a_sovereign_ladder'
               WHEN entity_kind = 'eu_sovereign' THEN 'sovereign_ladder'
               ELSE 'corporate_ladder' END AS treatment
        FROM x165book),
      x165keyed AS (
        SELECT *,
          CASE WHEN treatment LIKE '%institution_ladder' THEN 'institution'
               WHEN treatment LIKE '%sovereign_ladder' THEN 'sovereign'
               WHEN treatment = 'corporate_ladder' THEN 'corporate' END
            AS ladder_class,
          CASE WHEN treatment LIKE '%institution_ladder'
                 THEN cp_institution_cqs
               WHEN treatment = 'art114_2a_sovereign_ladder'
                 THEN cp_sovereign_cqs
               ELSE own_cqs END AS cqs
        FROM x165lift),
      x165w AS (
        SELECT k.*,
          CASE WHEN k.ladder_class IS NULL THEN 0.0
               ELSE coalesce(r.rw, 1.0) END AS risk_weight
        FROM x165keyed k
        LEFT JOIN x165rw r
          ON k.ladder_class = r.rw_class AND k.cqs = r.rw_cqs)
      SELECT entity_kind, treatment,
             count(*) AS n_exposures,
             count(CASE WHEN ladder_class IS NOT NULL AND cqs IS NULL
                   THEN 1 END) AS n_unrated_fallback,
             ${sqlDsum("ead", 2)} AS total_ead,
             ${sqlDsum(sql2("ead * risk_weight"), 2)} AS total_rwa,
             CASE WHEN ${sqlDsum("ead", 2)} > 0
                  THEN ${sql6(s"${sqlDsum(sql2("ead * risk_weight"), 2)} / ${sqlDsum("ead", 2)}")}
                  END AS avg_rw
      FROM x165w
      GROUP BY entity_kind, treatment
      ORDER BY entity_kind, treatment
    """.stripMargin.trim
    })

  // ---- q167: regulatory-threshold FX resolution ------------------------

  /** q167: the monetary-threshold FX seam (reference
    * `engine/thresholds.py` + `rulebook/packs/{crr,b31}.py`
    * regulatory_thresholds): the packs hold FX-INVARIANT values — CRR
    * EUR bases with the fx_derived Feature ON so the engine applies the
    * run's EUR/GBP rate at the read site, Basel 3.1 PRA-native GBP with
    * the Feature OFF — and the classifier consumes the RESOLVED values.
    * Two sections:
    *
    *  - `threshold`: every bundle key under both regimes with its base
    *    and resolved-GBP value at the default 0.8732 rate (the single
    *    Decimal→Double boundary lives in the rulebook compile);
    *  - `consumer`: the SME-turnover classification census per regime
    *    over the counterparty book, plus the FLIP band — obligors whose
    *    turnover falls between the two regimes' resolved thresholds
    *    (EUR 50m × 0.8732 = 43.66m < GBP 44m), so the SAME book
    *    classifies differently per regime by exactly that band.
    */
  val q167ThresholdResolution = QueryDef(
    "q167_threshold_resolution",
    (s, dir) => {
      import s.implicits._
      import graft.rulebook.{Packs, Rulepack}
      val rate = Packs.DefaultEurGbpRate
      val rows = for {
        pack <- Seq(Packs.crr, Packs.b31)
        (name, base) <- pack.lookup("regulatory_thresholds").mapping
      } yield (pack.regime, name, base.toDouble,
        Packs.regulatoryThreshold(pack, name, rate))
      val thresholds = rows
        .toDF("regime", "key", "base_value", "resolved_gbp")
        .select(lit("threshold").as("section"), col("regime"), col("key"),
          col("base_value"), col("resolved_gbp"),
          lit(null).cast("long").as("n_obligors"))
      val crrSme = Packs.regulatoryThreshold(
        Packs.crr, "sme_turnover_threshold", rate)
      val b31Sme = Packs.regulatoryThreshold(
        Packs.b31, "sme_turnover_threshold", rate)
      val turnover = Tables.customer(s, dir)
        .select((col("c_acctbal") * 10000.0).as("turnover"))
      val census = turnover.agg(
        count(when(col("turnover") < crrSme, 1)).as("n_sme_crr"),
        count(when(col("turnover") < b31Sme, 1)).as("n_sme_b31"),
        count(when(col("turnover") >= crrSme && col("turnover") < b31Sme, 1))
          .as("n_flipped"))
      val consumer = census.selectExpr(
        s"""stack(3,
             'crr', 'sme_turnover_census', CAST($crrSme AS DOUBLE),
               CAST($crrSme AS DOUBLE), n_sme_crr,
             'b31', 'sme_turnover_census', CAST($b31Sme AS DOUBLE),
               CAST($b31Sme AS DOUBLE), n_sme_b31,
             'delta', 'flip_band', CAST($crrSme AS DOUBLE),
               CAST($b31Sme AS DOUBLE), n_flipped)
           AS (regime, key, base_value, resolved_gbp, n_obligors)""")
        .select(lit("consumer").as("section"), col("regime"), col("key"),
          col("base_value"), col("resolved_gbp"), col("n_obligors"))
      thresholds.unionByName(consumer)
        .orderBy(col("section"), col("regime"), col("key"))
    },
    Some {
      import graft.rulebook.Packs
      val rate = Packs.DefaultEurGbpRate
      val tRows = (for {
        pack <- Seq(Packs.crr, Packs.b31)
        (name, base) <- pack.lookup("regulatory_thresholds").mapping
      } yield s"('${pack.regime}', '$name', ${d(base.toDouble)}, " +
        s"${d(Packs.regulatoryThreshold(pack, name, rate))})")
        .mkString(",\n          ")
      val crrSme = Packs.regulatoryThreshold(
        Packs.crr, "sme_turnover_threshold", rate)
      val b31Sme = Packs.regulatoryThreshold(
        Packs.b31, "sme_turnover_threshold", rate)
      s"""
      WITH x167t(regime, key, base_value, resolved_gbp) AS (VALUES
          $tRows),
      x167turnover AS (
        SELECT c_acctbal * 10000.0 AS turnover FROM customer),
      x167census AS (
        SELECT count(CASE WHEN turnover < ${d(crrSme)} THEN 1 END) AS n_sme_crr,
               count(CASE WHEN turnover < ${d(b31Sme)} THEN 1 END) AS n_sme_b31,
               count(CASE WHEN turnover >= ${d(crrSme)}
                           AND turnover < ${d(b31Sme)} THEN 1 END) AS n_flipped
        FROM x167turnover)
      SELECT * FROM (
        SELECT 'threshold' AS section, regime, key, base_value, resolved_gbp,
               NULL::BIGINT AS n_obligors
        FROM x167t
        UNION ALL
        SELECT 'consumer', 'crr', 'sme_turnover_census',
               ${d(crrSme)}, ${d(crrSme)}, n_sme_crr FROM x167census
        UNION ALL
        SELECT 'consumer', 'b31', 'sme_turnover_census',
               ${d(b31Sme)}, ${d(b31Sme)}, n_sme_b31 FROM x167census
        UNION ALL
        SELECT 'consumer', 'delta', 'flip_band',
               ${d(crrSme)}, ${d(b31Sme)}, n_flipped FROM x167census)
      ORDER BY section, regime, key
    """.stripMargin.trim
    })

  private def d(v: Double): String = s"CAST($v AS DOUBLE)"

  val all: Seq[QueryDef] = Seq(
    q50SaRwaFlagship, q51IrbKernel, q52OutputFloor, q53SupportingFactor,
    q54FccmNetting, q55ReSplit, q101FloorSchedule, q111SimpleMethod,
    q165SaPreladder, q167ThresholdResolution)
}
