package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.rulebook.{BandedTable, LookupTable}
import Q._

/** CCR + CRM battery: the SA-CCR cross-bucket correlation roll-up, the
  * rulebook-compiled slotting calculator, the CRM three-level lookup
  * cascade, and guarantee substitution — the remaining large reference
  * calculator families (SURVEY.md §2.4 SA-CCR row, §2.3 CRM lookup joins,
  * `engine/crm/guarantees.py`).
  */
object Ccr {

  /** q56: SA-CCR hedging-set add-on with the supervisory correlation
    * formula — trade → bucket sums, then per asset class
    * AddOn = sqrt((ρ·ΣA)² + (1−ρ²)·ΣA²) across buckets, then the
    * netting-set roll-up (reference `engine/ccr/pfe.py:252,324-332,
    * 399-432,540-564`). Three chained aggregations, each output grain
    * strictly smaller — the multi-level shuffle cascade stays bounded by
    * key cardinality at any scale.
    */
  val q56SaCcrAddon = QueryDef(
    "q56_saccr_addon",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val rho = 0.5
      val buckets = li
        .select((col("l_orderkey") % 50).as("netting_set"),
          col("l_returnflag").as("asset_class"),
          col("l_linestatus").as("bucket"),
          (col("l_extendedprice") * col("l_discount")).as("adj_notional"))
        .groupBy(col("netting_set"), col("asset_class"), col("bucket"))
        .agg(dsum(col("adj_notional"), 6).as("bucket_addon"))
      val classes = buckets
        .groupBy(col("netting_set"), col("asset_class"))
        .agg(dsum(col("bucket_addon"), 6).as("sum_a"),
             dsum(col("bucket_addon") * col("bucket_addon"), 6).as("sum_a2"))
        .select(col("netting_set"), col("asset_class"),
          sqrt(
            (lit(rho) * col("sum_a")) * (lit(rho) * col("sum_a")) +
            (lit(1.0) - lit(rho) * lit(rho)) * col("sum_a2")).as("class_addon"))
      classes
        .groupBy(col("netting_set"))
        .agg(q2(dsum(q6(col("class_addon")), 6)).as("ns_addon"),
             count(lit(1)).as("n_classes"))
        .orderBy(col("netting_set"))
    },
    Some(s"""
      WITH buckets AS (
        SELECT l_orderkey % 50 AS netting_set,
               l_returnflag AS asset_class, l_linestatus AS bucket,
               ${sqlDsum("l_extendedprice * l_discount", 6)} AS bucket_addon
        FROM lineitem GROUP BY 1, 2, 3),
      classes AS (
        SELECT netting_set, asset_class,
               sqrt((0.5 * ${sqlDsum("bucket_addon", 6)}) * (0.5 * ${sqlDsum("bucket_addon", 6)}) +
                    (1.0 - 0.5 * 0.5) * ${sqlDsum("bucket_addon * bucket_addon", 6)}) AS class_addon
        FROM buckets GROUP BY 1, 2)
      SELECT netting_set,
             ${sql2(sqlDsum(sql6("class_addon"), 6))} AS ns_addon,
             count(*) AS n_classes
      FROM classes
      GROUP BY netting_set
      ORDER BY netting_set
    """.stripMargin.trim))

  /** q57: slotting calculator compiled FROM THE RULEBOOK — the maturity
    * band and category risk weights live as Rulepack data (BigDecimal at
    * rest) and compile to when-chains at query build (reference
    * `engine/slotting`; rulebook compilation `rulebook/compile.py`).
    * The oracle replicates the compiled chain, proving the compiler emits
    * the declared semantics.
    */
  val q57Slotting = QueryDef(
    "q57_slotting",
    (s, dir) => {
      val categoryRw = LookupTable(Seq(
        "1-URGENT" -> BigDecimal("0.70"), "2-HIGH" -> BigDecimal("0.90"),
        "3-MEDIUM" -> BigDecimal("1.15"), "4-NOT SPECIFIED" -> BigDecimal("1.50")),
        default = Some(BigDecimal("2.50")))
      val maturityUplift = BandedTable(
        bands = Seq(BigDecimal(50000) -> BigDecimal("0.95"),
                    BigDecimal(200000) -> BigDecimal("1.00")),
        terminal = BigDecimal("1.05"))
      val o = Tables.orders(s, dir)
      o.select(col("o_orderpriority"), col("o_totalprice"),
          categoryRw.toWhenChain(col("o_orderpriority")).as("base_rw"),
          maturityUplift.toWhenChain(col("o_totalprice")).as("uplift"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             dsum(q2(col("o_totalprice") * col("base_rw") * col("uplift")), 2).as("slotted_rwa"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""
      WITH slotted AS (
        SELECT o_orderpriority, o_totalprice,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 0.70
                    WHEN o_orderpriority = '2-HIGH' THEN 0.90
                    WHEN o_orderpriority = '3-MEDIUM' THEN 1.15
                    WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1.50
                    ELSE 2.50 END AS base_rw,
               CASE WHEN o_totalprice < 50000 THEN 0.95
                    WHEN o_totalprice < 200000 THEN 1.00
                    ELSE 1.05 END AS uplift
        FROM orders)
      SELECT o_orderpriority, count(*) AS n,
             ${sqlDsum(sql2("o_totalprice * base_rw * uplift"), 2)} AS slotted_rwa
      FROM slotted
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.stripMargin.trim))

  /** q58: CRM three-level lookup cascade — exposures left-join the direct,
    * facility-cascade, and counterparty collateral aggregates, take the
    * first available by priority coalesce, net the EAD at zero (reference
    * `engine/crm/processor.py:228-443`; kernel
    * `engine/kernels/allocation.py`). Direct side aggregates before the
    * join, so the fact side joins against pre-shrunk frames.
    */
  val q58CrmCascade = QueryDef(
    "q58_crm_cascade",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val direct = li.filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_extendedprice") * lit(0.10), 6).as("direct_coll"))
      val counterparty = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("cp_key"))
        .agg(dsum(col("o_totalprice") * lit(0.05), 6).as("cp_coll"))
      o.join(direct, o("o_orderkey") === direct("l_orderkey"), "left")
        .join(counterparty, o("o_custkey") === counterparty("cp_key"), "left")
        .select(col("o_orderkey"), col("o_totalprice"),
          coalesce(col("direct_coll"), col("cp_coll"), lit(0.0)).as("collateral"),
          when(col("direct_coll").isNotNull, "direct")
            .when(col("cp_coll").isNotNull, "counterparty")
            .otherwise("none").as("crm_source"))
        .withColumn("net_ead", greatest(lit(0.0), col("o_totalprice") - col("collateral")))
        .groupBy(col("crm_source"))
        .agg(count(lit(1)).as("n"),
             dsum(col("collateral"), 6).as("total_collateral"),
             dsum(q2(col("net_ead")), 2).as("total_net_ead"))
        .orderBy(col("crm_source"))
    },
    Some(s"""
      WITH direct AS (
        SELECT l_orderkey, ${sqlDsum("l_extendedprice * 0.10", 6)} AS direct_coll
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
      counterparty AS (
        SELECT o_custkey AS cp_key, ${sqlDsum("o_totalprice * 0.05", 6)} AS cp_coll
        FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
      cascaded AS (
        SELECT o_orderkey, o_totalprice,
               coalesce(direct_coll, cp_coll, 0.0) AS collateral,
               CASE WHEN direct_coll IS NOT NULL THEN 'direct'
                    WHEN cp_coll IS NOT NULL THEN 'counterparty'
                    ELSE 'none' END AS crm_source,
               greatest(0.0, o_totalprice - coalesce(direct_coll, cp_coll, 0.0)) AS net_ead
        FROM orders o
        LEFT JOIN direct ON o.o_orderkey = direct.l_orderkey
        LEFT JOIN counterparty ON o.o_custkey = counterparty.cp_key)
      SELECT crm_source, count(*) AS n,
             ${sqlDsum("collateral", 6)} AS total_collateral,
             ${sqlDsum(sql2("net_ead"), 2)} AS total_net_ead
      FROM cascaded
      GROUP BY crm_source
      ORDER BY crm_source
    """.stripMargin.trim))

  /** q59: guarantee substitution — the covered part of each exposure takes
    * the guarantor's risk weight, the residual keeps the obligor's
    * (reference `engine/crm/guarantees.py` substitution core; the ordered
    * redistribution waterfall is q21). Guarantee capacity joins from the
    * counterparty dimension (broadcast).
    */
  val q59GuaranteeSubstitution = QueryDef(
    "q59_guarantee_substitution",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c.select(col("c_custkey"),
          greatest(col("c_acctbal"), lit(0.0)).as("guarantee_capacity"))),
          col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_totalprice"),
          least(col("o_totalprice"), coalesce(col("guarantee_capacity"), lit(0.0)))
            .as("covered"))
        .withColumn("uncovered", col("o_totalprice") - col("covered"))
        .withColumn("rwa",
          col("covered") * lit(0.20) + col("uncovered") * lit(1.00))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("covered"), 6).as("total_covered"),
          dsum(col("uncovered"), 6).as("total_uncovered"),
          dsum(q2(col("rwa")), 2).as("total_rwa"),
          count(when(col("covered") === col("o_totalprice"), lit(1)))
            .as("n_fully_covered"))
    },
    Some(s"""
      WITH sub AS (
        SELECT o_orderkey, o_totalprice,
               least(o_totalprice, coalesce(greatest(c_acctbal, 0.0), 0.0)) AS covered
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey),
      weighted AS (
        SELECT *, o_totalprice - covered AS uncovered,
               covered * 0.20 + (o_totalprice - covered) * 1.00 AS rwa
        FROM sub)
      SELECT count(*) AS n,
             ${sqlDsum("covered", 6)} AS total_covered,
             ${sqlDsum("uncovered", 6)} AS total_uncovered,
             ${sqlDsum(sql2("rwa"), 2)} AS total_rwa,
             count(CASE WHEN covered = o_totalprice THEN 1 END) AS n_fully_covered
      FROM weighted
    """.stripMargin.trim))

  val all: Seq[QueryDef] = Seq(
    q56SaCcrAddon, q57Slotting, q58CrmCascade, q59GuaranteeSubstitution)
}
