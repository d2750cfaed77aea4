package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Q._

/** Join battery (SURVEY.md §2.3). Every reference join is a hash equi-join
  * on scalar keys; the dimension sides are small rule/lookup tables →
  * `broadcast()` in Spark, so the big fact side never shuffles. Larger
  * fact-fact joins rely on sort-merge + AQE.
  */
object Joins {

  /** q10: broadcast left join of fact against a small dimension — the
    * FX-rate / haircut-table join shape (reference
    * `engine/stages/fx/converter.py:104,213,284,349,413`;
    * `engine/crm/haircuts.py:499-520`). `broadcast(part)` keeps the
    * lineitem side shuffle-free; at 100 TB this is the difference between
    * a map-side join and a 100 TB exchange.
    */
  val q10BroadcastJoin = QueryDef(
    "q10_broadcast_join",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left")
        .groupBy(col("p_brand").as("brand"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy(col("brand"))
    },
    Some(s"""
      SELECT p_brand AS brand,
             ${sqlDsum("l_extendedprice*(1.0-l_discount)", 6)} AS revenue,
             count(*) AS n_lines
      FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY brand
    """.stripMargin.trim))

  /** q11: multi-hop dimension join chain — the counterparty-attribute /
    * facility-metadata enrichment shape (reference
    * `engine/stages/classify/attributes.py`;
    * `stages/hierarchy/unify.py:108-110`). customer→nation→region are all
    * broadcast; orders joins customer on the natural key. Catalyst prunes
    * every unused dimension column before the scan (ReadSchema).
    */
  val q11MultiJoin = QueryDef(
    "q11_multi_join",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(dsum(col("o_totalprice"), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("region"), col("nation"))
    },
    Some(s"""
      SELECT r_name AS region, n_name AS nation,
             ${sqlDsum("o_totalprice", 2)} AS revenue,
             count(*) AS n_orders
      FROM orders
      LEFT JOIN customer ON o_custkey = c_custkey
      LEFT JOIN nation ON c_nationkey = n_nationkey
      LEFT JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
      ORDER BY region, nation
    """.stripMargin.trim))

  /** q12: left-semi join — scope filtering, keep rows whose key survives in
    * another frame (reference `engine/stages/scope/resolver.py:434-435,468`:
    * CCR trades where the netting set survives). Semi joins never widen the
    * row and broadcast when the filter side is small.
    */
  val q12SemiJoin = QueryDef(
    "q12_semi_join",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val bigLines = li.filter(col("l_quantity") >= 48).select(col("l_orderkey"))
      o.join(bigLines, o("o_orderkey") === bigLines("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("status"))
    },
    Some(s"""
      SELECT o_orderstatus AS status, count(*) AS n_orders,
             ${sqlDsum("o_totalprice", 2)} AS total
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      GROUP BY 1
      ORDER BY status
    """.stripMargin.trim))

  /** q13: left-anti join — orphan detection / unlinked-fallback (reference
    * `engine/crm/link_allocation.py:121` unlinked collateral;
    * `engine/securitisation/allocator.py:186-193`'s one Python-set UDF is
    * exactly this anti-join, done declaratively as SURVEY §2.9 prescribes).
    */
  val q13AntiJoin = QueryDef(
    "q13_anti_join",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_customers_without_orders"),
             dsum(col("c_acctbal"), 2).as("acctbal_total"))
        .orderBy(col("segment"))
    },
    Some(s"""
      SELECT c_mktsegment AS segment,
             count(*) AS n_customers_without_orders,
             ${sqlDsum("c_acctbal", 2)} AS acctbal_total
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY 1
      ORDER BY segment
    """.stripMargin.trim))

  /** q14: full-outer comparison join with coalesced keys + delta bucketing —
    * the two-run reconciliation shape (reference
    * `analysis/comparison.py:337,504`; `analysis/reconciliation.py:184`,
    * bucket taxonomy `:67-71`). Bucketing is a when-chain over the joined
    * row; missing_left/missing_right fall out of the outer join nulls.
    */
  val q14FullOuterRecon = QueryDef(
    "q14_full_outer_recon",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val ours = o.groupBy(col("o_custkey").as("k"))
        .agg(dsum(col("o_totalprice"), 2).as("ours"))
      val theirs = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_custkey").as("k"))
        .agg(dsum(col("l_extendedprice"), 2).as("theirs"))
      val tol = 1e-6
      ours.join(theirs, Seq("k"), "full")
        .select(
          col("k"),
          when(col("ours").isNull, lit("missing_left"))
            .when(col("theirs").isNull, lit("missing_right"))
            .when(abs(col("ours") - col("theirs")) <= tol, lit("exact_match"))
            .when(abs(col("ours") - col("theirs")) <= col("ours") * 0.5, lit("within_tolerance"))
            .otherwise(lit("break")).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },
    Some(s"""
      WITH ours AS (
        SELECT o_custkey AS k, ${sqlDsum("o_totalprice", 2)} AS ours
        FROM orders GROUP BY 1),
      theirs AS (
        SELECT o_custkey AS k, ${sqlDsum("l_extendedprice", 2)} AS theirs
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
      recon AS (
        SELECT coalesce(ours.k, theirs.k) AS k,
               CASE WHEN ours.ours IS NULL THEN 'missing_left'
                    WHEN theirs.theirs IS NULL THEN 'missing_right'
                    WHEN abs(ours.ours - theirs.theirs) <= 1e-6 THEN 'exact_match'
                    WHEN abs(ours.ours - theirs.theirs) <= ours.ours * 0.5 THEN 'within_tolerance'
                    ELSE 'break' END AS bucket
        FROM ours FULL OUTER JOIN theirs ON ours.k = theirs.k)
      SELECT bucket, count(*) AS n FROM recon
      GROUP BY bucket ORDER BY bucket
    """.stripMargin.trim))

  /** q15: cross join against a broadcast one-row totals frame — share-of-
    * total scaffolding (reference `engine/ccr/ccp.py:103`,
    * `analysis/comparison.py:685`). The single-row side broadcasts, so the
    * "cross" join is a free map-side literal attach.
    */
  val q15CrossJoinTotals = QueryDef(
    "q15_cross_join_totals",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val totals = o.agg(dsum(col("o_totalprice"), 2).as("grand_total"))
      o.groupBy(col("o_orderpriority").as("priority"))
        .agg(dsum(col("o_totalprice"), 2).as("seg_total"))
        .crossJoin(broadcast(totals))
        .select(col("priority"),
                col("seg_total"),
                q6(col("seg_total") / col("grand_total")).as("share"))
        .orderBy(col("priority"))
    },
    Some(s"""
      WITH totals AS (SELECT ${sqlDsum("o_totalprice", 2)} AS grand_total FROM orders),
      seg AS (SELECT o_orderpriority AS priority, ${sqlDsum("o_totalprice", 2)} AS seg_total
              FROM orders GROUP BY 1)
      SELECT priority, seg_total,
             ${sql6("seg_total / grand_total")} AS share
      FROM seg CROSS JOIN totals
      ORDER BY priority
    """.stripMargin.trim))

  /** q16: broadcast decision-table join — a rulepack decision table rendered
    * as an in-memory DataFrame and joined on its key columns (reference
    * `rulebook/compile.py:148-172` decision_table_df;
    * `engine/crm/haircuts.py:218,499-520`). The rule table is driver-built
    * (regime-as-data), broadcast, and the join stays map-side.
    */
  val q16DecisionTableJoin = QueryDef(
    "q16_decision_table_join",
    (s, dir) => {
      import s.implicits._
      val rules = Seq(
        ("BUILDING", "small", 0.20), ("BUILDING", "large", 0.35),
        ("AUTOMOBILE", "small", 0.50), ("AUTOMOBILE", "large", 0.75),
        ("MACHINERY", "small", 0.50), ("MACHINERY", "large", 1.00),
        ("HOUSEHOLD", "small", 0.75), ("HOUSEHOLD", "large", 1.00),
        ("FURNITURE", "small", 0.75), ("FURNITURE", "large", 1.50)
      ).toDF("rule_segment", "rule_size_band", "risk_weight")
      val c = Tables.customer(s, dir)
      c.withColumn("size_band", when(col("c_acctbal") < 5000, "small").otherwise("large"))
        .join(broadcast(rules),
              col("c_mktsegment") === col("rule_segment") &&
              col("size_band") === col("rule_size_band"), "left")
        .groupBy(col("c_mktsegment").as("mktsegment"))
        .agg(dsum(greatest(col("c_acctbal"), lit(0.0)) * coalesce(col("risk_weight"), lit(1.0)), 6).as("rwa"),
             count(lit(1)).as("n"))
        .orderBy(col("mktsegment"))
    },
    Some(s"""
      WITH rules(segment, size_band, risk_weight) AS (VALUES
        ('BUILDING','small',0.20), ('BUILDING','large',0.35),
        ('AUTOMOBILE','small',0.50), ('AUTOMOBILE','large',0.75),
        ('MACHINERY','small',0.50), ('MACHINERY','large',1.00),
        ('HOUSEHOLD','small',0.75), ('HOUSEHOLD','large',1.00),
        ('FURNITURE','small',0.75), ('FURNITURE','large',1.50)),
      sized AS (
        SELECT c_mktsegment, c_acctbal,
               CASE WHEN c_acctbal < 5000 THEN 'small' ELSE 'large' END AS size_band
        FROM customer)
      SELECT c_mktsegment AS mktsegment,
             ${sqlDsum("greatest(c_acctbal, 0.0) * coalesce(risk_weight, 1.0)", 6)} AS rwa,
             count(*) AS n
      FROM sized LEFT JOIN rules
        ON c_mktsegment = rules.segment AND sized.size_band = rules.size_band
      GROUP BY 1
      ORDER BY mktsegment
    """.stripMargin.trim))

  val all: Seq[QueryDef] = Seq(
    q10BroadcastJoin, q11MultiJoin, q12SemiJoin, q13AntiJoin,
    q14FullOuterRecon, q15CrossJoinTotals, q16DecisionTableJoin)
}
