package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Q._

/** Aggregation-family battery (SURVEY.md §2.4) over the harness star schema.
  * Each query is the Spark-idiomatic form (declarative DataFrame plan;
  * Catalyst does pushdown/pruning/join selection) with a DuckDB oracle for
  * the driver's correctness gate.
  *
  * All float sums are accumulated in DECIMAL ([[Q.dsum]]) so the result is
  * independent of partition/addition order — the cross-engine analogue of the
  * reference's float-determinism caveat (reference
  * `tests/properties/test_conservation.py:36-39`).
  */
object Relational {

  /** q01: grouped summary aggregation with sum/avg/count + derived
    * expressions — the reference's summary group-by shape (reference
    * `engine/aggregator/_summaries.py:48-105`). Map-side partial agg +
    * single shuffle on the group keys; at 100 TB this stays one exchange.
    */
  val q01Agg = QueryDef(
    "q01_agg",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
          (dsum(col("l_discount"), 12) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${sqlDsum("l_quantity", 2)} AS sum_qty,
             ${sqlDsum("l_extendedprice", 2)} AS sum_base_price,
             ${sqlDsum("l_extendedprice*(1.0-l_discount)", 6)} AS sum_disc_price,
             ${sqlDsum("l_discount", 12)} / count(*) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim))

  /** q02: portfolio scalars — whole-frame single-row aggregate (reference
    * `engine/aggregator/_el_summary.py`, `_floor.py` portfolio totals).
    * One partial-agg pass, no shuffle of data rows (AQE collapses to a
    * single-row exchange); scale-independent.
    */
  val q02PortfolioScalars = QueryDef(
    "q02_portfolio_scalars",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      o.agg(
        dsum(col("o_totalprice"), 2).as("total_ead"),
        count(lit(1)).as("n_exposures"),
        countDistinct(col("o_custkey")).as("n_counterparties"),
        (dsum(col("o_totalprice"), 2) / count(lit(1))).as("avg_ead"),
        q2(min(col("o_totalprice"))).as("min_ead"),
        q2(max(col("o_totalprice"))).as("max_ead"))
    },
    Some(s"""
      SELECT ${sqlDsum("o_totalprice", 2)} AS total_ead,
             count(*) AS n_exposures,
             count(DISTINCT o_custkey) AS n_counterparties,
             ${sqlDsum("o_totalprice", 2)} / count(*) AS avg_ead,
             ${sql2("min(o_totalprice)")} AS min_ead,
             ${sql2("max(o_totalprice)")} AS max_ead
      FROM orders
    """.stripMargin.trim))

  /** q03: branch split + union — filter one persisted parent into approach
    * branches, compute per-branch, union back (reference
    * `engine/stages/calc.py:100-108` SA/IRB/slotting split;
    * `engine/materialise.py:266-312` collect_all). In Spark the three
    * branches share the scan; at scale persist the parent once and run the
    * branch plans as separate jobs over the cached parent.
    */
  val q03BranchSplit = QueryDef(
    "q03_branch_split",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val branch = (name: String, pred: org.apache.spark.sql.Column, factor: Double) =>
        o.filter(pred)
          .groupBy(col("o_orderpriority").as("bucket"))
          .agg(dsum(col("o_totalprice") * factor, 6).as("branch_rwa"),
               count(lit(1)).as("n"))
          .withColumn("branch", lit(name))
      val sa = branch("SA", col("o_orderstatus") === "F", 1.0)
      val irb = branch("IRB", col("o_orderstatus") === "O", 0.65)
      val slot = branch("SLOT", !col("o_orderstatus").isin("F", "O"), 1.5)
      sa.unionByName(irb).unionByName(slot)
        .select(col("branch"), col("bucket"), col("branch_rwa"), col("n"))
        .orderBy(col("branch"), col("bucket"))
    },
    Some(s"""
      WITH branches AS (
        SELECT 'SA' AS branch, o_orderpriority AS bucket,
               ${sqlDsum("o_totalprice*1.0", 6)} AS branch_rwa, count(*) AS n
        FROM orders WHERE o_orderstatus = 'F' GROUP BY 2
        UNION ALL
        SELECT 'IRB', o_orderpriority,
               ${sqlDsum("o_totalprice*0.65", 6)}, count(*)
        FROM orders WHERE o_orderstatus = 'O' GROUP BY 2
        UNION ALL
        SELECT 'SLOT', o_orderpriority,
               ${sqlDsum("o_totalprice*1.5", 6)}, count(*)
        FROM orders WHERE o_orderstatus NOT IN ('F','O') GROUP BY 2
      )
      SELECT branch, bucket, branch_rwa, n FROM branches
      ORDER BY branch, bucket
    """.stripMargin.trim))

  /** q04: multi-level aggregation with cross-level arithmetic — the SA-CCR
    * hedging-set shape: trade → bucket sums → sqrt(sum(bucket²)) roll-up →
    * top-level add-on (reference `engine/ccr/pfe.py:252,324-332,540-564`).
    * Two chained shuffles, each strictly smaller than the last; the
    * intermediate grain (order, flag) is bounded by the key cardinality.
    */
  val q04MultiLevelAgg = QueryDef(
    "q04_multilevel_agg",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val bucket = li
        .groupBy(col("l_returnflag").as("hedging_set"), col("l_linestatus").as("bucket"))
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("bucket_notional"))
      bucket
        .groupBy(col("hedging_set"))
        .agg(
          q2(sqrt(dsum(col("bucket_notional") * col("bucket_notional"), 4))).as("addon"),
          dsum(col("bucket_notional"), 6).as("gross_notional"),
          count(lit(1)).as("n_buckets"))
        .orderBy(col("hedging_set"))
    },
    Some(s"""
      WITH bucket AS (
        SELECT l_returnflag AS hedging_set, l_linestatus AS bucket,
               ${sqlDsum("l_extendedprice*l_discount", 6)} AS bucket_notional
        FROM lineitem GROUP BY 1, 2
      )
      SELECT hedging_set,
             ${sql2(s"sqrt(${sqlDsum("bucket_notional*bucket_notional", 4)})")} AS addon,
             ${sqlDsum("bucket_notional", 6)} AS gross_notional,
             count(*) AS n_buckets
      FROM bucket GROUP BY hedging_set
      ORDER BY hedging_set
    """.stripMargin.trim))

  /** q05: explode + re-aggregate — the securitisation pool-allocation shape:
    * a `List`/array column exploded to allocation grain then grouped by pool
    * (reference `engine/aggregator/_securitisation.py:156`,
    * `engine/securitisation/allocator.py:84-90`). Generators run inside the
    * scan stage; the only shuffle is the final groupBy.
    */
  val q05ExplodePool = QueryDef(
    "q05_explode_pool",
    (s, dir) => {
      val p = Tables.part(s, dir)
      p.select(col("p_partkey"), explode(split(col("p_type"), " ")).as("pool"))
        .groupBy(col("pool"))
        .agg(count(lit(1)).as("n_alloc"),
             countDistinct(col("p_partkey")).as("n_parts"))
        .orderBy(col("pool"))
    },
    Some("""
      SELECT pool, count(*) AS n_alloc, count(DISTINCT p_partkey) AS n_parts
      FROM (SELECT p_partkey, unnest(string_split(p_type, ' ')) AS pool FROM part)
      GROUP BY pool
      ORDER BY pool
    """.stripMargin.trim))

  /** q06: ancestor-closure list aggregation — groupBy → collect_list of
    * String keys (reference `engine/stages/hierarchy/graph.py:300-305`).
    * Spark's collect_list is order-nondeterministic across shuffles, so the
    * list is sorted before serialising — the explicit-determinism discipline
    * SURVEY §7.4 requires wherever the reference relies on input order.
    */
  val q06CollectList = QueryDef(
    "q06_collect_list",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(col("l_orderkey") <= 200)
        .select(col("l_orderkey"), col("l_partkey").cast("string").as("pk"))
        .groupBy(col("l_orderkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("pk")))).as("ancestor_list"),
             count(lit(1)).as("n_children"))
        .orderBy(col("l_orderkey"))
    },
    Some("""
      SELECT l_orderkey,
             string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY CAST(l_partkey AS VARCHAR)) AS ancestor_list,
             count(*) AS n_children
      FROM lineitem
      WHERE l_orderkey <= 200
      GROUP BY l_orderkey
      ORDER BY l_orderkey
    """.stripMargin.trim))

  /** q107: skew-safe aggregation over a hot low-cardinality key — the
    * 100 TB pattern the straight plan cannot survive: `l_returnflag` has
    * THREE values, so a naive `groupBy(flag).agg(collect/distinct)`
    * funnels the whole book through ≤3 reducers.
    *
    *  - the SUM side salts explicitly: partial decimal sums per
    *    (flag, salt-of-64) spread across 192 reducers, then the tiny
    *    second-stage regroup collapses the salt — the salt never leaves
    *    the plan, so the oracle is the plain GROUP BY;
    *  - the DISTINCT side two-stages: distinct on the full (flag, key)
    *    pair first (shuffle balanced by the pair, not the hot flag),
    *    then a count per flag over the deduped — never
    *    `count(DISTINCT)` on the hot key's reducer.
    *
    * The salt uses Spark-internal `hash()` — legitimate engine-internal
    * state because the regroup eliminates it from the result. */
  val q107SkewSaltedAgg = QueryDef(
    "q107_skew_salted_agg",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val salted = li
        .groupBy(col("l_returnflag"), pmod(hash(col("l_orderkey")), lit(64)).as("salt"))
        .agg(
          dsum(col("l_extendedprice"), 2).as("partial_value"),
          count(lit(1)).as("partial_n"))
        .groupBy(col("l_returnflag"))
        .agg(
          dsum(col("partial_value"), 2).as("total_value"),
          sum(col("partial_n")).as("n_rows"))
      val distinctParts = li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_distinct_parts"))
      salted.join(distinctParts, Seq("l_returnflag"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      SELECT l_returnflag,
             ${sqlDsum("l_extendedprice", 2)} AS total_value,
             count(*) AS n_rows,
             count(DISTINCT l_partkey) AS n_distinct_parts
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """.stripMargin.trim))

  val all: Seq[QueryDef] = Seq(
    q01Agg, q02PortfolioScalars, q03BranchSplit, q04MultiLevelAgg,
    q05ExplodePool, q06CollectList, q107SkewSaltedAgg)
}
