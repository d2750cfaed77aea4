package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Q._

/** Window-function battery (SURVEY.md §2.5). The reference's windows are
  * unordered partition aggregates ("no self-join!",
  * `stages/hierarchy/enrich.py:448-520`) plus exactly two ordered cases:
  * the guarantee-waterfall cum_sum and the best-rating rank pick. Ordered
  * windows always get a total order (tiebreak on a unique key) because Spark
  * has no stable input order — SURVEY §7.4's explicit-determinism rule.
  */
object Windows {

  /** q20: unordered partition aggregate + pro-rata share — group totals
    * without a self-join (reference `stages/hierarchy/enrich.py:503-520`
    * lending-group totals; `engine/crm/life_insurance.py:246-247` pro-rata
    * ratio). One shuffle on the partition key; the window then runs
    * in-partition with no further exchange.
    */
  val q20GroupTotalShare = QueryDef(
    "q20_group_total_share",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
      o.filter(col("o_custkey") <= 100)
        .select(
          col("o_orderkey"), col("o_custkey"),
          q2(col("o_totalprice")).as("ead"),
          dsumOver(col("o_totalprice"), 2, w).as("group_ead"),
          count(lit(1)).over(w).as("group_n"),
          q6(col("o_totalprice") / dsumOver(col("o_totalprice"), 2, w)).as("pro_rata"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""
      SELECT o_orderkey, o_custkey,
             ${sql2("o_totalprice")} AS ead,
             ${sqlDsumOver("o_totalprice", 2, "PARTITION BY o_custkey")} AS group_ead,
             count(*) OVER (PARTITION BY o_custkey) AS group_n,
             ${sql6(s"o_totalprice / ${sqlDsumOver("o_totalprice", 2, "PARTITION BY o_custkey")}")} AS pro_rata
      FROM orders
      WHERE o_custkey <= 100
      ORDER BY o_orderkey
    """.stripMargin.trim))

  /** q21: ordered cumulative-sum greedy waterfall — the guarantee
    * redistribution shape (reference `engine/crm/guarantees.py:1419-1480`):
    * within each group, order claimants, each absorbs
    * min(capacity, max(0, available − already_absorbed)). The running sum
    * excludes the current row (UNBOUNDED PRECEDING → 1 PRECEDING); order is
    * totalised with the unique order key.
    */
  val q21CumsumWaterfall = QueryDef(
    "q21_cumsum_waterfall",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
      o.filter(col("o_custkey") <= 100)
        .join(broadcast(c.select(col("c_custkey"), col("c_acctbal"))),
              col("o_custkey") === col("c_custkey"), "left")
        .select(
          col("o_orderkey"), col("o_custkey"),
          coalesce(dsumOver(col("o_totalprice"), 2, w), lit(0.0)).as("prev_cum"),
          q2(col("o_totalprice")).as("claim"),
          col("c_acctbal"))
        .select(
          col("o_orderkey"), col("o_custkey"), col("claim"),
          q2(least(col("claim"),
                   greatest(lit(0.0), col("c_acctbal") - col("prev_cum")))).as("absorbed"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""
      WITH staged AS (
        SELECT o_orderkey, o_custkey,
               coalesce(${sqlDsumOver("o_totalprice", 2,
                 "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING")},
                 0.0) AS prev_cum,
               ${sql2("o_totalprice")} AS claim,
               c_acctbal
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE o_custkey <= 100)
      SELECT o_orderkey, o_custkey, claim,
             ${sql2("least(claim, greatest(0.0, c_acctbal - prev_cum))")} AS absorbed
      FROM staged
      ORDER BY o_orderkey
    """.stripMargin.trim))

  /** q22: ordered rank pick — best-rating inheritance: rank rows within a
    * partition, keep rank 1 (reference `stages/hierarchy/ratings.py:106-127`
    * `cqs.rank("ordinal").over(counterparty)`). row_number over a totalised
    * order replaces Polars' input-order tie handling.
    */
  val q22RankPick = QueryDef(
    "q22_rank_pick",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
                q2(col("o_totalprice")).as("latest_price"))
        .orderBy(col("o_custkey"))
    },
    Some(s"""
      SELECT o_custkey, o_orderkey AS latest_orderkey,
             ${sql2("o_totalprice")} AS latest_price
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
      ORDER BY o_custkey
    """.stripMargin.trim))

  /** q23: duplicate detection via count-over-window — `pl.len().over(key)>1`
    * (reference `stages/hierarchy/ratings.py:126-127`,
    * `classify/attributes.py:705`). Emits the DQ diagnostic aggregate, the
    * reference's error-channel style: counts, never exceptions.
    */
  val q23DupDetect = QueryDef(
    "q23_dup_detect",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val w = Window.partitionBy(col("l_orderkey"), col("l_partkey"))
      li.select(col("l_orderkey"), col("l_partkey"),
                count(lit(1)).over(w).as("key_count"))
        .select((col("key_count") > 1).as("is_dup"))
        .groupBy(col("is_dup"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("is_dup"))
    },
    Some("""
      SELECT key_count > 1 AS is_dup, count(*) AS n_rows
      FROM (SELECT count(*) OVER (PARTITION BY l_orderkey, l_partkey) AS key_count
            FROM lineitem)
      GROUP BY 1
      ORDER BY is_dup
    """.stripMargin.trim))

  /** q24: deterministic keep-first dedup — Polars `unique(keep="first")`
    * relies on input order (reference `engine/kernels/allocation.py:63-67`
    * documents an engine-order tie-break; `securitisation/allocator.py:219-222`);
    * Spark has no stable order, so dedup is an explicit row_number over a
    * declared priority order — SURVEY §2.2's row-dedup row.
    */
  val q24DedupFirst = QueryDef(
    "q24_dedup_first",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      // (l_orderkey, l_linenumber) is NOT unique in the harness data —
      // the order must be totalised or keep-first is engine-dependent,
      // which is precisely the trap this query demonstrates. The pick is
      // a min-struct ARGMIN over the same totalised sort columns (struct
      // ordering is lexicographic, so the kept row is identical to the
      // rank-1 window's) — the aggregation form gets map-side partial
      // combine and skips the per-partition sort the window pays (r19;
      // the q119 PQ-codes precedent). l_returnflag rides along as a
      // carried field BEHIND the five order columns, which already
      // totalise the order, so it never influences the pick.
      li.groupBy(col("l_orderkey"))
        .agg(min(struct(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_returnflag")))
          .as("_first"))
        .groupBy(col("_first.l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n_first_lines"),
             dsum(col("_first.l_quantity"), 2).as("qty"))
        .orderBy(col("flag"))
    },
    Some(s"""
      WITH first_lines AS (
        SELECT * FROM lineitem
        QUALIFY row_number() OVER (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) = 1)
      SELECT l_returnflag AS flag, count(*) AS n_first_lines,
             ${sqlDsum("l_quantity", 2)} AS qty
      FROM first_lines
      GROUP BY 1
      ORDER BY flag
    """.stripMargin.trim))

  /** q25: global top-k — order-by + limit (reference §2.6: break worklist by
    * materiality, `analysis/reconciliation.py:1120`). Spark executes this as
    * a per-partition TakeOrdered + single-reduce merge, never a full sort.
    */
  val q25TopK = QueryDef(
    "q25_topk",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      o.groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("total").desc, col("o_custkey"))
        .limit(10)
    },
    Some(s"""
      SELECT o_custkey, ${sqlDsum("o_totalprice", 2)} AS total
      FROM orders
      GROUP BY o_custkey
      ORDER BY total DESC, o_custkey
      LIMIT 10
    """.stripMargin.trim))

  val all: Seq[QueryDef] = Seq(
    q20GroupTotalShare, q21CumsumWaterfall, q22RankPick, q23DupDetect,
    q24DedupFirst, q25TopK)
}
