package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Q._

/** Relational operator battery over the harness star schema, one entry per
  * operator family in SURVEY.md §2. Each query is the Spark-idiomatic form
  * (declarative DataFrame plan; Catalyst does pushdown/pruning/join
  * selection) with a DuckDB oracle for the driver's correctness gate.
  */
object Relational {

  /** q01: grouped aggregation with sum/avg/count + derived expressions —
    * the reference's summary group-by shape (reference
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
          q2(sum(col("l_quantity"))).as("sum_qty"),
          q2(sum(col("l_extendedprice"))).as("sum_base_price"),
          q2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
          q6(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             floor(sum(l_quantity)*100+0.5)/100 AS sum_qty,
             floor(sum(l_extendedprice)*100+0.5)/100 AS sum_base_price,
             floor(sum(l_extendedprice*(1.0-l_discount))*100+0.5)/100 AS sum_disc_price,
             floor(avg(l_discount)*1e6+0.5)/1e6 AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim))

  val all: Seq[QueryDef] = Seq(q01Agg)
}
