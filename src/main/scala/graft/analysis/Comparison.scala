package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.Q.{dsum, q6}

/** Two-run comparison at reference depth (reference
  * `analysis/comparison.py` ~730 LoC): compare a base run's results
  * against a candidate run's (a framework switch, a rulepack bump, a code
  * change) component by component.
  *
  *  - **Full-outer join on coalesced keys** with presence flags
  *    (`comparison.py:337,504` `coalesce=True`).
  *  - **Per-measure pairs** `<m>_base` / `<m>_cand` with delta and a
  *    zero-guarded pct change.
  *  - **Scaffold × totals** (`comparison.py:685`): the report grid is the
  *    COMPLETE dimension space — a (class) cell missing from both runs
  *    still appears, zero-filled, with each row carrying the 1-row totals
  *    via a broadcast cross join so shares-of-total need no second pass.
  */
object Comparison {

  /** |base| under this guard suppresses pct_change (div-0 discipline). */
  val ZeroGuard = 1e-10

  /** Full-outer compare of two runs at the same grain. Output: keys,
    * `<m>_base`, `<m>_cand`, `delta_<m>`, `pct_<m>`, presence flags. */
  def compareRuns(
      base: DataFrame, cand: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val lcols = keys.map(col) ++
      measures.map(m => col(m).as(s"${m}_base")) :+ lit(true).as("in_base")
    val rcols = keys.map(col) ++
      measures.map(m => col(m).as(s"${m}_cand")) :+ lit(true).as("in_cand")
    val joined = base.select(lcols: _*)
      .join(cand.select(rcols: _*), keys, "full")
      .withColumn("in_base", coalesce(col("in_base"), lit(false)))
      .withColumn("in_cand", coalesce(col("in_cand"), lit(false)))
    measures.foldLeft(joined) { (acc, m) =>
      val b = coalesce(col(s"${m}_base"), lit(0.0))
      val c = coalesce(col(s"${m}_cand"), lit(0.0))
      acc
        .withColumn(s"delta_$m", c - b)
        .withColumn(s"pct_$m",
          when(abs(b) > ZeroGuard, q6((c - b) / b)))
    }
  }

  /** Scaffold the comparison onto a complete dimension grid and attach
    * the run totals to every row: grid ⟕ recon (zero-filled) × 1-row
    * totals (broadcast), plus each measure's share of the total delta.
    * The grid is tiny (report geometry) → broadcast; totals are one row
    * → broadcast cross join; the input `recon` is already aggregated, so
    * this stage adds no data-sized shuffle at any scale. */
  def scaffoldSummary(
      recon: DataFrame, grid: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val filled = measures.foldLeft(
      grid.join(recon, keys, "left")
        .withColumn("in_base", coalesce(col("in_base"), lit(false)))
        .withColumn("in_cand", coalesce(col("in_cand"), lit(false)))) {
      (acc, m) =>
        acc
          .withColumn(s"${m}_base", coalesce(col(s"${m}_base"), lit(0.0)))
          .withColumn(s"${m}_cand", coalesce(col(s"${m}_cand"), lit(0.0)))
          .withColumn(s"delta_$m", coalesce(col(s"delta_$m"), lit(0.0)))
    }
    val totals = broadcast(recon.agg(
      measures.flatMap(m => Seq(
        dsum(col(s"${m}_base"), 2).as(s"total_${m}_base"),
        dsum(col(s"delta_$m"), 2).as(s"total_delta_$m"))).head,
      measures.flatMap(m => Seq(
        dsum(col(s"${m}_base"), 2).as(s"total_${m}_base"),
        dsum(col(s"delta_$m"), 2).as(s"total_delta_$m"))).tail: _*))
    measures.foldLeft(filled.crossJoin(totals)) { (acc, m) =>
      acc.withColumn(s"share_of_delta_$m",
        when(abs(col(s"total_delta_$m")) > ZeroGuard,
          q6(col(s"delta_$m") / col(s"total_delta_$m"))))
    }
  }

  /** Break rows ranked by |delta| materiality with a deterministic key
    * tiebreak — the candidate-impact worklist.
    *
    * `orderBy(...).limit(n)` plans as TakeOrderedAndProject (per-
    * partition top-n, then merge of survivors only) instead of an
    * unpartitioned global-sort window, so the worklist stays
    * distributed at any break volume. The rank window runs over the
    * ≤limit survivors only (bounded input). */
  def impactWorklist(
      recon: DataFrame, keys: Seq[String], measure: String,
      limit: Int = 100): DataFrame = {
    val order = (abs(coalesce(col(s"delta_$measure"), lit(0.0))).desc +:
      keys.map(col)): Seq[Column]
    recon.filter(abs(coalesce(col(s"delta_$measure"), lit(0.0))) > ZeroGuard)
      .orderBy(order: _*).limit(limit)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(order: _*)).cast("long"))
  }
}
