package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sub-row collapse for parallel-run reconciliation (reference
  * `engine/aggregator/_collapse.py` aggregate_to_key_grain): the results
  * frame splits one loan into several rows (guarantee legs carry
  * `parent_exposure_reference` and a suffixed reference — `__G_<g>` /
  * `__REM` — real-estate splits carry their split parent), while a
  * legacy calculator reports one row per loan; before reconciling,
  * collapse the sub-rows back to the single grain:
  *
  *  - additive money fields SUM (exact decimal accumulation);
  *  - ratio columns RECOMPUTE from the summed numerator/denominator —
  *    never averaged;
  *  - everything else takes one representative value per group. The
  *    reference takes the frame-order first; Spark has no stable row
  *    order, so the representative is the deterministic MIN (the
  *    SURVEY §7.4 order-dependence discipline: introduce an explicit
  *    deterministic rule wherever the reference is engine-order
  *    dependent, and record the divergence);
  *  - groups whose categoricals are HETEROGENEOUS are flagged — a
  *    collapsed row that silently picked one of two approaches would
  *    poison the reconciliation it feeds.
  *
  * One shuffle on the collapse key; everything else is aggregate
  * expressions inside it.
  */
object Collapse {

  /** Collapse `df` to `key` grain. `moneyCols` sum at scale 2;
    * `ratioCols` are (outputName, numeratorCol, denominatorCol)
    * recomputed post-aggregation (null when the denominator is 0);
    * `representativeCols` take the deterministic min; `categoricalCols`
    * additionally contribute to the `heterogeneous` flag. Adds
    * `n_legs`. */
  def aggregateToKeyGrain(
      df: DataFrame,
      key: Column,
      moneyCols: Seq[String],
      ratioCols: Seq[(String, String, String)] = Nil,
      representativeCols: Seq[String] = Nil,
      categoricalCols: Seq[String] = Nil): DataFrame = {
    // String-typed representatives/categoricals aggregate via ONE
    // collect_set per column: array_min(set) == min(col) (nulls dropped
    // by both) and size(set) == countDistinct(col) — value-identical,
    // but a string-buffer min forces SortAggregate (two full sorts
    // around the exchange) and countDistinct plans an Expand, while the
    // set form stays a single object-hash aggregate (r19, guide §2.3).
    // Non-string columns keep the plain min — already hash-friendly.
    val stringCols = ((representativeCols ++ categoricalCols).distinct
      .filter(c => df.schema(c).dataType ==
        org.apache.spark.sql.types.StringType)).toSet
    val aggs =
      moneyCols.map(c =>
        sum(col(c).cast(DecimalType(38, 2))).cast("double").as(c)) ++
      (representativeCols ++ categoricalCols).distinct.map(c =>
        if (stringCols(c)) collect_set(col(c)).as(s"_set_$c")
        else min(col(c)).as(c)) ++
      categoricalCols.filterNot(stringCols).map(c =>
        // null counts as a distinct value (the reference's n_unique):
        // countDistinct ignores nulls, so {SA, null} must still flag
        ((countDistinct(col(c)) +
          max(when(col(c).isNull, 1).otherwise(0))) > 1).as(s"_het_$c")) ++
      categoricalCols.filter(stringCols).map(c =>
        max(when(col(c).isNull, 1).otherwise(0)).as(s"_hasnull_$c")) :+
      count(lit(1)).as("n_legs")
    val grouped = df.groupBy(key.as("collapse_key"))
      .agg(aggs.head, aggs.tail: _*)
    val withReps = (representativeCols ++ categoricalCols).distinct
      .filter(stringCols).foldLeft(grouped) { (acc, c) =>
        acc.withColumn(c, array_min(col(s"_set_$c")))
      }
    val het =
      if (categoricalCols.isEmpty) lit(false)
      else categoricalCols.map(c =>
        if (stringCols(c)) (size(col(s"_set_$c")) + col(s"_hasnull_$c")) > 1
        else col(s"_het_$c")).reduce(_ || _)
    val withRatios = ratioCols.foldLeft(withReps) {
      case (d, (name, num, den)) =>
        d.withColumn(name,
          when(col(den) =!= 0.0, col(num) / col(den)))
    }
    withRatios
      .withColumn("heterogeneous", het)
      .drop(categoricalCols.filterNot(stringCols).map(c => s"_het_$c") ++
        categoricalCols.filter(stringCols).map(c => s"_hasnull_$c") ++
        (representativeCols ++ categoricalCols).distinct.filter(stringCols)
          .map(c => s"_set_$c"): _*)
  }
}
