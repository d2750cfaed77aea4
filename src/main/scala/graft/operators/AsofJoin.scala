package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent right
  * row with `right.on <= left.on` in the same `by` group (the time-series
  * enrichment join: trade→latest-quote, event→latest-config, reading→
  * latest-calibration).
  *
  * Spark has no native ASOF operator, and the naive formulations both
  * collapse at scale: a non-equi range join explodes to the full
  * per-key cross product before picking the max, and a per-row correlated
  * subquery never distributes at all. The scalable shape is the MERGE
  * formulation: union both sides into one stream tagged by side, ONE
  * shuffle on the `by` key, sort within the partition by
  * (on, side-tag, seq), and carry the latest right payload forward with a
  * running `last(..., ignoreNulls)` window — O(n log n) per key, no pair
  * explosion, and AQE handles skewed keys like any other window. The
  * same shape is what a native engine's sorted merge-asof does; here the
  * sort is Spark's standard window sort, so Tungsten spills it when a key
  * exceeds memory instead of OOMing.
  *
  * Tie semantics (all deterministic):
  *  - a right row at exactly `left.on` MATCHES (at-or-before): the side
  *    tag orders right (0) before left (1) at equal `on`;
  *  - among multiple right rows at the same `on`, the one with the
  *    HIGHEST `seq` wins (last in window order);
  *  - `tolerance` (same unit as `on`) voids matches staler than
  *    `left.on - tolerance`, surfacing them as nulls rather than joining
  *    arbitrarily old state.
  *
  * Output: every left row with its columns unchanged plus `asof_on` (the
  * matched right row's `on`, null when unmatched) and `asof_<p>` for each
  * payload column.
  */
object AsofJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      by: String,
      on: String,
      seq: String,
      payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {

    val payloadStruct = struct(
      col(on).cast("long").as("asof_on") +:
        payload.map(p => col(p).as(s"asof_$p")): _*)
    val payloadType = right.select(payloadStruct.as("p")).schema("p").dataType

    val leftRow = struct(left.columns.map(col): _*)
    val leftRowType = left.select(leftRow.as("l")).schema("l").dataType

    val rightSide = right.select(
      col(by).as("__by"), col(on).cast("long").as("__on"),
      col(seq).cast("long").as("__seq"), lit(0).as("__side"),
      payloadStruct.as("__p"), lit(null).cast(leftRowType).as("__l"))
    val leftSide = left.select(
      col(by).as("__by"), col(on).cast("long").as("__on"),
      col(seq).cast("long").as("__seq"), lit(1).as("__side"),
      lit(null).cast(payloadType).as("__p"), leftRow.as("__l"))

    val w = Window.partitionBy(col("__by"))
      .orderBy(col("__on"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightSide.unionByName(leftSide)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val fresh: Column = tolerance match {
      case Some(tol) =>
        when(col("__match.asof_on") >= col("__on") - tol, col("__match"))
      case None => col("__match")
    }
    carried
      .withColumn("__match", fresh)
      .select(col("__l.*") +:
        ("asof_on" +: payload.map(p => s"asof_$p"))
          .map(f => col(s"__match.$f").as(f)): _*)
  }
}
