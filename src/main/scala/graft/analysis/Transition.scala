package graft.analysis

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.queries.Q._

/** Period-over-period transition and attribution analyses (reference
  * `analysis/transition.py` — regime/period timelines — and
  * `analysis/attribution.py` — decomposing a portfolio delta into named
  * effects):
  *
  *  - **Migration matrix**: join two period snapshots on the exposure
  *    key, count and weigh every (class_from → class_to) cell — the
  *    classic credit-migration pivot, one join + one summary shuffle.
  *  - **Attribution**: per destination class, the roll-forward identity
  *    closing = opening + inflow − outflow + growth, with each term an
  *    exact decimal sum so the identity holds to the cent — the neutral
  *    attributor's bridge (reference `attribution.py:73`).
  */
object Transition {

  /** Both snapshots at (key, class, measure) grain → one joined frame
    * with from/to columns. Inner join: exposures present in both periods
    * (originations/maturities belong to the attribution inflow/outflow
    * sides computed by `attribution`). */
  def joined(
      periodA: DataFrame, periodB: DataFrame,
      key: String, classCol: String, measure: String): DataFrame = {
    val a = periodA.select(col(key),
      col(classCol).as("class_from"), col(measure).as("measure_from"))
    val b = periodB.select(col(key),
      col(classCol).as("class_to"), col(measure).as("measure_to"))
    a.join(b, Seq(key))
  }

  /** The exact-decimal (class_from, class_to) CELL GRID — the shared
    * contraction the matrix and every attribution measure re-aggregate
    * from. One pass over the joined frame produces #classes² rows with
    * the decimal partial sums kept UNCAST; decimal addition is
    * associative, so any regrouping of the cells reproduces the direct
    * per-row dsum bit-for-bit (r19, guide §2.3 aggregate-before-shuffle:
    * the former shape executed the full joined frame once for the matrix
    * and FIVE more times inside attribution — per consumer). Callers
    * that need both views should persist this tiny frame and use the
    * `*FromCells` forms. */
  def cells(j: DataFrame): DataFrame =
    j.groupBy(col("class_from"), col("class_to"))
      .agg(
        count(lit(1)).as("cell_n"),
        sum(col("measure_from").cast(DecimalType(38, 2))).as("cell_from_dec"),
        sum(col("measure_to").cast(DecimalType(38, 2))).as("cell_to_dec"),
        sum((col("measure_to") - col("measure_from"))
          .cast(DecimalType(38, 2))).as("cell_growth_dec"))

  /** The (class_from, class_to) migration matrix with exact sums. */
  def migrationMatrix(j: DataFrame): DataFrame =
    matrixFromCells(cells(j))

  /** Matrix view over a [[cells]] frame (per-cell sums ARE the matrix). */
  def matrixFromCells(c: DataFrame): DataFrame =
    c.select(col("class_from"), col("class_to"), col("cell_n").as("n"),
      col("cell_from_dec").cast("double").as("opening_measure"),
      col("cell_to_dec").cast("double").as("closing_measure"))

  /** Per-class roll-forward: closing = opening + inflow − outflow +
    * growth. Inflow/outflow carry the OPENING measure of migrating rows;
    * growth is the measure delta of every row landing in the class. */
  def attribution(j: DataFrame): DataFrame =
    attributionFromCells(cells(j))

  /** Attribution over a [[cells]] frame: five regroupings of the
    * #classes² decimal cells instead of five full passes over the joined
    * rows — exact-sum-identical (decimal addition is associative; the
    * final double cast happens once, after the regrouping, exactly where
    * the direct form cast). */
  def attributionFromCells(c: DataFrame): DataFrame = {
    val opening = c.groupBy(col("class_from").as("cls"))
      .agg(sum(col("cell_from_dec")).cast("double").as("opening"))
    val closing = c.groupBy(col("class_to").as("cls"))
      .agg(sum(col("cell_to_dec")).cast("double").as("closing"))
    val moved = c.filter(col("class_from") =!= col("class_to"))
    val inflow = moved.groupBy(col("class_to").as("cls"))
      .agg(sum(col("cell_from_dec")).cast("double").as("inflow"))
    val outflow = moved.groupBy(col("class_from").as("cls"))
      .agg(sum(col("cell_from_dec")).cast("double").as("outflow"))
    val growth = c.groupBy(col("class_to").as("cls"))
      .agg(sum(col("cell_growth_dec")).cast("double").as("growth"))
    opening
      .join(closing, Seq("cls"), "full")
      .join(inflow, Seq("cls"), "full")
      .join(outflow, Seq("cls"), "full")
      .join(growth, Seq("cls"), "full")
      .select(col("cls"),
        coalesce(col("opening"), lit(0.0)).as("opening"),
        coalesce(col("inflow"), lit(0.0)).as("inflow"),
        coalesce(col("outflow"), lit(0.0)).as("outflow"),
        coalesce(col("growth"), lit(0.0)).as("growth"),
        coalesce(col("closing"), lit(0.0)).as("closing"))
  }
}
