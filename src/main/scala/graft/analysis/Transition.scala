package graft.analysis

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
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

  /** The (class_from, class_to) migration matrix with exact sums. */
  def migrationMatrix(j: DataFrame): DataFrame =
    j.groupBy(col("class_from"), col("class_to"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("measure_from"), 2).as("opening_measure"),
        dsum(col("measure_to"), 2).as("closing_measure"))

  /** Per-class roll-forward: closing = opening + inflow − outflow +
    * growth. Inflow/outflow carry the OPENING measure of migrating rows;
    * growth is the measure delta of every row landing in the class. */
  def attribution(j: DataFrame): DataFrame = {
    val opening = j.groupBy(col("class_from").as("cls"))
      .agg(dsum(col("measure_from"), 2).as("opening"))
    val closing = j.groupBy(col("class_to").as("cls"))
      .agg(dsum(col("measure_to"), 2).as("closing"))
    val inflow = j.filter(col("class_from") =!= col("class_to"))
      .groupBy(col("class_to").as("cls"))
      .agg(dsum(col("measure_from"), 2).as("inflow"))
    val outflow = j.filter(col("class_from") =!= col("class_to"))
      .groupBy(col("class_from").as("cls"))
      .agg(dsum(col("measure_from"), 2).as("outflow"))
    val growth = j.groupBy(col("class_to").as("cls"))
      .agg(dsum(col("measure_to") - col("measure_from"), 2).as("growth"))
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
