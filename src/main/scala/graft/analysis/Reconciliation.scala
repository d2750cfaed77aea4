package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-run comparison / reconciliation (reference
  * `analysis/reconciliation.py` ~1356 LoC; `analysis/comparison.py`):
  * full-outer join on the composite key, then per-component delta
  * bucketing into the reference's five-way taxonomy
  * (`reconciliation.py:67-71`), summary group-bys, and a break worklist
  * ordered by materiality (`:1120`).
  */
object Reconciliation {

  val Buckets = Seq("exact_match", "within_tolerance", "break",
    "missing_left", "missing_right")

  /** Full-outer compare of one measure column across two frames.
    * Output grain = key; columns: key cols, ours, theirs, delta, bucket.
    */
  def compare(
      ours: DataFrame, theirs: DataFrame, keys: Seq[String],
      measure: String, absTolerance: Double = 0.005): DataFrame = {
    val l = ours.select((keys.map(col) :+ col(measure).as("ours")): _*)
    val r = theirs.select((keys.map(col) :+ col(measure).as("theirs")): _*)
    l.join(r, keys, "full")
      .withColumn("delta",
        when(col("ours").isNull || col("theirs").isNull, lit(null))
          .otherwise(col("ours") - col("theirs")))
      .withColumn("bucket",
        when(col("ours").isNull, "missing_left")
          .when(col("theirs").isNull, "missing_right")
          .when(col("ours") === col("theirs"), "exact_match")
          .when(abs(col("delta")) <= absTolerance, "within_tolerance")
          .otherwise("break"))
  }

  /** Bucket summary: counts + absolute materiality per bucket. */
  def summary(recon: DataFrame): DataFrame =
    recon.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           sum(coalesce(abs(col("delta")), lit(0.0))).as("abs_materiality"))
      .orderBy(col("bucket"))

  /** Break worklist: the breaks ordered by descending materiality with a
    * deterministic key tiebreak (the reference's analyst queue). */
  def breakWorklist(recon: DataFrame, keys: Seq[String], limit: Int = 100): DataFrame =
    recon.filter(col("bucket") === "break")
      .orderBy((abs(col("delta")).desc +: keys.map(col)): _*)
      .limit(limit)
}
