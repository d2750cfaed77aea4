package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-layer protection look-through (reference
  * `engine/crm/look_through.py`; PRA PS1/26 Art. 191A(2)(d)-(f)): the
  * funded-only election — when an unfunded guarantee is itself
  * collateralised by funded collateral posted by the guarantor,
  * recognise ONLY the funded collateral:
  *
  *  1. collateral rows whose beneficiary points at an electing
  *     guarantee RE-ANCHOR onto the guarantee's own beneficiary (the
  *     obligor exposure);
  *  2. the electing guarantee row is SUPPRESSED (no Art. 235
  *     substitution runs for it);
  *  3. a `both` election is not implemented and is treated as `none`,
  *     with the audit warning the reference emits.
  *
  * Spark-first shape: where the reference collects the election frame
  * driver-side and rewrites rows in memory, this stays distributed —
  * one left join of the collateral book against the (small) electing
  * slice re-anchors in place; the guarantee suppression is a filter.
  * Presence-tolerant: without a `look_through_election` carrier both
  * books pass through unchanged (the reference's legacy fast path).
  */
object LookThrough {

  /** (guarantees', collateral', warnings) after honouring the election.
    * `warnings` carries one row per (guarantee, code):
    * CRM_LOOK_THROUGH_APPLIED for honoured funded-only elections,
    * CRM_LOOK_THROUGH_NOT_IMPLEMENTED for `both`. */
  def applyFundedOnly(guarantees: DataFrame, collateral: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    if (!guarantees.columns.contains("look_through_election"))
      // legacy fast path: the warnings frame still carries the declared
      // (guarantee_reference, code, severity) schema — an empty
      // zero-column frame would throw AnalysisException in any caller
      // that selects/filters/unions the documented columns
      return (guarantees, collateral,
        guarantees.filter(lit(false)).select(
          col("guarantee_reference"),
          lit(null).cast("string").as("code"),
          lit(null).cast("string").as("severity")))
    val election = coalesce(col("look_through_election"), lit("none"))
    val flagged = guarantees.filter(election === "funded_only")
      .select(
        col("guarantee_reference").as("_lt_ref"),
        col("beneficiary_type").as("_lt_bt"),
        col("beneficiary_reference").as("_lt_br"))
    val coll2 = collateral
      .join(flagged,
        // the reference matches 'guarantee' case-insensitively
        lower(col("beneficiary_type")) === "guarantee" &&
          col("beneficiary_reference") === col("_lt_ref"), "left")
      .withColumn("re_anchored", col("_lt_ref").isNotNull)
      .withColumn("beneficiary_type",
        when(col("re_anchored"), col("_lt_bt")).otherwise(col("beneficiary_type")))
      .withColumn("beneficiary_reference",
        when(col("re_anchored"), col("_lt_br"))
          .otherwise(col("beneficiary_reference")))
      .drop("_lt_ref", "_lt_bt", "_lt_br")
    val guar2 = guarantees.filter(election =!= "funded_only")
    val warnings = guarantees
      .withColumn("code",
        when(election === "funded_only", "CRM_LOOK_THROUGH_APPLIED")
          .when(election === "both", "CRM_LOOK_THROUGH_NOT_IMPLEMENTED"))
      .filter(col("code").isNotNull)
      .select(col("guarantee_reference"), col("code"),
        lit("WARNING").as("severity"))
    (guar2, coll2, warnings)
  }
}
