package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Q._

/** Delta-attributor registry for capital-impact analysis (reference
  * `analysis/attribution.py` — the registry keyed on the comparison's
  * `(baseline_label, variant_label)` with the neutral fallback — plus
  * the CRR→B31 attributor that registers itself from
  * `analysis/comparison.py`).
  *
  * A comparison's RWA delta can be decomposed into named regulatory
  * drivers, but the decomposition is PAIRING-SPECIFIC: the CRR→Basel-3.1
  * waterfall is one registered attributor keyed on the run pairing;
  * any unregistered pairing falls back to the neutral delta-only
  * attributor (total delta per class, no driver decomposition) — the
  * reference's regime-agnostic fallback, so an election-vs-election
  * comparison still renders.
  *
  * The CRR→B31 attributor decomposes per exposure in THIS rulebook's
  * vocabulary (the reference's 1.06-scaling / supporting-factor drivers
  * key off engine features this SA-style dual-weight book does not
  * carry; its regime delta is entirely weight-table repricing):
  * the collateral leg prices at the flat weight under both regimes
  * (zero driver by construction), so the delta splits exactly into the
  * GUARANTEE-leg repricing (the substituted min-weight moves with the
  * regime's institution scale) and the UNSECURED-leg repricing (the
  * obligor's own weight moves), each scaled by the row's supporting
  * factor — plus a methodology residual emitted to prove the
  * decomposition is complete (the reference's residual-driver
  * discipline). On supporting-factor rows the residual absorbs ONLY the
  * per-row cent-rounding of splitting one quantised product into two
  * (bounded by a cent per row, spec-pinned); on factor-1 rows it is
  * exactly zero.
  */
object Attribution {

  /** An attributor: per-exposure ledger → per-class driver frame. */
  type Attributor = DataFrame => DataFrame

  private val registry =
    scala.collection.concurrent.TrieMap[(String, String), Attributor]()

  def register(pair: (String, String), fn: Attributor): Unit =
    registry.put(pair, fn)

  /** The attributor for a pairing — the neutral delta-only fallback for
    * any unregistered pair. */
  def attributorFor(pair: (String, String)): Attributor =
    registry.getOrElse(pair, neutral)

  /** Neutral fallback: the total RWA delta per class, no drivers. */
  val neutral: Attributor = led =>
    led.groupBy(col("exposure_class"))
      .agg(dsum(q2(col("rwa_b31") - col("rwa")), 2).as("delta_rwa"))
      .orderBy(col("exposure_class"))

  /** The CRR→B31 leg-repricing waterfall (registered at init). */
  val crrToB31: Attributor = { led =>
    def leg(rwCol: String): Column =
      q2(col("guar_covered") *
        least(col(rwCol), coalesce(col("guarantor_rw"), col(rwCol))))
    val guarDelta = q2(
      (leg("own_rw_b31") - leg("own_rw")) * col("sf_factor"))
    val unsecDelta = q2(
      (q2(col("unsecured") * col("own_rw_b31")) -
        q2(col("unsecured") * col("own_rw"))) * col("sf_factor"))
    led.groupBy(col("exposure_class"))
      .agg(
        dsum(q2(col("rwa_b31") - col("rwa")), 2).as("delta_rwa"),
        dsum(guarDelta, 2).as("driver_guarantee_repricing"),
        dsum(unsecDelta, 2).as("driver_unsecured_repricing"))
      .withColumn("driver_residual",
        q2(col("delta_rwa") - col("driver_guarantee_repricing") -
          col("driver_unsecured_repricing")))
      .orderBy(col("exposure_class"))
  }

  register(("crr", "b31"), crrToB31)
}
