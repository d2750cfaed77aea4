package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Pillar-3 SA credit-risk population scope (reference
  * `reporting/pillar3/sa_scope.py:67-98`): the shared CR4/CR5 narrowing
  * applied BEFORE either template executes, so every CR4 row computes
  * every column over the SAME population.
  *
  * Two symmetric jobs, one discriminator (`exposure_type`):
  *
  *  - EXCLUDE the non-credit-risk synthetic legs entirely: SA-CCR
  *    derivative / FCCM SFT netting sets (`ccr_netting_set`), CCP
  *    default-fund contributions (`ccr_default_fund`, CRR Art. 307-309)
  *    and settlement failed trades (`ccr_failed_trade`, Art. 378-380).
  *    Under CRR these carry the standardised approach label and so pass
  *    a naive approach-origin filter — they leak into the class-total /
  *    RWEA columns while being absent from the on/off-balance-sheet
  *    split columns (whose side carrier is null for these types), so an
  *    unscoped template does not internally reconcile. CR4/CR5 are SA
  *    CREDIT risk (CRR Art. 444(e)); CCR and settlement risk disclose in
  *    the CCR-series templates (Art. 439) instead.
  *
  *  - CLASSIFY the genuine credit-risk commitment leg the sealed
  *    discriminator leaves null: the synthetic `facility_undrawn`
  *    undrawn-headroom row is an off-balance-sheet commitment (CRR
  *    Art. 111), so the scope patches `reporting_on_balance_sheet` to
  *    false LOCALLY — the sealed contract keeps it null because other
  *    templates (CR6/CR10) make their own scope decisions.
  *
  * Deliberately LOCAL to the Pillar-3 SA templates: COREP C 07.00
  * INCLUDES the CCR rows by Annex II (rows 0090-0130), so reusing this
  * scope there would wrongly strip rows the template requires — the
  * reference records this as the reason the exposure-type set is not a
  * shared constant (`sa_scope.py:10-17`).
  *
  * Scale shape: a pure Column filter plus one conditional projection —
  * fully pushed into the scan, no shuffle, no UDF.
  */
object SaScope {

  /** exposure_type values whose EAD/RWA is not an SA credit-risk
    * requirement (reference `sa_scope.py:67-71` _EXCLUDED_EXPOSURE_TYPES). */
  val excludedExposureTypes: Seq[String] =
    Seq("ccr_netting_set", "ccr_default_fund", "ccr_failed_trade")

  /** Narrow a ledger frame to the CR4/CR5 SA credit-risk population.
    *
    * Presence-tolerant like the reference (`sa_scope.py:86-92`): with no
    * `exposure_type` carrier the frame passes through unchanged; a null
    * `exposure_type` is never excluded (only an explicit match against
    * the non-credit-risk set removes a row); the balance-sheet patch
    * applies only when the frame carries `reporting_on_balance_sheet`.
    */
  def saCreditRiskPopulation(df: DataFrame): DataFrame = {
    if (!df.columns.contains("exposure_type")) df
    else {
      val excluded =
        coalesce(col("exposure_type").isin(excludedExposureTypes: _*), lit(false))
      val filtered = df.filter(!excluded)
      if (!df.columns.contains("reporting_on_balance_sheet")) filtered
      else filtered.withColumn(
        "reporting_on_balance_sheet",
        when(col("exposure_type") === "facility_undrawn", lit(false))
          .otherwise(col("reporting_on_balance_sheet")))
    }
  }
}
