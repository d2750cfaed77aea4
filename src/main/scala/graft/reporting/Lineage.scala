package graft.reporting

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Q._

/** Estate-wide cell lineage keying (reference `reporting/lineage.py`:
  * every published template keys its execution plan, so ANY reported
  * cell is drillable back to the exposure rows and the measure that
  * produced it).
  *
  * A cell id is `TEMPLATE|axis…|column` and resolves to (prepare,
  * predicate, measure): `prepare` re-derives the template's working
  * frame from the sealed ledger exactly as the sheet build does (shared
  * functions — `Corep08.c08Prepare`, `Domain.cr9Prepare` — so drill and
  * sheet cannot drift), `predicate` is the row's subset and `measure`
  * the column's summand, accumulated in DECIMAL(38, scale) like the
  * published cell. Templates keyed:
  *
  *  - `C07|R_<class>|C<col>` — the C 07.00 catalogue (`Domain.c07Cells`)
  *  - `C08|R<row>|C<col>` — C 08.01 (`Corep08.c08Cells`, leg-derived)
  *  - `C0802|<class>|<band>|<col>` (also `C0803|…`) — the PD-band grids
  *  - `C0901|<country>|<row>|<col>` / `C0902|…` — the geo templates
  *  - `C02|<row>|<crr|b31>` — the ledger-backed own-funds class rows
  *  - `CR4|<class|total>|<col>` — the Pillar-3 SA disclosure
  *  - `CR9|<class_key>|<band>|<col>` — PD back-testing (distinct-obligor
  *    cells resolve via `distinctKey`)
  *
  * Formula cells (densities, weighted-average parameters) are derived
  * ratios of other cells and deliberately do NOT resolve — drill their
  * numerator/denominator cells instead, the reference's own contract
  * (`lineage.py` keys plans, `Formula` cells carry no frame binding).
  */
object Lineage {

  /** One drillable cell: re-derive `prepare(ledger)`, slice by
    * `predicate`, and the reported value is the DECIMAL(38, scale) sum
    * of `measure` — or `countDistinct(distinctKey)` when set. */
  final case class ResolvedCell(
      prepare: DataFrame => DataFrame,
      predicate: Column,
      measure: Column,
      scale: Int = 2,
      distinctKey: Option[Column] = None)

  import graft.queries.{Corep08, Corep09, Domain, Pillar3}

  private val collRw = graft.engine.DomainPipeline.collateralRw

  private def orig = col("drawn_base") + col("undrawn_base")

  /** C 09.01 row membership — mirrors q158's fan exactly. */
  private def c0901RowPred(ref: String): Option[Column] = ref match {
    case "0010" => Some(col("exposure_class") === "sovereign")
    case "0060" => Some(col("exposure_class") === "institution")
    case "0070" => Some(col("exposure_class").isin("corporate", "sme_corporate"))
    case "0075" => Some(col("exposure_class") === "sme_corporate")
    case "0080" => Some(col("exposure_class") === "retail")
    case "0085" => Some(col("exposure_class") === "retail" &&
      col("turnover") < 50000000.0)
    case "0100" => Some(col("is_defaulted"))
    case "0170" => Some(lit(true))
    case _ => None // inert rows carry no population to drill
  }

  private def c0901Measure(ref: String): Option[(Column, Int)] = ref match {
    case "c0010" => Some((orig, 2))
    case "c0020" => Some((when(col("is_defaulted"), orig).otherwise(0.0), 2))
    case "c0040" => Some((when(col("is_defaulted"), 1.0).otherwise(0.0), 0))
    case "c0050" | "c0060" | "c0061" | "c0082" => Some((lit(0.0), 2))
    case "c0055" => Some((col("provision_deducted"), 2))
    case "c0070" => Some((when(col("is_defaulted"), col("provision_deducted"))
      .otherwise(0.0), 2))
    case "c0075" => Some((col("ead_pre_crm"), 2))
    case "c0080" => Some((col("rwa_pre_sf"), 2))
    // the REPORTED (post-sign-pass) adjustment: negative by construction
    case "c0081" => Some((col("rwa") - col("rwa_pre_sf"), 2))
    case "c0090" => Some((col("rwa"), 2))
    case _ => None
  }

  private def c0902RowPred(ref: String): Option[Column] = ref match {
    case "0020" => Some(col("exposure_class") === "institution")
    case "0030" => Some(col("exposure_class") === "corporate")
    case "0150" => Some(lit(true))
    case _ => None
  }

  /** q160's IRB parameter prep (pd/lgd re-derived from the exposure key). */
  private def c0902Prepare(led: DataFrame): DataFrame = {
    val k = expr("CAST(substring(exposure_reference, 5) AS BIGINT)")
    led.filter(col("approach") === "IRB")
      .withColumn("pd_floored",
        greatest(lit(0.0001) + (k % 997).cast("double") * lit(0.001),
          lit(0.0003)))
      .withColumn("lgd_floored",
        greatest((k % 60).cast("double") * lit(0.01), lit(0.05)))
  }

  private def c0902Measure(ref: String): Option[(Column, Int)] = ref match {
    case "c0010" => Some((orig, 2))
    case "c0030" => Some((when(col("is_defaulted"), orig).otherwise(0.0), 2))
    case "c0040" => Some((when(col("is_defaulted"), 1.0).otherwise(0.0), 0))
    case "c0050" | "c0060" | "c0122" => Some((lit(0.0), 2))
    // the provisions-ladder carrier: the SCRA base is structurally 0.0
    // on IRB legs, so the REPORTED cell is the allocated sum (R10b)
    case "c0055" => Some((col("provision_allocated"), 2))
    case "c0070" => Some((when(col("is_defaulted"), col("provision_allocated"))
      .otherwise(0.0), 2))
    case "c0105" => Some((col("ead_pre_crm"), 2))
    case "c0110" => Some((col("rwa_pre_sf"), 2))
    case "c0120" => Some((when(col("is_defaulted"), col("rwa")).otherwise(0.0), 2))
    case "c0121" => Some((col("rwa") - col("rwa_pre_sf"), 2))
    case "c0125" => Some((col("rwa"), 2))
    case "c0130" => Some((col("pd_floored") * col("lgd_floored") *
      col("ead_pre_crm"), 8))
    case _ => None // c0080/c0090/c0100 are Formula cells
  }

  /** q128's band-grid prep (alloc_pd over the IRB slice). */
  private def c0802Prepare(led: DataFrame): DataFrame = {
    val k = expr("CAST(substring(exposure_reference, 5) AS BIGINT)")
    led.filter(col("approach") === "IRB")
      .withColumn("pd_floored",
        greatest(lit(0.0001) + (k % 997).cast("double") * lit(0.001),
          lit(0.0003)))
      .withColumn("lgd_floored",
        greatest((k % 60).cast("double") * lit(0.01), lit(0.05)))
      .withColumn("alloc_pd",
        when(col("is_defaulted"), lit(1.0)).otherwise(col("pd_floored")))
  }

  private def bandPred(ref: String): Option[Column] =
    if (ref == "ALL") Some(lit(true))
    else ref.toIntOption.flatMap(r =>
      Pillar3.cr6Bands.find(_._1 == r).map { case (_, _, lo, hi) =>
        col("alloc_pd") >= lo && col("alloc_pd") < hi
      })

  private def c0802Measure(ref: String): Option[(Column, Int, Option[Column])] =
    ref match {
      case "orig_exposure" => Some((col("ead_pre_crm"), 2, None))
      case "subst_outflow" => Some((col("guar_covered"), 2, None))
      case "net_origin_exposure" =>
        Some((q2(col("ead_pre_crm") - col("guar_covered")), 2, None))
      case "rwea" => Some((col("rwa"), 2, None))
      case "expected_loss" => Some((q2(col("pd_floored") * col("lgd_floored") *
        col("ead_pre_crm")), 2, None))
      case "n_exposures" => Some((lit(1.0), 0, None))
      case "n_obligors" => Some((lit(1.0), 0,
        Some(col("counterparty_reference"))))
      case _ => None
    }

  /** q140's substitution legs (SME-factored, per regime). */
  private def ogLeg(b31: Boolean): Column = {
    val rw = if (b31) col("own_rw_b31") else col("own_rw")
    q2((q2(col("coll_covered") * lit(collRw)) + q2(col("unsecured") * rw)) *
      col("sf_factor"))
  }
  private def giLeg(b31: Boolean): Column = {
    val rw = if (b31) col("own_rw_b31") else col("own_rw")
    q2(q2(col("guar_covered") * least(rw, coalesce(col("guarantor_rw"), rw))) *
      col("sf_factor"))
  }

  /** The ledger-backed C 02.00 class rows (q140 vocabulary): the
    * collateral + unsecured legs stay on the obligor's class row, the
    * guaranteed leg lands on the approach's institutions row. Composite
    * rows whose value includes the non-ledger components (CCR, CVA,
    * settlement — rows 0010/0040/0050/0060) do not key the ledger alone
    * and are not resolvable here. */
  private def c02Cell(rowRef: String, regime: String): Option[Column] = {
    val b31 = regime == "b31"
    def m(app: String, classes: Seq[String]): Column =
      when(col("approach") === app &&
        col("exposure_class").isin(classes: _*), ogLeg(b31)).otherwise(0.0)
    def inflow(app: String): Column =
      when(col("approach") === app, giLeg(b31)).otherwise(0.0)
    def flat(app: String): Column =
      when(col("approach") === app,
        if (b31) col("rwa_b31") else col("rwa")).otherwise(0.0)
    rowRef match {
      case "0070" => Some(m("SA", Seq("sovereign")))
      case "0120" => Some(m("SA", Seq("institution")) + inflow("SA"))
      case "0130" => Some(m("SA", Seq("corporate", "sme_corporate")))
      case "0140" => Some(m("SA", Seq("retail")))
      case "0220" | "0240" => Some(flat("IRB"))
      case "0250" => Some(m("IRB", Seq("institution")) + inflow("IRB"))
      case "0260" => Some(m("IRB", Seq("corporate", "sme_corporate")))
      case _ => None
    }
  }

  /** The CR5 band grid (q161 vocabulary): per-CRM-leg exposure values
    * banded on the applied weight over the SaScope-narrowed SA book. */
  private def cr5Prepare(led: DataFrame): DataFrame =
    Pillar3.cr5Legs(graft.operators.SaScope.saCreditRiskPopulation(
      led.filter(col("approach") === "SA")))

  private def cr5Measure(ref: String): Option[Column] = ref match {
    case "total_ev" => Some(col("ev"))
    case "unrated_ev" => Some(when(col("own_cqs").isNull, col("ev"))
      .otherwise(0.0))
    case band => Pillar3.cr5Bands.find(_._1 == band).map { case (_, w) =>
      when(abs(col("leg_rw") - w) < 0.005, col("ev")).otherwise(0.0)
    } // other_deducted is the Formula residual — drill the bands
  }

  /** The CR4 sheet columns (q102 vocabulary) over the SA-scoped book. */
  private def cr4Measure(ref: String): Option[Column] = ref match {
    case "on_bs_pre" => Some(col("drawn_base"))
    case "off_bs_pre" => Some(col("undrawn_base"))
    case "on_bs_post" =>
      Some(greatest(col("drawn_base") - col("provision_on_drawn"), lit(0.0)))
    case "off_bs_post" => Some(q2(
      (col("undrawn_base") - col("provision_on_nominal")) * col("ccf_eff")))
    case "rwea" => Some(col("rwa"))
    case _ => None // rwea_density is a Formula cell
  }

  private def cr9Measure(ref: String): Option[(Column, Int, Option[Column])] =
    ref match {
      case "n_obligors" => Some((lit(1.0), 0,
        Some(col("counterparty_reference"))))
      case "n_defaulted" => Some((lit(1.0), 0,
        Some(when(col("is_defaulted"), col("counterparty_reference")))))
      case "n_exposures" => Some((lit(1.0), 0, None))
      case "ead" => Some((col("ead_pre_crm"), 2, None))
      case "pd_num" => Some((q2(col("pd_floored") * col("ead_pre_crm")), 2, None))
      case _ => None // the pct columns are Formula cells
    }

  private def cr9BandPred(ref: String): Option[Column] =
    if (ref == "18" || ref == "ALL") Some(lit(true))
    else ref.toIntOption.map(r =>
      col("leaf_ref") === r || col("parent_ref") === r)

  /** Resolve a cell id to its drill plan; None = unknown cell or a
    * Formula cell with no frame binding. */
  def resolve(cellId: String): Option[ResolvedCell] = {
    val parts = cellId.split('|')
    parts.headOption match {
      case Some("C07") =>
        Domain.c07Cells.find(_.cellId == cellId).map(spec =>
          ResolvedCell(identity, spec.predicate, spec.measure, spec.scale))
      case Some("C08") =>
        Corep08.c08Cells.find(_.cellId == cellId).map(spec =>
          ResolvedCell(Corep08.c08Prepare, spec.predicate, spec.measure,
            spec.scale))
      case Some("C0802") | Some("C0803") if parts.length == 4 =>
        val Array(tpl, cls, band, colRef) = parts
        // C 08.03 (q144) publishes only the count / RWEA / EL measures of
        // the shared band-grid vocabulary — resolving a column the sheet
        // never prints (orig_exposure, subst_outflow, ...) would break
        // the drilled-value-matches-published-cell contract
        val published = tpl != "C0803" ||
          Set("n_exposures", "n_obligors", "rwea", "expected_loss")(colRef)
        for {
          _ <- if (published) Some(()) else None
          bp <- bandPred(band)
          (m, sc, dk) <- c0802Measure(colRef)
        } yield {
          val clsPred =
            if (cls == "ALL") lit(true) else col("exposure_class") === cls
          ResolvedCell(c0802Prepare, clsPred && bp, m, sc, dk)
        }
      case Some("C0901") if parts.length == 4 =>
        val Array(_, country, rowRef, colRef) = parts
        for {
          rp <- c0901RowPred(rowRef)
          (m, sc) <- c0901Measure(colRef)
        } yield {
          val cp = if (country == "ALL") lit(true) else col("country") === country
          ResolvedCell(identity, col("approach") === "SA" && cp && rp, m, sc)
        }
      case Some("C0902") if parts.length == 4 =>
        val Array(_, country, rowRef, colRef) = parts
        for {
          rp <- c0902RowPred(rowRef)
          (m, sc) <- c0902Measure(colRef)
        } yield {
          val cp = if (country == "ALL") lit(true) else col("country") === country
          ResolvedCell(c0902Prepare, cp && rp, m, sc)
        }
      case Some("C02") if parts.length == 3 =>
        c02Cell(parts(1), parts(2)).map(m =>
          ResolvedCell(identity, lit(true), m, 2))
      case Some("CR4") if parts.length == 3 =>
        cr4Measure(parts(2)).map { m =>
          val rowPred =
            if (parts(1) == "total") lit(true)
            else col("exposure_class") === parts(1)
          ResolvedCell(identity, col("approach") === "SA" && rowPred, m, 2)
        }
      case Some("CR5") if parts.length == 3 =>
        cr5Measure(parts(2)).map { m =>
          val rowPred =
            if (parts(1) == "total") lit(true)
            else col("row_class") === parts(1)
          ResolvedCell(cr5Prepare, rowPred, m, 2)
        }
      case Some("CR9") if parts.length == 4 =>
        val Array(_, clsKey, band, colRef) = parts
        for {
          bp <- cr9BandPred(band)
          (m, sc, dk) <- cr9Measure(colRef)
        } yield ResolvedCell(Domain.cr9Prepare,
          col("class_key") === clsKey && bp, m, sc, dk)
      case _ => None
    }
  }
}
