package graft.refbook

import RefCube._

/** COREP template renderers over the reporting cube, in the published grids
  * ([[RefLayouts]]): C 07.00 per obligor-class sheet, C 08.07, C 09.01 per
  * country, C 02.00, and OF 02.01 (Basel 3.1). Cell semantics mirror the
  * reference's declarative specs re-expressed over the cube:
  *
  *  - C 07.00: `reporting/corep/c07.py` (`_build_spec`/`_row_cells` column
  *    bindings, `_terms_for_row` row dispatch, `_prepare` discriminators,
  *    `postpass.null_empty_rows` + `negate_deduction_cols`);
  *  - C 08.07: `reporting/corep/c08_07.py` (`_c08_07_spec`, `_pct_ppu`,
  *    `_pct_irb`, the fixed structural-null row set);
  *  - C 09.01: `reporting/corep/c09.py` (`_c09_01_spec` — the ¶86/¶87
  *    two-basis country axis, the reverse class map, the 0020 memo);
  *  - C 02.00 / OF 02.00: `reporting/corep/c02.py` (`generate_c02_00`,
  *    `_aggregate_by_approach`, `_apply_b31_cols`);
  *  - OF 02.01: `reporting/corep/of02.py` (`_of_02_01_spec`).
  *
  * COREP's recorded empty-subset policy is `zero` (an unbound or empty cell
  * renders 0.0 on a populated row) with per-cell `null` overrides (the CCF
  * buckets), and rows whose basis-free membership subset is empty render
  * all-null (`null_empty_rows`). Deduction columns are emitted negative
  * after the waterfalls consume the positive magnitudes
  * (`negate_deduction_cols`; `-0.0` is normalised to `+0.0`).
  *
  * Everything here is driver-side assembly over the ONE distributed
  * aggregation [[RefCube.build]] runs — the Spark-shaped equivalent of the
  * reference collecting each template's population separately. The cube's
  * discriminator keys carry every ledger column these templates read, so
  * the assembly is exact, not approximate.
  *
  * Substitution inflows (C 07.00 col 0100 / C 08.01 col 0080 / C 08.02's
  * Unassigned row): computed from the cube's protection keys
  * (`post_crm_exposure_class_guaranteed`, `protection_type`,
  * `is_guarantee_beneficial`) and the capped unfunded carriers — each half
  * on the cap of the template that reported the matching outflow — routed
  * across the SA/IRB template boundary by the sealed post-substitution
  * approach, and banded on the sealed `reporting_rw`, which on a
  * beneficially-substituted leg IS the guarantor's Art. 235 weight
  * ([[RefBook]]'s substitution block). See [[inflows]].
  */
object RefCorep {

  type Terms = Seq[(String, Any)]

  /** One cell binding over the cube (the reference `cellspec` verbs the
    * COREP estate uses, minus the ones no template here needs). */
  private sealed trait Binding
  /** Sum a per-row magnitude over the cell's subset (`Sum`/`SafeSum`). */
  private final case class MSum(m: CRow => Double) extends Binding
  /** Structural null / constant (`Formula(refs=(), fn=_const(v))`). */
  private final case class FConst(v: Option[Double]) extends Binding
  /** Intra-row formula over already-computed column refs. */
  private final case class FFormula(refs: Seq[String],
      fn: Map[String, Option[Double]] => Option[Double]) extends Binding
  /** A named out-of-frame value (`SideContext` — the substitution inflow). */
  private final case class FSide(v: Double) extends Binding

  private final case class Cell(binding: Binding, pred: CRow => Boolean = _ => true,
      emptyNull: Boolean = false)

  /** Execute one template: pass 1 non-formula cells, pass 2 formulas —
    * exactly `cellspec.execute` with `empty_cell="zero"`. */
  private def execute(grid: RefLayouts.Grid, rows: Vector[CRow],
      cells: Map[(String, String), Cell]): Map[(String, String), Option[Double]] = {
    val computed = scala.collection.mutable.Map[(String, String), Option[Double]]()
    val formulas = scala.collection.mutable.ArrayBuffer[(String, String, FFormula)]()
    for ((rowRef, _) <- grid.rows; colRef <- grid.cols) {
      cells.get((rowRef, colRef)) match {
        case None => computed((rowRef, colRef)) = Some(0.0)
        case Some(Cell(f: FFormula, _, _)) => formulas += ((rowRef, colRef, f))
        case Some(Cell(FConst(v), _, _)) => computed((rowRef, colRef)) = v
        case Some(Cell(FSide(v), _, _)) => computed((rowRef, colRef)) = Some(v)
        case Some(Cell(MSum(m), pred, emptyNull)) =>
          val subset = rows.filter(pred)
          computed((rowRef, colRef)) =
            if (emptyNull && subset.isEmpty) None
            else Some(subset.iterator.map(m).sum)
      }
    }
    for ((rowRef, colRef, f) <- formulas) {
      val inputs = f.refs.map(r => r -> computed.getOrElse((rowRef, r),
        computed.getOrElse((r, colRef), Some(0.0)))).toMap
      computed((rowRef, colRef)) = f.fn(inputs)
    }
    computed.toMap
  }

  /** `postpass.null_empty_rows`: inert rows (None terms) and constrained
    * rows with an empty membership subset render all-null; `keep` exempts
    * inflow rows; an unconstrained (Total) row is never nulled. */
  private def nullEmptyRows(frame: RefFrame, sheetRows: Vector[CRow],
      rowPreds: Map[String, Option[CRow => Boolean]],
      constrained: Set[String], keep: Set[String]): RefFrame = {
    val nullRefs = rowPreds.collect {
      case (ref, None) if !keep(ref) => ref
      case (ref, Some(p)) if constrained(ref) && !keep(ref) &&
        !sheetRows.exists(p) => ref
    }.toSet
    frame.nullRows(nullRefs)
  }

  private def frameOf(grid: RefLayouts.Grid,
      computed: Map[(String, String), Option[Double]]): RefFrame =
    RefFrame(grid.rows, grid.cols,
      (for { (r, _) <- grid.rows; c <- grid.cols }
        yield ((r, c), computed.getOrElse((r, c), None))).toMap)

  // ---- shared discriminators (reference `c07.py::_prepare` ladder) -------

  private val ccrRiskTypes = Set("CCR_SFT", "CCR_DERIVATIVE", "CCR_DEFAULT_FUND")
  /** The four exposure types whose gross lives on the per-side carriers —
    * any other leg carries its original exposure on drawn+undrawn
    * (`c07_ccr_gross`, `c07.py:688`). */
  private val sideCarrierTypes = Set("loan", "contingent", "facility_undrawn", "facility")

  def isCcr(r: CRow): Boolean = r.s("risk_type").exists(ccrRiskTypes)
  private def bsSide(r: CRow): Option[String] = r.s("exposure_type") match {
    case Some("loan") => Some("on")
    case Some(t) if Set("facility", "contingent", "facility_undrawn")(t) => Some("off")
    case _ => None
  }
  private def qccp(r: CRow): Boolean =
    r.s("cp_entity_type").contains("ccp") && r.b("cp_is_qccp").forall(identity)
  private def smeClass(r: CRow): Boolean =
    r.s("exposure_class").exists(_.contains("sme"))
  private def round4(x: Double): Double = math.rint(x * 1e4) / 1e4

  /** Gross original exposure — `SafeSum(on_bs, off_bs, c07_ccr_gross)`:
    * the side carriers for the credit legs, drawn+undrawn for CCR /
    * settlement legs (whose side carriers are null by design). */
  private def grossAll(r: CRow): Double =
    if (r.s("exposure_type").exists(sideCarrierTypes)) gOn(r) + gOff(r)
    else r.m("reporting_gross_drawn") + r.m("reporting_gross_undrawn")
  private def gOn(r: CRow): Double = r.m("reporting_gross_on_bs")
  private def gOff(r: CRow): Double = r.m("reporting_gross_off_bs")
  private def sfDelta(r: CRow): Double = r.m("rwa_pre_factor") - r.m("rwa_final")

  /** Risk-weight band label for one cube row (`_rw_band_expr`): the grid's
    * own `%`-named band rows are the ladder; no match → the catch-all. */
  private def rwBand(bands: Seq[(Double, String)])(r: CRow): Option[String] =
    r.d("reporting_rw").map { rw =>
      bands.find { case (v, _) => round4(rw) == round4(v) }
        .map(_._2).getOrElse("Other risk weights")
    }

  /** The `%`-named band rows of a C 07.00 grid, in published order. */
  private def bandLadder(grid: RefLayouts.Grid): Seq[(Double, String)] =
    grid.rows.collect {
      case (_, name) if name.nonEmpty && name.endsWith("%") &&
        name.dropRight(1).forall(c => c.isDigit || c == '.') =>
        (name.dropRight(1).toDouble / 100.0, name)
    }

  private def ccfBucket(fw: String)(r: CRow): Option[String] = {
    val map: Seq[(Double, String)] =
      if (fw == "BASEL_3_1")
        Seq(0.1 -> "0160", 0.2 -> "0170", 0.4 -> "0171", 0.5 -> "0180", 1.0 -> "0190")
      else Seq(0.0 -> "0160", 0.2 -> "0170", 0.5 -> "0180", 1.0 -> "0190")
    r.d("ccf").flatMap(c => map.find { case (v, _) => round4(c) == round4(v) }.map(_._2))
  }

  // ---- two-basis population / sheet keys (`kernel/bases.py`) -------------

  /** Art. 112 Table A2: SL is a corporate sub-type under SA. */
  private def mergeSl(c: String): String =
    if (c == "specialised_lending") "corporate" else c
  private def popOrigin(r: CRow): Boolean =
    r.s("reporting_approach_origin").contains("standardised") ||
      r.s("reporting_approach_origin").contains("standardised_ccr") || isCcr(r)
  private def popPost(r: CRow): Boolean =
    r.s("reporting_approach").contains("standardised") ||
      r.s("reporting_approach").contains("standardised_ccr") || isCcr(r)
  private def classOrigin(r: CRow): Option[String] =
    r.s("reporting_class_origin").map(mergeSl)
  private def classPost(r: CRow): Option[String] =
    r.s("reporting_class").map(mergeSl)

  // ---- substitution inflows (C 07.00 col 0100 / C 08.01 col 0080;
  // reference `corep/crm_substitution.py::irb_origin_inflows` +
  // `c07.py::_sa_inflows` / `_add_sa_origin_inflows`) --------------------

  /** One destination class's inflow on every axis the templates publish:
    * `total` → C 07.00 r0010 / C 08.01 r0010; `onBs`/`offBs` → C 08.01
    * r0020/r0030 and C 07.00 r0070/r0080; `graded`/`slotting` → C 08.01
    * r0070/r0080 (C 08.02 takes `graded` on its Unassigned row); `byBand`
    * → the C 07.00 risk-weight band rows, measured on the substituted
    * leg's `reporting_rw` — the GUARANTOR's weight, because only
    * beneficially-substituted legs are counted (`_band_split`'s
    * load-bearing precondition). */
  final case class Inflow(total: Double = 0.0, onBs: Double = 0.0,
      offBs: Double = 0.0, graded: Double = 0.0, slotting: Double = 0.0,
      byBand: Map[String, Double] = Map.empty)

  private val irbOriginApproaches = Set("foundation_irb", "advanced_irb", "slotting")

  /** Per-destination-class inflows, computed over the WHOLE cube (routing
    * across the SA/IRB template boundary is the point) and routed by the
    * sealed POST approach: IRB destinations land on C 08.01
    * (`destinationIrb = true`), the SA complement on C 07.00. Each half is
    * measured with the cap of the template that reported the matching
    * OUTFLOW: IRB-origin legs on the IRB-capped carrier, SA-origin legs
    * (C 07.00 only — an SA origin can never reach an IRB destination) on
    * C 07.00's own provision-netted cap. Only beneficially-substituted
    * legs count — a declined guarantee's carrier is already zero. */
  def inflows(cube: Vector[CRow], destinationIrb: Boolean,
      bands: Seq[(Double, String)] = Nil,
      mergeClasses: Boolean = false): Map[String, Inflow] = {
    def migrated(r: CRow, m: String): Boolean =
      r.is("is_guarantee_beneficial") &&
        r.s("post_crm_exposure_class_guaranteed").isDefined && r.m(m) > 0.0
    def irbOrigin(r: CRow) =
      r.s("reporting_approach_origin").exists(irbOriginApproaches)
    def destIrb(r: CRow) = r.s("reporting_approach").exists(irbOriginApproaches)
    val irbHalf = cube.iterator.filter(r => migrated(r, "prot_unfunded_irb") &&
      irbOrigin(r) && destIrb(r) == destinationIrb)
      .map(r => r -> r.m("prot_unfunded_irb")).toSeq
    val saHalf =
      if (destinationIrb) Nil
      else cube.iterator.filter(r => migrated(r, "prot_unfunded") &&
        popOrigin(r) && !irbOrigin(r))
        .map(r => r -> r.m("prot_unfunded")).toSeq
    (irbHalf ++ saHalf).groupBy { case (r, _) =>
      val k = r.s("post_crm_exposure_class_guaranteed").get
      if (mergeClasses) mergeSl(k) else k
    }.map { case (k, rs) =>
      def share(p: CRow => Boolean) =
        rs.iterator.collect { case (r, v) if p(r) => v }.sum
      // a leg the frame cannot place on a side joins the ON side — what
      // keeps on + off == total (`crm_substitution._off_bs`)
      val off = (r: CRow) => bsSide(r).contains("off")
      k -> Inflow(
        total = rs.iterator.map(_._2).sum,
        onBs = share(r => !off(r)),
        offBs = share(off),
        slotting = share(r => r.s("reporting_approach").contains("slotting")),
        graded = share(r => !r.s("reporting_approach").contains("slotting")),
        byBand =
          if (bands.isEmpty) Map.empty
          else rs.groupBy { case (r, _) => rwBand(bands)(r) }.collect {
            case (Some(b), vs) => b -> vs.iterator.map(_._2).sum
          }.filter(_._2 != 0.0))
    }
  }

  // =========================================================================
  // C 07.00 — per obligor-class sheet (reference `c07.py`)
  // =========================================================================

  /** Row membership terms per C 07.00 row ref (`_terms_for_row`, cols-aware
    * for the sealed vocabulary: `ppu_reason`/`sl_project_phase`/
    * `ciu_approach`/`equity_transitional_approach`/`equity_higher_risk`
    * are never sealed, so their terms match nothing and the rows render
    * null; an inert row returns None). */
  private def c07Terms(ref: String, name: String,
      bands: Seq[(Double, String)]): Option[Terms] = ref match {
    case "0010" => Some(Nil)
    case "0015" => Some(Seq("c07_defaulted" -> true))
    case "0020" => Some(Seq("c07_sme" -> true))
    case "0021" => Some(Seq("sl_type" -> "object_finance"))
    case "0022" => Some(Seq("sl_type" -> "commodities_finance"))
    case "0023" => Some(Seq("sl_type" -> "project_finance"))
    case "0024" => Some(Seq("sl_type" -> "project_finance", "sl_project_phase" -> "pre_operational"))
    case "0025" => Some(Seq("sl_type" -> "project_finance", "sl_project_phase" -> "operational"))
    case "0026" => Some(Seq("sl_type" -> "project_finance", "sl_project_phase" -> "high_quality_operational"))
    // B31 real-estate rows (`_RE_ROW_FILTERS` via `_re_terms`)
    case "0330" => Some(Seq("property_type" -> "residential"))
    case "0331" => Some(Seq("property_type" -> "residential", "c07_md" -> false))
    case "0332" => Some(Seq("property_type" -> "residential", "c07_md" -> true))
    case "0340" => Some(Seq("property_type" -> "commercial"))
    case "0341" => Some(Seq("property_type" -> "commercial", "c07_md" -> false, "c07_sme" -> false))
    case "0342" => Some(Seq("property_type" -> "commercial", "c07_md" -> true))
    case "0343" => Some(Seq("property_type" -> "commercial", "c07_md" -> false, "c07_sme" -> true))
    case "0344" => Some(Seq("property_type" -> "commercial", "c07_md" -> true, "c07_sme" -> true))
    case "0350" => Some(Seq("c07_has_property" -> true, "c07_qualifying_re" -> false))
    case "0351" => Some(Seq("c07_qualifying_re" -> false, "property_type" -> "residential", "c07_md" -> false))
    case "0352" => Some(Seq("c07_qualifying_re" -> false, "property_type" -> "residential", "c07_md" -> true))
    case "0353" => Some(Seq("c07_qualifying_re" -> false, "property_type" -> "commercial", "c07_md" -> false))
    case "0354" => Some(Seq("c07_qualifying_re" -> false, "property_type" -> "commercial", "c07_md" -> true))
    case "0360" => Some(Seq("is_adc" -> true))
    case "0030" => Some(Seq("is_sme" -> true, "sme_supporting_factor_applied" -> true))
    case "0035" => // CRR section-0 row only (B31's grid has no 0035 row)
      Some(Seq("is_infrastructure" -> true, "infrastructure_factor_applied" -> true))
    case "0050" => Some(Seq("c07_ppu" -> true))
    case "0060" => Some(Seq("ppu_reason" -> "art_148_rollout"))
    case "0070" => Some(Seq("c07_bs" -> "on"))
    case "0080" => Some(Seq("c07_bs" -> "off"))
    case "0090" => Some(Seq("risk_type" -> "CCR_SFT"))
    case "0100" => Some(Seq("risk_type" -> "CCR_SFT", "c07_qccp" -> true))
    case "0110" => Some(Seq("risk_type" -> "CCR_DERIVATIVE"))
    case "0120" => Some(Seq("risk_type" -> "CCR_DERIVATIVE", "c07_qccp" -> true))
    case "0281" => Some(Seq("ciu_approach" -> "look_through"))
    case "0282" => Some(Seq("ciu_approach" -> "mandate_based"))
    case "0283" => Some(Seq("ciu_approach" -> "fallback"))
    case "0290" => Some(Seq("property_type" -> "commercial"))
    case "0310" => Some(Seq("property_type" -> "residential"))
    case "0300" => Some(Seq("c07_defaulted" -> true, "c07_rw_band" -> "100%"))
    case "0320" => Some(Seq("c07_defaulted" -> true, "c07_rw_band" -> "150%"))
    case "0372" => Some(Seq("equity_transitional_approach" -> "sa_transitional"))
    case "0374" => Some(Seq("equity_transitional_approach" -> "irb_transitional"))
    case "0380" => Some(Seq("currency_mismatch_multiplier_applied" -> true))
    case _ if name.endsWith("%") &&
      name.dropRight(1).forall(c => c.isDigit || c == '.') =>
      Some(Seq("c07_rw_band" -> name))
    case _ if name == "Other risk weights" =>
      Some(Seq("c07_rw_band" -> "Other risk weights"))
    // 0130 (cross-product netting), 0040-CRR (residential-mortgage of-which
    // — no term in `_terms_for_row`), 0284/0285 (relevant-CIU of-which),
    // 0371/0373 (equity transitional higher-risk without the flag): inert.
    case _ => None
  }

  /** Resolve one C 07.00 discriminator for a cube row — None where the
    * source is null or (for the never-sealed columns) absent, so the
    * tolerant term matches nothing. */
  private def c07Key(fw: String, bands: Seq[(Double, String)])(
      r: CRow, key: String): Option[Any] = key match {
    case "c07_defaulted" => Some(r.is("is_defaulted"))
    case "c07_sme" => Some(smeClass(r))
    case "c07_bs" => bsSide(r)
    case "c07_qccp" => Some(qccp(r))
    case "c07_rw_band" => rwBand(bands)(r)
    case "c07_md" => r.b("materially_dependent_on_property")
    case "c07_has_property" => Some(r.s("property_type").isDefined)
    case "c07_qualifying_re" => Some(r.b("is_qualifying_re").getOrElse(true))
    case "c07_ccr" => Some(isCcr(r))
    case "c07_ccr_non_ccp" => Some(isCcr(r) && !r.s("cp_entity_type").contains("ccp"))
    case "c07_sl_own_rw" => Some(!r.is("is_guarantee_beneficial"))
    case "c07_ccf_bucket" => ccfBucket(fw)(r)
    case "risk_type" => r.s("risk_type")
    case "sl_type" => r.s("sl_type")
    case "property_type" => r.s("property_type")
    case "is_adc" => r.b("is_adc")
    case "is_sme" => r.b("is_sme")
    case "is_infrastructure" => Some(false) // sealed literal false (RefBook)
    case "sme_supporting_factor_applied" => r.b("sme_supporting_factor_applied")
    case "infrastructure_factor_applied" => r.b("infrastructure_factor_applied")
    case "currency_mismatch_multiplier_applied" =>
      r.b("currency_mismatch_multiplier_applied")
    // never sealed → absent column → match nothing
    case "c07_ppu" | "ppu_reason" | "sl_project_phase" | "ciu_approach" |
         "equity_transitional_approach" => None
    case _ => None
  }

  private def conj(resolve: (CRow, String) => Option[Any], terms: Terms)(
      r: CRow): Boolean =
    terms.forall { case (k, v) => resolve(r, k).contains(v) }

  /** Generate C 07.00 / OF 07.00: one frame per obligor-class sheet. */
  def c07(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "c07_00")
    val bands = bandLadder(grid)
    val resolve = c07Key(cfg.framework, bands) _
    val isB31 = cfg.isB31
    val inf = inflows(cube, destinationIrb = false, bands, mergeClasses = true)
    val pop = cube.filter(r => popOrigin(r) || popPost(r))
    val axis = (pop.flatMap(r =>
      (if (popOrigin(r)) classOrigin(r) else None) ++
        (if (popPost(r)) classPost(r) else None)).toSet ++ inf.keySet).toSeq.sorted
    if (pop.isEmpty && inf.isEmpty) return Map.empty

    val rowTerms: Map[String, Option[Terms]] =
      grid.rows.map { case (ref, name) => ref -> c07Terms(ref, name, bands) }.toMap
    val negCols = Set("0030", "0035", "0050", "0060", "0070", "0080", "0090",
      "0130", "0140", "0216", "0217")

    axis.map { ec =>
      val origin = (r: CRow) => popOrigin(r) && classOrigin(r).contains(ec)
      val post = (r: CRow) => popPost(r) && classPost(r).contains(ec)
      val sheet = pop.filter(r => origin(r) || post(r))
      val sheetInf = inf.getOrElse(ec, Inflow())
      val infTotal = sheetInf.total
      val infOn = sheetInf.onBs
      val infOff = sheetInf.offBs

      val cells = scala.collection.mutable.Map[(String, String), Cell]()
      for ((ref, _) <- grid.rows; terms <- rowTerms(ref)) {
        val t = conj(resolve, terms) _
        val o = (r: CRow) => origin(r) && t(r)
        val p = (r: CRow) => post(r) && t(r) &&
          (if (terms.exists(_._1 == "sl_type")) !r.is("is_guarantee_beneficial") else true)
        def put(c: String, cell: Cell): Unit = cells((ref, c)) = cell
        put("0010", Cell(MSum(grossAll), o))
        put("0020", Cell(FConst(None))) // own_funds_deduction_amount: never sealed
        put("0030", Cell(MSum(_.m("provision_deducted")), o))
        put("0050", Cell(MSum(_.m("prot_guarantee")), o))
        put("0060", Cell(MSum(_.m("prot_credit_derivative")), o))
        put("0070", Cell(MSum(_.m("prot_fcsm")), o))
        put("0080", Cell(MSum(_.m("prot_other_funded")), o))
        put("0090", Cell(FFormula(Seq("0050", "0060", "0070", "0080"), c =>
          Some(Seq("0050", "0060", "0070", "0080").map(c(_).getOrElse(0.0)).sum))))
        // inflow (col 0100, `_inflow_key_for`): the Total row takes the
        // whole inflow; a balance-sheet row its side's share; a
        // risk-weight band row the share banded at the GUARANTOR's
        // substituted weight (the leg's sealed reporting_rw — only
        // beneficially-substituted legs are counted, so the band is
        // Art. 235's, never the declined borrower's).
        val inflowKey: Option[Double] =
          if (ref == "0010") Some(infTotal)
          else terms match {
            case Seq(("c07_bs", "on")) => Some(infOn)
            case Seq(("c07_bs", "off")) => Some(infOff)
            case Seq(("c07_rw_band", b: String)) =>
              Some(sheetInf.byBand.getOrElse(b, 0.0))
            case _ => None
          }
        inflowKey.foreach(v => put("0100", Cell(FSide(v))))
        put("0110", Cell(FFormula(Seq("0040", "0090", "0100"), c =>
          Some(c("0040").getOrElse(0.0) - c("0090").getOrElse(0.0) +
            c("0100").getOrElse(0.0)))))
        put("0120", Cell(FFormula(Nil, _ => Some(0.0))))
        put("0130", Cell(MSum(_.m("collateral_adjusted_value")), o))
        put("0140", Cell(MSum(_.m("vol_mat_adj")), o))
        put("0150", Cell(FFormula(Seq("0110", "0130"), c =>
          Some(math.max(0.0, c("0110").getOrElse(0.0) - c("0130").getOrElse(0.0))))))
        put("0200", Cell(MSum(_.m("ead_final")), p))
        put("0210", Cell(MSum(_.m("ead_final")), r => p(r) && isCcr(r)))
        put("0211", Cell(MSum(_.m("ead_final")),
          r => p(r) && isCcr(r) && !r.s("cp_entity_type").contains("ccp")))
        put("0220", Cell(MSum(_.m("rwa_final")), p))
        put("0240", Cell(FConst(None)))
        if (isB31) {
          // on_bs_netting_amount is sealed (zero — no Art. 428 netting is
          // modelled), so the cell is a real Sum: 0.0 on populated rows.
          put("0035", Cell(MSum(_ => 0.0), o))
          put("0040", Cell(FFormula(Seq("0010", "0030", "0035"), c =>
            Some(c("0010").getOrElse(0.0) - c("0030").getOrElse(0.0) -
              c("0035").getOrElse(0.0)))))
          put("0230", Cell(FConst(None))) // sa_cqs never sealed
          put("0235", Cell(FConst(None)))
        } else {
          put("0040", Cell(FFormula(Seq("0010", "0030"), c =>
            Some(c("0010").getOrElse(0.0) - c("0030").getOrElse(0.0)))))
          put("0215", Cell(MSum(_.m("rwa_pre_factor")), p))
          put("0216", Cell(MSum(sfDelta),
            r => p(r) && r.is("sme_supporting_factor_applied")))
          put("0217", Cell(MSum(sfDelta),
            r => p(r) && r.is("infrastructure_factor_applied")))
          put("0230", Cell(FConst(None)))
        }
        // CCF buckets: pre-conversion off-BS gross per bucket, post basis,
        // off side, empty-subset → null (the recorded per-cell override).
        for (b <- Seq("0160", "0170", "0171", "0180", "0190") if grid.cols.contains(b))
          put(b, Cell(MSum(gOff),
            r => p(r) && ccfBucket(cfg.framework)(r).contains(b) &&
              bsSide(r).contains("off"),
            emptyNull = true))
      }

      val computed = execute(grid, sheet, cells.toMap)
      val rowPreds: Map[String, Option[CRow => Boolean]] = rowTerms.map {
        case (ref, None) => ref -> None
        case (ref, Some(terms)) => ref -> Some(conj(resolve, terms) _)
      }
      val constrainedRefs = rowTerms.collect {
        case (ref, Some(ts)) if ts.nonEmpty => ref
      }.toSet
      // rows carrying a NON-ZERO inflow survive the empty-row nulling
      // (`_inflow_rows`): an inflow-only destination sheet has no native
      // rows at all, and deleting the split is what broke the row-0010
      // decompositions there
      val bandKeep: Set[String] = rowTerms.collect {
        case (ref, Some(Seq(("c07_rw_band", b: String))))
          if sheetInf.byBand.getOrElse(b, 0.0) != 0.0 => ref
      }.toSet
      val keep: Set[String] = bandKeep ++
        (if (infTotal != 0.0) Set("0010") else Set.empty[String]) ++
          (if (infOn != 0.0) Set("0070") else Set.empty[String]) ++
          (if (infOff != 0.0) Set("0080") else Set.empty[String])
      val frame = nullEmptyRows(frameOf(grid, computed), sheet, rowPreds,
        constrainedRefs, keep)
      ec -> frame.negate(negCols)
    }.toMap
  }

  // =========================================================================
  // C 08.07 / OF 08.07 — IRB scope of use (reference `c08_07.py`)
  // =========================================================================

  private val c0807IrbApproaches = Set("foundation_irb", "advanced_irb", "slotting")
  private val crrC0807Rows: Map[String, String] = Map(
    "0010" -> "central_govt_central_bank", "0020" -> "rgla", "0030" -> "pse",
    "0040" -> "institution", "0050" -> "corporate",
    "0070" -> "specialised_lending", "0080" -> "corporate_sme",
    "0110" -> "retail_mortgage", "0120" -> "retail_qrre", "0140" -> "retail_other",
    "0150" -> "equity", "0160" -> "other")
  private val crrRetailClasses = Set("retail_mortgage", "retail_qrre", "retail_other")
  private val b31C0807Rows: Map[String, String] = Map(
    "0180" -> "institution", "0190" -> "specialised_lending",
    "0220" -> "retail_qrre", "0230" -> "retail_mortgage", "0250" -> "retail_other")
  private val b31CorporateClasses = Set("corporate", "corporate_sme")
  private val b31RolloutClasses =
    Set("institution", "specialised_lending") ++ b31CorporateClasses ++ crrRetailClasses

  /** Generate C 08.07 / OF 08.07 over the FULL population: the raw
    * `exposure_class` axis, `reporting_approach_origin` IRB membership,
    * coverage fractions as intra-row formulas, fixed structural-null rows. */
  def c0807(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "c08_07")
    val isB31 = cfg.isB31
    val singles = if (isB31) b31C0807Rows else crrC0807Rows
    val unions: Map[String, Set[String]] =
      if (isB31) Map("0210" -> b31CorporateClasses, "0260" -> b31RolloutClasses)
      else Map("0090" -> crrRetailClasses)
    def irb(r: CRow): Boolean =
      r.s("reporting_approach_origin").exists(c0807IrbApproaches)
    def rollout(r: CRow): Boolean = !irb(r) && r.is("is_under_irb_rollout")

    val cells = scala.collection.mutable.Map[(String, String), Cell]()
    val nullRows = scala.collection.mutable.Set[String]()
    for ((ref, name) <- grid.rows) {
      val member: Option[CRow => Boolean] =
        singles.get(ref).map(ec => (r: CRow) => r.s("exposure_class").contains(ec))
          .orElse(unions.get(ref).map(cs => (r: CRow) => r.s("exposure_class").exists(cs)))
          .orElse(if (name == "Total") Some((_: CRow) => true) else None)
      member match {
        case None => nullRows += ref
        case Some(m) =>
          cells((ref, "0010")) = Cell(MSum(_.m("ead_final")), r => m(r) && irb(r))
          cells((ref, "0020")) = Cell(MSum(_.m("ead_final")), m)
          cells((ref, "0040")) = Cell(MSum(_.m("ead_final")), r => m(r) && rollout(r))
          cells((ref, "0030")) = Cell(FFormula(Seq("0010", "0020", "0040"), c => {
            val total = c("0020").getOrElse(0.0)
            if (total <= 0) Some(0.0)
            else Some((total - c("0010").getOrElse(0.0) - c("0040").getOrElse(0.0)) / total)
          }))
          cells((ref, "0050")) = Cell(FFormula(Seq("0010", "0020"), c => {
            val total = c("0020").getOrElse(0.0)
            if (total <= 0) Some(0.0) else Some(c("0010").getOrElse(0.0) / total)
          }))
          if (isB31) {
            cells((ref, "0060")) = Cell(MSum(_.m("rwa_final")), m)
            cells((ref, "0150")) = Cell(MSum(_.m("rwa_final")), r => m(r) && irb(r))
            cells((ref, "0140")) = Cell(FFormula(Seq("0060", "0150"), c =>
              Some(c("0060").getOrElse(0.0) - c("0150").getOrElse(0.0))))
            for (x <- Seq("0160", "0170", "0180") if grid.cols.contains(x))
              cells((ref, x)) = Cell(FConst(None))
          }
      }
    }
    // col 0040 rescale: roll-out EAD → its fraction of the row total.
    val computed0 = execute(grid, cube, cells.toMap)
    val computed = computed0.map {
      case ((ref, "0040"), v) if !nullRows(ref) =>
        val total = computed0.getOrElse((ref, "0020"), None).getOrElse(0.0)
        ((ref, "0040"), Some(if (total > 0) v.getOrElse(0.0) / total else 0.0))
      case other => other
    }
    frameOf(grid, computed).nullRows(nullRows.toSet)
  }

  // =========================================================================
  // C 09.01 / OF 09.01 — geographical breakdown, SA (reference `c09.py`)
  // =========================================================================

  private val c09SaClassMap: Map[String, String] = Map(
    "central_govt_central_bank" -> "central_govt_central_bank",
    "rgla" -> "rgla", "pse" -> "pse", "mdb" -> "mdb",
    "international_organisation" -> "international_organisation",
    "institution" -> "institution",
    "corporate" -> "corporate", "corporate_sme" -> "corporate",
    "retail_other" -> "retail", "retail_qrre" -> "retail",
    "retail_mortgage" -> "retail_mortgage",
    "residential_mortgage" -> "retail_mortgage",
    "commercial_mortgage" -> "retail_mortgage",
    "defaulted" -> "defaulted", "high_risk" -> "high_risk",
    "covered_bond" -> "covered_bond", "equity" -> "equity", "other" -> "other",
    "specialised_lending" -> "corporate")
  private val c09SmeParents: Map[String, String] = Map(
    "corporate_sme" -> "corporate", "retail_sme" -> "retail",
    "mortgage_sme" -> "retail_mortgage")
  private val c09SlTypeMap: Map[String, String] = Map(
    "sl_object_finance" -> "object_finance",
    "sl_commodities_finance" -> "commodities_finance",
    "sl_project_finance" -> "project_finance")
  private val c09ReClasses =
    Set("retail_mortgage", "residential_mortgage", "commercial_mortgage")
  /** Row ref → row key (`COREPRow.exposure_class_value`), per framework. */
  private def c09RowKeys(isB31: Boolean): Map[String, String] = {
    val shared = Map("0010" -> "central_govt_central_bank", "0020" -> "rgla",
      "0030" -> "pse", "0040" -> "mdb", "0050" -> "international_organisation",
      "0060" -> "institution", "0070" -> "corporate", "0075" -> "corporate_sme",
      "0080" -> "retail", "0085" -> "retail_sme", "0100" -> "defaulted",
      "0110" -> "high_risk", "0120" -> "covered_bond", "0140" -> "ciu",
      "0141" -> "ciu_look_through", "0142" -> "ciu_mandate",
      "0143" -> "ciu_fallback", "0150" -> "equity", "0160" -> "other")
    if (isB31) shared ++ Map(
      "0071" -> "sl_object_finance", "0072" -> "sl_commodities_finance",
      "0073" -> "sl_project_finance", "0090" -> "real_estate",
      "0095" -> "re_sme", "0091" -> "re_residential", "0092" -> "re_commercial",
      "0093" -> "re_other", "0094" -> "re_adc")
    else shared ++ Map("0090" -> "retail_mortgage", "0095" -> "mortgage_sme",
      "0130" -> "short_term")
  }

  /** The reverse-map row predicate over one class basis column
    * (`_c09_01_row_pred`): None = permanently-null row. */
  private def c09RowPred(k: String,
      classOf: CRow => Option[String]): Option[CRow => Boolean] = k match {
    case _ if c09SlTypeMap.contains(k) =>
      Some(r => r.s("sl_type").contains(c09SlTypeMap(k)))
    case "real_estate" =>
      Some(r => classOf(r).exists(c09ReClasses))
    case "re_residential" => Some(r => classOf(r).exists(c09ReClasses) &&
      r.s("property_type").contains("residential") &&
      r.b("is_qualifying_re").getOrElse(true))
    case "re_commercial" => Some(r => classOf(r).exists(c09ReClasses) &&
      r.s("property_type").contains("commercial") &&
      r.b("is_qualifying_re").getOrElse(true))
    case "re_other" => Some(r => classOf(r).exists(c09ReClasses) &&
      !r.b("is_qualifying_re").getOrElse(true))
    case "re_adc" =>
      Some(r => classOf(r).exists(c09ReClasses) && r.is("is_adc"))
    case "re_sme" =>
      Some(r => classOf(r).exists(c09ReClasses) && r.is("is_sme"))
    case _ =>
      val parent = c09SmeParents.get(k)
      val rowKey = parent.getOrElse(k)
      val classes = c09SaClassMap.collect { case (ec, m) if m == rowKey => ec }.toSet
      if (classes.isEmpty) None
      else if (parent.isDefined)
        Some(r => classOf(r).exists(classes) && smeClass(r))
      else Some(r => classOf(r).exists(classes))
  }

  /** Generate C 09.01 / OF 09.01: TOTAL first, then one frame per country
    * contributed by either basis. The row keying is documented in the
    * reference's `_c09_01_spec`: origin-basis columns key the APPLIED
    * class on the obligor's country, the 0020 memo keys the raw ORIGINAL
    * class + defaulted, and the ¶87 ultimate-obligor columns (0075/0080/
    * 0081/0082/0090) key the post class on the guarantor's country. */
  def c0901(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "c09_01")
    val isB31 = cfg.isB31
    val keys = c09RowKeys(isB31)
    val pop = cube.filter(r => popOrigin(r) || popPost(r))
    if (pop.isEmpty) return Map.empty
    def geoOrigin(r: CRow): Option[String] = r.s("reporting_country_origin")
      .orElse(r.s("cp_country_code"))
    def geoPost(r: CRow): Option[String] = r.s("reporting_country")
      .orElse(geoOrigin(r))
    val axis = pop.flatMap(r =>
      (if (popOrigin(r)) geoOrigin(r) else None) ++
        (if (popPost(r)) geoPost(r) else None)).toSet.toSeq.sorted
    val negCols = Set("0081", "0082", "0121", "0122")

    val sheets = Seq(("TOTAL", (_: CRow) => true, (_: CRow) => true)) ++
      axis.map(c => (c,
        (r: CRow) => geoOrigin(r).contains(c),
        (r: CRow) => geoPost(r).contains(c)))
    sheets.map { case (name, geoO, geoP) =>
      val frameRows = pop.filter(r =>
        (popOrigin(r) && geoO(r)) || (popPost(r) && geoP(r)))
      val cells = scala.collection.mutable.Map[(String, String), Cell]()
      val rowPreds = scala.collection.mutable.Map[String, Option[CRow => Boolean]]()
      for ((ref, _) <- grid.rows) {
        val key = keys.get(ref)
        val isTotal = ref == "0170"
        val predO = if (isTotal) Some((_: CRow) => true)
          else key.flatMap(k => c09RowPred(k, r => r.s("reporting_class_origin")))
        val predMemo = if (isTotal) Some((_: CRow) => true)
          else key.flatMap(k => c09RowPred(k, r => r.s("exposure_class")))
        val predP = if (isTotal) Some((_: CRow) => true)
          else key.flatMap { k =>
            c09RowPred(k, r => r.s("reporting_class")).map { p =>
              if (c09SlTypeMap.contains(k))
                (r: CRow) => p(r) && !r.is("is_guarantee_beneficial")
              else p
            }
          }
        val o = predO.map(p => (r: CRow) => popOrigin(r) && geoO(r) && p(r))
        val memo = predMemo.map(p =>
          (r: CRow) => popOrigin(r) && geoO(r) && p(r) && r.is("is_defaulted"))
        val post = predP.map(p => (r: CRow) => popPost(r) && geoP(r) && p(r))
        rowPreds(ref) = (o, memo, post) match {
          case (None, None, None) => None
          case _ => Some((r: CRow) => o.exists(_(r)) || memo.exists(_(r)) ||
            post.exists(_(r)))
        }
        (o, post) match {
          case (Some(po), Some(pp)) =>
            cells((ref, "0010")) = Cell(MSum(grossAll), po)
            memo.foreach(pm => cells((ref, "0020")) = Cell(MSum(grossAll), pm))
            cells((ref, "0050")) = Cell(FConst(None)) // gcra: never sealed
            cells((ref, "0055")) = Cell(FConst(None)) // scra: never sealed
            for (nullRef <- Seq("0040", "0060", "0061", "0070"))
              cells((ref, nullRef)) = Cell(FConst(None))
            cells((ref, "0075")) = Cell(MSum(_.m("ead_final")), pp)
            if (grid.cols.contains("0080")) {
              cells((ref, "0080")) = Cell(MSum(_.m("rwa_pre_factor")), pp)
              cells((ref, "0081")) = Cell(MSum(sfDelta),
                r => pp(r) && r.is("sme_supporting_factor_applied"))
              cells((ref, "0082")) = Cell(MSum(sfDelta),
                r => pp(r) && r.is("infrastructure_factor_applied"))
            }
            cells((ref, "0090")) = Cell(MSum(_.m("rwa_final")), pp)
          case _ => () // no cells — the all-null pass owns the row
        }
      }
      val computed = execute(grid, frameRows, cells.toMap)
      // Every row here is constrained except the Total (ref 0170).
      val constrainedRefs = grid.rows.map(_._1).filterNot(_ == "0170").toSet
      val frame = nullEmptyRows(frameOf(grid, computed), frameRows,
        rowPreds.toMap, constrainedRefs, Set.empty)
      name -> frame.negate(negCols)
    }.toMap
  }

  // =========================================================================
  // C 02.00 / OF 02.00 — own funds requirements (reference `c02.py`)
  // =========================================================================

  private val c02SaClassMap: Map[String, String] = Map(
    "central_govt_central_bank" -> "0070", "rgla" -> "0080", "pse" -> "0090",
    "mdb" -> "0100", "international_organisation" -> "0110",
    "institution" -> "0120", "corporate" -> "0130", "corporate_sme" -> "0130",
    "specialised_lending" -> "0130", "retail_other" -> "0140",
    "retail_qrre" -> "0140", "retail_mortgage" -> "0150",
    "residential_mortgage" -> "0150", "commercial_mortgage" -> "0150",
    "defaulted" -> "0160", "high_risk" -> "0170", "covered_bond" -> "0180",
    "equity" -> "0210", "other" -> "0211")
  private val c02CreditRiskRows: Set[String] = Set(
    "0010", "0040", "0050", "0060", "0070", "0080", "0090", "0100", "0110",
    "0120", "0130", "0131", "0140", "0150", "0160", "0170", "0180", "0190",
    "0200", "0210", "0211", "0220", "0240", "0250", "0260", "0271", "0290",
    "0295", "0296", "0297", "0300", "0310", "0330", "0340", "0350", "0355",
    "0356", "0370", "0380", "0382", "0383", "0384", "0385", "0390", "0400",
    "0410", "0411", "0412", "0413", "0414", "0415", "0416", "0420",
    "0034", "0035", "0036", "0500")
  private val c02SaApproaches = Set("standardised", "standardised_ccr")

  /** Generate C 02.00 (CRR) / OF 02.00 (Basel 3.1). */
  def c0200(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "c_02_00")
    val isB31 = cfg.isB31
    def approach(r: CRow): Option[String] = r.s("reporting_approach")
    def postClass(r: CRow): Option[String] = r.s("reporting_class")
    val totalRwa = cube.map(_.m("rwa_final")).sum
    val approachRwa = cube.groupBy(approach).collect {
      case (Some(a), rs) => a -> rs.map(_.m("rwa_final")).sum
    }
    // Equity method partition (Art. 155 / PS1/26 Art. 147A): the sealed
    // equity_method splits the equity approach into the SA breakdown
    // (rows 0060/0210) vs "Equity IRB" (rows 0220/0420).
    val equityIrbMethods = Set("irb_simple", "pd_lgd")
    def equityIrb(r: CRow) = approach(r).contains("equity") &&
      r.s("equity_method").exists(equityIrbMethods)
    val equityIrbRwa = cube.filter(equityIrb).map(_.m("rwa_final")).sum
    val equitySaRwa = approachRwa.getOrElse("equity", 0.0) - equityIrbRwa
    val saMask = (r: CRow) => approach(r).exists(c02SaApproaches) ||
      (approach(r).contains("equity") && !equityIrb(r))
    val saClassRwa = cube.filter(saMask).groupBy(postClass).collect {
      case (Some(ec), rs) => ec -> rs.map(_.m("rwa_final")).sum
    }
    val irbRows = cube.filterNot(r => approach(r).exists(c02SaApproaches) ||
      approach(r).contains("equity"))
    val irbClassRwa = irbRows.groupBy(r => (approach(r), postClass(r))).collect {
      case ((Some(a), Some(ec)), rs) => (a, ec) -> rs.map(_.m("rwa_final")).sum
    }
    val slottingTypeRwa = cube.filter(r => approach(r).contains("slotting"))
      .groupBy(_.s("sl_type")).collect {
        case (Some(t), rs) => t -> rs.map(_.m("rwa_final")).sum
      }
    // B31 corporate/retail sub splits (`_irb_sub_agg`): keyed on the cube's
    // is_sme / property_type keys (no exposure_subclass or FSE carrier is
    // sealed, so the is_sme heuristic arm applies and FSE is empty).
    def subSplit(a: String, ec: String, total: Double): (Double, Double, Double) = {
      val subset = irbRows.filter(r => approach(r).contains(a) && postClass(r).contains(ec))
      if (subset.isEmpty) (0.0, 0.0, total)
      else {
        val sme = subset.filter(_.is("is_sme")).map(_.m("rwa_final")).sum
        val nonsme = subset.filterNot(_.is("is_sme")).map(_.m("rwa_final")).sum
        (0.0, sme, nonsme)
      }
    }
    def reSplit(a: String, ec: String): (Double, Double, Double, Double) = {
      val subset = irbRows.filter(r => approach(r).contains(a) && postClass(r).contains(ec))
      def s(pt: String, sme: Boolean) = subset.filter(r =>
        r.s("property_type").contains(pt) && r.is("is_sme") == sme)
        .map(_.m("rwa_final")).sum
      (s("residential", sme = true), s("residential", sme = false),
        s("commercial", sme = true), s("commercial", sme = false))
    }

    val saRwaTotal = c02SaApproaches.toSeq.map(approachRwa.getOrElse(_, 0.0)).sum
    val firbRwa = approachRwa.getOrElse("foundation_irb", 0.0)
    val airbRwa = approachRwa.getOrElse("advanced_irb", 0.0)
    val slottingRwa = approachRwa.getOrElse("slotting", 0.0)
    val irbTotalRwa = firbRwa + airbRwa + slottingRwa + equityIrbRwa
    val preFloorTotal = cube.map(_.m("rwa_pre_floor")).sum
    val saEquivRwa = cube.map(_.m("sa_rwa")).sum
    val floorActivated = isB31 && totalRwa > preFloorTotal + 0.01

    val v = scala.collection.mutable.Map[String, Double]()
    v("0010") = totalRwa
    v("0040") = totalRwa * 0.08
    v("0050") = totalRwa
    v("0060") = saRwaTotal + equitySaRwa
    for ((ec, ref) <- c02SaClassMap; rwa <- saClassRwa.get(ec))
      v(ref) = v.getOrElse(ref, 0.0) + rwa
    if (isB31) saClassRwa.get("specialised_lending").foreach(v("0131") = _)
    v("0220") = irbTotalRwa
    v("0240") = firbRwa
    val firbInst = irbClassRwa.getOrElse(("foundation_irb", "institution"), 0.0)
    v("0250") = firbInst
    val firbCorp = irbClassRwa.getOrElse(("foundation_irb", "corporate"), 0.0)
    val firbSl = irbClassRwa.getOrElse(("foundation_irb", "specialised_lending"), 0.0)
    v("0260") = firbCorp + firbSl
    if (isB31) {
      v("0271") = firbInst
      v("0290") = firbSl
      val (fFse, fSme, fNon) = subSplit("foundation_irb", "corporate", firbCorp)
      v("0295") = fFse; v("0296") = fSme; v("0297") = fNon
    }
    v("0300") = airbRwa
    v("0310") = irbClassRwa.getOrElse(("advanced_irb", "central_government"), 0.0)
    v("0330") = irbClassRwa.getOrElse(("advanced_irb", "institution"), 0.0)
    val airbCorp = irbClassRwa.getOrElse(("advanced_irb", "corporate"), 0.0)
    val airbSl = irbClassRwa.getOrElse(("advanced_irb", "specialised_lending"), 0.0)
    v("0340") = airbCorp + airbSl
    if (isB31) {
      v("0350") = airbSl
      val (aFse, aSme, aNon) = subSplit("advanced_irb", "corporate", airbCorp)
      v("0355") = aSme; v("0356") = aNon + aFse
    }
    val airbMort = irbClassRwa.getOrElse(("advanced_irb", "retail_mortgage"), 0.0)
    val airbQrre = irbClassRwa.getOrElse(("advanced_irb", "retail_qrre"), 0.0)
    val airbROther = irbClassRwa.getOrElse(("advanced_irb", "retail_other"), 0.0)
    v("0370") = airbMort + airbQrre + airbROther
    v("0380") = airbMort
    if (isB31) {
      val (rs, rn, cs, cn) = reSplit("advanced_irb", "retail_mortgage")
      v("0382") = rs; v("0383") = rn; v("0384") = cs; v("0385") = cn
    }
    v("0390") = airbQrre
    if (isB31) {
      val (_, oSme, oNon) = subSplit("advanced_irb", "retail_other", airbROther)
      v("0400") = oSme; v("0410") = oNon
    } else v("0400") = airbROther
    if (isB31) {
      v("0411") = slottingRwa
      v("0412") = slottingTypeRwa.getOrElse("project_finance", 0.0)
      v("0413") = slottingTypeRwa.getOrElse("object_finance", 0.0)
      v("0414") = slottingTypeRwa.getOrElse("commodities_finance", 0.0)
      v("0415") = slottingTypeRwa.getOrElse("ipre", 0.0)
      v("0416") = slottingTypeRwa.getOrElse("hvcre", 0.0)
    } else v("0410") = slottingRwa
    v("0420") = equityIrbRwa
    if (isB31) {
      // Output-floor indicator rows (no OutputFloorSummary on this path —
      // the reference generator call the goldens froze passes none).
      v("0034") = if (floorActivated) 1.0 else 0.0
      v("0035") = 0.0
      v("0036") = 0.0
      v("0500") = cube.filter(_.is("currency_mismatch_multiplier_applied"))
        .map(_.m("rwa_final")).sum
    }

    val cells = grid.rows.flatMap { case (ref, _) =>
      val base: Option[Map[String, Option[Double]]] =
        if (v.contains(ref)) {
          val c10 = v(ref)
          // Row 0500 (currency-mismatch memo) is populated AFTER the B31
          // column fill in the reference, so only col 0010 carries a value.
          if (isB31 && ref == "0500") Some(Map("0010" -> Some(c10)))
          else {
            val (c20, c30): (Double, Double) =
              if (!isB31) (0.0, 0.0)
              else ref match {
                case "0010" | "0050" => (saEquivRwa, totalRwa)
                case "0040" => (saEquivRwa * 0.08, totalRwa * 0.08)
                case "0034" | "0035" | "0036" | "0060" => (c10, c10)
                case "0220" | "0240" | "0300" => (0.0, 0.0)
                case _ => (c10, c10)
              }
            Some(if (isB31) Map("0010" -> Some(c10), "0020" -> Some(c20), "0030" -> Some(c30))
            else Map("0010" -> Some(c10)))
          }
        } else if (c02CreditRiskRows(ref))
          Some(grid.cols.map(_ -> Some(0.0)).toMap)
        else None
      // a populated row's missing columns render NULL (`_row_dict`'s
      // `vals.get(ref)`), never 0.0 — the 0500 memo relies on this.
      base.map(m => grid.cols.map(c => ((ref, c), m.getOrElse(c, None))))
        .getOrElse(grid.cols.map(c => ((ref, c), Option.empty[Double])))
    }.toMap
    frameOf(grid, cells)
  }

  // =========================================================================
  // OF 02.01 — U-TREA / S-TREA split (Basel 3.1 only; reference `of02.py`)
  // =========================================================================

  private val of02Modelled = Set("foundation_irb", "advanced_irb", "slotting")

  def of0201(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "of_02_01")
    def modelled(r: CRow): Boolean =
      r.s("reporting_approach_origin").exists(of02Modelled)
    val rowCcr: Map[String, Option[Boolean]] =
      Map("0010" -> Some(false), "0020" -> Some(true), "0080" -> None)
    val nullRows = Set("0030", "0040", "0050", "0060", "0070")
    val cells = rowCcr.flatMap { case (ref, ccrFlag) =>
      def side(r: CRow) = ccrFlag.forall(_ == isCcr(r))
      Seq(
        ((ref, "0010"), Cell(MSum(_.m("rwa_pre_floor")), r => side(r) && modelled(r))),
        ((ref, "0020"), Cell(MSum(_.m("rwa_pre_floor")), r => side(r) && !modelled(r))),
        ((ref, "0030"), Cell(FFormula(Seq("0010", "0020"), c =>
          Some(c("0010").getOrElse(0.0) + c("0020").getOrElse(0.0))))),
        ((ref, "0040"), Cell(MSum(_.m("sa_rwa")), side)))
    }
    frameOf(grid, execute(grid, cube, cells)).nullRows(nullRows)
  }

  // =========================================================================
  // C 08.01 / C 08.02 — IRB by exposure class (reference `c08.py`)
  // =========================================================================

  private val irbApproaches = Set("foundation_irb", "advanced_irb", "slotting")
  private val irbNonSlotting = Set("foundation_irb", "advanced_irb")
  private def popIrbOrigin(r: CRow): Boolean =
    r.s("reporting_approach_origin").exists(irbApproaches)
  private def popIrbPost(r: CRow): Boolean =
    r.s("reporting_approach").exists(irbApproaches)
  private def gradesRow(r: CRow): Boolean =
    r.s("reporting_approach_origin").exists(irbNonSlotting)

  private def distinctObligors(rows: Vector[CRow], pred: CRow => Boolean): Double =
    RefCube.distinctObligors(rows, pred)

  private def wavg(rows: Vector[CRow], pred: CRow => Boolean,
      num: String, den: String, scale: Double = 1.0,
      emptyNull: Boolean = true): Option[Double] = {
    val subset = rows.filter(pred)
    val w = subset.iterator.map(_.m(den)).sum
    if (subset.isEmpty || w == 0.0) { if (emptyNull) None else Some(0.0) }
    else Some(subset.iterator.map(_.m(num)).sum / w * scale)
  }

  /** The shared C 08.01/02 value surface for one row of one sheet
    * (reference `c08.py::_value_cells`, specialised to the sealed
    * vocabulary: the OFCP-LGD / CRM-LGD / post-model-adjustment carriers
    * are sealed zeros; `double_default_unfunded_protection` and the B31
    * FCCM block (0101-0103) are never sealed → structural nulls;
    * `rwa_pre_adjustments` coalesces to the leg's own RWA). Evaluated
    * directly (not via `Cell`) because half the surface is weighted
    * averages and distinct counts the `MSum` verb cannot express. */
  private def c08ValueCells(grid: RefLayouts.Grid, rows: Vector[CRow],
      o: CRow => Boolean, p: CRow => Boolean,
      inflow: Option[Double] = None): Map[String, Option[Double]] = {
    def sum(m: String, pred: CRow => Boolean): Double =
      rows.iterator.filter(pred).map(_.m(m)).sum
    val grossO = sum("reporting_gross_on_bs", o) + sum("reporting_gross_off_bs", o)
    // the substitution block on the IRB cap (`irb_protection_exprs` — no
    // provision netting off the basis, unlike C 07.00's); cols 0040/0050
    // split the ONE capped carrier by protection type, col 0070 is its
    // subtotal, so {c0070} = {c0040}+{c0050}+{c0060} holds by construction
    // (v1663_m / v1665_m)
    def block(pred: CRow => Boolean): Double = sum("prot_unfunded_irb", pred)
    val inflowV = inflow.getOrElse(0.0)
    // 0090 = 0020 − 0035 − 0070 + 0080 (`crm_waterfall`; 0035 sealed zero)
    val w0090 = grossO - 0.0 - block(o) + inflowV
    // off-BS slice of the 0090 waterfall (`postpass.c08_off_bs_pre_ccf`):
    // off gross − off-side outflow; the 0080 inflow is EXCLUDED (a
    // total-row cross-sheet scalar with no leg-level BS attribution) and
    // so is the B31 0035 netting term (on-balance-sheet by nature)
    val offO = (r: CRow) => o(r) && bsSide(r).contains("off")
    val offSlice = sum("reporting_gross_off_bs", offO) - block(offO)
    val all: Map[String, Option[Double]] = Map(
      "0010" -> wavg(rows, o, "pd_w", "ead_final"),
      "0020" -> Some(grossO),
      "0030" -> Some(0.0), // LFSE: cp_apply_fi_scalar sealed false → empty → 0.0
      "0035" -> Some(0.0), // on_bs_netting_amount sealed zero
      "0040" -> Some(block(r => o(r) && r.s("protection_type").contains("guarantee"))),
      "0050" -> Some(block(r => o(r) &&
        r.s("protection_type").contains("credit_derivative"))),
      "0060" -> Some(0.0), // reporting_ofcp_substitution: SafeSum none present
      "0070" -> Some(block(o)), // the c08_prot_block subtotal
      "0080" -> Some(inflowV), // substitution inflow (SideContext; 0.0 off-axis)
      "0090" -> Some(w0090),
      "0100" -> Some(offSlice), // post-pass: off-BS slice of the 0090 waterfall
      "0101" -> None, "0102" -> None, "0103" -> None, // slotting FCCM: unsealed
      "0104" -> Some(w0090), // 0090 + 0101 − 0102 on the sealed zeros
      "0110" -> Some(sum("ead_final", p)),
      "0120" -> Some(sum("ead_final", r => p(r) && bsSide(r).contains("off"))),
      "0125" -> Some(sum("ead_final", r => p(r) && r.is("is_defaulted"))),
      "0130" -> None,
      "0140" -> Some(0.0), // LFSE
      "0150" -> Some(0.0), "0160" -> Some(0.0), // CRM-in-LGD twins
      "0170" -> Some(0.0), "0171" -> Some(0.0), "0172" -> Some(0.0),
      "0173" -> Some(0.0), // OFCP-LGD carriers: sealed zeros
      "0180" -> Some(0.0), // financial CRM-in-LGD: sealed zero
      "0190" -> Some(sum("crm_lgd_re", o)), // Art. 199 RE carrier, UNCAPPED
      "0200" -> Some(0.0), "0210" -> Some(0.0), // other carriers: sealed zeros
      "0220" -> None, // double_default_unfunded_protection: never sealed
      "0230" -> wavg(rows, o, "lgd_w", "ead_final"),
      "0240" -> Some(0.0), // LFSE wavg
      "0250" -> wavg(rows, o, "m_w", "ead_final", scale = 365.0),
      "0251" -> Some(sum("rwa_final", p)), // rwa_pre_adjustments → own RWA
      "0252" -> Some(0.0), "0253" -> Some(0.0), "0254" -> Some(0.0),
      "0255" -> Some(sum("rwa_pre_factor", p)),
      "0256" -> Some(sum("rwa_pre_factor", r =>
        p(r) && r.is("sme_supporting_factor_applied")) -
        sum("rwa_final", r => p(r) && r.is("sme_supporting_factor_applied"))),
      "0257" -> Some(sum("rwa_pre_factor", r =>
        p(r) && r.is("infrastructure_factor_applied")) -
        sum("rwa_final", r => p(r) && r.is("infrastructure_factor_applied"))),
      "0260" -> Some(sum("rwa_final", p)),
      "0265" -> Some(sum("rwa_final", r => p(r) && r.is("is_defaulted"))),
      "0270" -> Some(0.0), // LFSE
      "0275" -> Some(sum("ead_final", p)),
      "0276" -> Some(sum("sa_rwa", p)),
      "0280" -> Some(sum("expected_loss", o)),
      "0281" -> Some(0.0), // post_model_adjustment_el: sealed zero
      "0282" -> Some(sum("expected_loss", o)), // el_after_adjustment seal
      "0290" -> Some(0.0), // scra/gcra 0.0; provisions ladder swaps to
                           // provision_allocated (sealed zero) — same cell
      "0300" -> Some(distinctObligors(rows, o)),
      "0310" -> Some(sum("rwa_final", o)))
    all.filter { case (ref, _) => grid.cols.contains(ref) }
  }

  /** C 08.01 row membership (reference `_c08_01_row_terms` +
    * `_c08_01_grades_pred`): Total (0010), on/off-BS (0020/0030), grades
    * union (0070), slotting (0080), the B31 unrated-corporate memos
    * (0190/0200); every other row is inert (all-null). */
  private def c0801RowPred(ref: String): Option[CRow => Boolean] = ref match {
    case "0010" => Some(_ => true)
    case "0020" => Some(r => bsSide(r).contains("on"))
    case "0030" => Some(r => bsSide(r).contains("off"))
    case "0070" => Some(gradesRow)
    case "0080" => Some(r => r.s("reporting_approach_origin").contains("slotting"))
    // 0190/0200 (the B31 unrated-corporate memos) are bound at the call
    // site — their predicates need the sheet context.
    case _ => None
  }

  /** Generate C 08.01 / OF 08.01: one frame per IRB obligor-class sheet
    * (the two-basis Art. 147 sheet axis over the IRB book). */
  def c0801(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "c08_01")
    val inf = inflows(cube, destinationIrb = true)
    val pop = cube.filter(r => popIrbOrigin(r) || popIrbPost(r))
    if (pop.isEmpty && inf.isEmpty) return Map.empty
    val axis = (pop.flatMap(r =>
      (if (popIrbOrigin(r)) r.s("reporting_class_origin") else None) ++
        (if (popIrbPost(r)) r.s("reporting_class") else None)).toSet ++
      inf.keySet).toSeq.sorted
    val negCols = Set("0035", "0040", "0050", "0060", "0070", "0102",
      "0103", "0256", "0257", "0290") // c08.py::_NEGATIVE_COLS
    axis.map { ec =>
      val origin = (r: CRow) => popIrbOrigin(r) &&
        r.s("reporting_class_origin").contains(ec)
      val post = (r: CRow) => popIrbPost(r) && r.s("reporting_class").contains(ec)
      val sheet = pop.filter(r => origin(r) || post(r))
      // B31 memo rows 0190/0200 (unrated-corporate): sa_cqs is never
      // sealed, so every corporate is "unrated"; the IG proxy is
      // pd_floored <= 0.5% (`c08.py::_prepare` fallback) — evaluated per
      // cube row via the leaf band (pd bands at or below 0.50).
      def unratedCorp(r: CRow) = r.s("exposure_class").exists(_.startsWith("corporate"))
      // cp_is_investment_grade is SEALED (null), so the derived flag is
      // fill_null(False) == True → match-nothing; the pd_floored proxy is
      // the absent-column fallback only (`c08.py::_prepare`).
      def unratedIgRow(r: CRow) = false
      def rowPred(ref: String): Option[CRow => Boolean] = ref match {
        case "0190" => Some(unratedCorp _)
        case "0200" => Some(unratedIgRow _)
        case other => c0801RowPred(other)
      }
      // per-row inflow component (`_C08_01_INFLOW_KEYS`): the Total row
      // takes the whole inflow; 0020/0030 its balance-sheet split
      // (boe_b0744); 0070/0080 its IRB-treatment split (boe_b0745 /
      // v0338_m) — a Total-row-only inflow breaches each by exactly the
      // inflow
      val sheetInf = inf.getOrElse(ec, Inflow())
      def inflowFor(ref: String): Option[Double] = ref match {
        case "0010" => Some(sheetInf.total)
        case "0020" => Some(sheetInf.onBs)
        case "0030" => Some(sheetInf.offBs)
        case "0070" => Some(sheetInf.graded)
        case "0080" => Some(sheetInf.slotting)
        case _ => None
      }
      val computed = grid.rows.flatMap { case (ref, _) =>
        rowPred(ref) match {
          case None => grid.cols.map(c => ((ref, c), Option.empty[Double]))
          case Some(t) =>
            val oP = (r: CRow) => origin(r) && t(r)
            val pP = (r: CRow) => post(r) && t(r)
            // empty membership (union of both bases) → all-null row,
            // except the constraint-free Total and a row carrying a
            // non-zero inflow component (the C 07.00 `_inflow_rows` rule)
            if (ref != "0010" && !sheet.exists(t) &&
                !inflowFor(ref).exists(_ != 0.0))
              grid.cols.map(c => ((ref, c), Option.empty[Double]))
            else c08ValueCells(grid, sheet, oP, pP, inflowFor(ref)).toSeq
              .map { case (c, v) => ((ref, c), v) }
        }
      }.toMap
      ec -> frameOf(grid, computed).negate(negCols)
    }.toMap
  }

  /** The B31 investment-grade proxy: post-floor PD ≤ 0.5% — decided per
    * cube row from the coarse/leaf PD bands (every band at or below the
    * 0.50% boundary qualifies; the 0.25-0.50 leaf is inside it). */
  private def igByBand(r: CRow): Boolean =
    r.s("pd_band_leaf").exists(Set("0015", "0020", "0025", "0030", "0040", "0050"))

  /** Generate C 08.02 / OF 08.02: data-driven PD-band rows per class sheet
    * (the firm-grade ladder is never sealed, so the fixed coarse bands
    * key the rows; `row_name` doubles as the String col 0005). */
  def c0802(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "c08_02")
    val coarseOrder = Seq("0.00% - 0.15%", "0.15% - 0.25%", "0.25% - 0.50%",
      "0.50% - 0.75%", "0.75% - 2.50%", "2.50% - 10.00%", "10.00% - 99.99%",
      "Default (100%)")
    // the GRADED inflow component only: the tie-out this template must
    // satisfy is against C 08.01 row 0070 (boe_b0752_8/boe_b0814_07), the
    // F-IRB/A-IRB union; it lands on the "Unassigned" residual row — the
    // ledger carries the OBLIGOR's grade, never the guarantor's, so a
    // grade row would misattribute it (`_C08_02_INFLOW_ROW`, R12)
    val gradedInf = inflows(cube, destinationIrb = true)
      .map { case (k, v) => k -> v.graded }.filter(_._2 != 0.0)
    val pop = cube.filter(r => r.s("reporting_approach_origin").exists(irbNonSlotting) ||
      (popIrbPost(r) && !r.s("reporting_approach_origin").contains("slotting")))
    if (pop.isEmpty && gradedInf.isEmpty) return Map.empty
    val negCols = Set("0035", "0040", "0050", "0060", "0070", "0102",
      "0103", "0256", "0257", "0290") // c08.py::_NEGATIVE_COLS
    val axis = (pop.flatMap(_.s("reporting_class_origin")).toSet ++
      gradedInf.keySet).toSeq.sorted
    axis.map { ec =>
      def originM(r: CRow) = r.s("reporting_class_origin").contains(ec) &&
        r.s("reporting_approach_origin").exists(irbNonSlotting)
      def postM(r: CRow) = r.s("reporting_class").contains(ec) && popIrbPost(r) &&
        !r.s("reporting_approach_origin").contains("slotting")
      // a leg that ARRIVED on this sheet by substitution (post-basis here,
      // origin-basis elsewhere) keys the Unassigned residual row — its
      // grade is a label in a FOREIGN class's scale (`_c08_02_keyed`)
      def arrived(r: CRow) = postM(r) && !originM(r)
      val sheet = pop.filter(r => originM(r) || postM(r))
      val present = sheet.filter(originM).flatMap(_.s("pd_band_coarse")).toSet
      val labels = coarseOrder.filter(present) ++
        (if (present("Unassigned") || gradedInf.contains(ec) ||
          sheet.exists(arrived)) Seq("Unassigned")
         else Nil)
      val rows = labels.toVector.map(l => (l, l))
      val sheetGrid = RefLayouts.Grid(rows, grid.cols)
      val computed = rows.flatMap { case (label, _) =>
        val t = (r: CRow) => r.s("pd_band_coarse").contains(label)
        val postT = (r: CRow) =>
          if (label == "Unassigned") arrived(r) || (postM(r) && !arrived(r) && t(r))
          else postM(r) && !arrived(r) && t(r)
        c08ValueCells(sheetGrid, sheet,
          r => originM(r) && t(r),
          postT,
          if (label == "Unassigned") Some(gradedInf.getOrElse(ec, 0.0)) else None)
          .toSeq.map { case (c, v) => ((label, c), v) }
      }.toMap
      val strCells: Map[(String, String), Option[String]] =
        rows.flatMap { case (label, _) =>
          if (grid.cols.contains("0005")) Seq(((label, "0005"), Option(label)))
          else Nil
        }.toMap
      ec -> frameOf(sheetGrid, computed).negate(negCols).copy(strCells = strCells)
    }.toMap
  }

  // =========================================================================
  // C 08.03 / C 08.05 — the sparse PD-range pair (reference `c08.py`)
  // =========================================================================

  /** The hierarchical PD scale row axis of one class sheet: the populated
    * leaves in published order, their parents, and a trailing 9999
    * Unassigned row (`pd_scale.banded_rows`). Returns (ref, label,
    * leaf?) rows. */
  private def bandedRows(cfg: RefRunConfig,
      sheet: Vector[CRow]): Vector[(String, String, Boolean)] = {
    val order: Seq[(String, String)] =
      (if (cfg.isB31) Seq("0010" -> "0.00 to <0.15", "0015" -> "0.00 to <0.05",
        "0025" -> "0.05 to <0.10", "0030" -> "0.10 to <0.15")
      else Seq("0010" -> "0.00 to <0.15", "0020" -> "0.00 to <0.10",
        "0030" -> "0.10 to <0.15")) ++ Seq(
        "0040" -> "0.15 to <0.25", "0050" -> "0.25 to <0.50",
        "0060" -> "0.50 to <0.75", "0070" -> "0.75 to <2.5",
        "0080" -> "0.75 to <1.75", "0090" -> "1.75 to <2.5",
        "0100" -> "2.5 to <10", "0110" -> "2.5 to <5", "0120" -> "5 to <10",
        "0130" -> "10 to <100", "0140" -> "10 to <20", "0150" -> "20 to <30",
        "0160" -> "30 to <100", "0170" -> "100 (Default)")
    val parents = Set("0010", "0070", "0100", "0130")
    val leaves = sheet.flatMap(_.s("pd_band_leaf")).toSet
    val parentsPresent = sheet.flatMap(_.s("pd_band_parent")).toSet
    val rows = order.collect {
      case (ref, label) if parents(ref) && parentsPresent(ref) => (ref, label, false)
      case (ref, label) if !parents(ref) && leaves(ref) => (ref, label, true)
    }.toVector
    if (leaves("UNASSIGNED")) rows :+ (("9999", "Unassigned", true)) else rows
  }

  private def bandPred(ref: String, leaf: Boolean)(r: CRow): Boolean =
    if (leaf) r.s("pd_band_leaf").contains(if (ref == "9999") "UNASSIGNED" else ref)
    else r.s("pd_band_parent").contains(ref)

  /** Generate C 08.03 / OF 08.03 per class sheet over the sparse rows. */
  def c0803(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "c08_03")
    val pop = cube.filter(r => r.s("reporting_approach_origin").exists(irbNonSlotting))
    if (pop.isEmpty) return Map.empty
    val axis = pop.flatMap(_.s("reporting_class_origin")).toSet.toSeq.sorted
    axis.map { ec =>
      val sheet = pop.filter(r => r.s("reporting_class_origin").contains(ec))
      val rows = bandedRows(cfg, sheet)
      val sheetGrid = RefLayouts.Grid(rows.map(r => (r._1, r._2)), grid.cols)
      def sum(m: String, pred: CRow => Boolean): Double =
        sheet.iterator.filter(pred).map(_.m(m)).sum
      val computed = rows.flatMap { case (ref, _, leaf) =>
        val t = bandPred(ref, leaf) _
        Seq(
          ((ref, "0010"), Some(sum("reporting_gross_on_bs", t))),
          ((ref, "0020"), Some(sum("reporting_gross_off_bs", t))),
          ((ref, "0030"), wavg(sheet, t, "ccf_offw", "reporting_gross_off_bs")),
          ((ref, "0040"), Some(sum("ead_final", t))),
          ((ref, "0050"), wavg(sheet, t, "pd_w", "ead_final")),
          ((ref, "0060"), Some(distinctObligors(sheet, t))),
          ((ref, "0070"), wavg(sheet, t, "lgd_w", "ead_final")),
          ((ref, "0080"), wavg(sheet, t, "m_w", "ead_final")),
          ((ref, "0090"), Some(sum("rwa_final", t))),
          ((ref, "0100"), Some(sum("expected_loss", t))),
          // scra/gcra SafeSum 0.0; the provisions ladder swaps the ~0 cell
          // to Σ provision_allocated (sealed zero) — same value
          ((ref, "0110"), Some(sum("provision_allocated", t))))
      }.toMap
      ec -> frameOf(sheetGrid, computed)
    }.toMap
  }

  /** Generate C 08.05 / OF 08.05 per class sheet (PD back-testing). */
  def c0805(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "c08_05")
    val pop = cube.filter(r => r.s("reporting_approach_origin").exists(irbNonSlotting))
    if (pop.isEmpty) return Map.empty
    val axis = pop.flatMap(_.s("reporting_class_origin")).toSet.toSeq.sorted
    axis.map { ec =>
      val sheet = pop.filter(r => r.s("reporting_class_origin").contains(ec))
      val rows = bandedRows(cfg, sheet)
      val sheetGrid = RefLayouts.Grid(rows.map(r => (r._1, r._2)), grid.cols)
      val computed = rows.flatMap { case (ref, _, leaf) =>
        val t = bandPred(ref, leaf) _
        val subset = sheet.filter(t)
        // 0010: the UNWEIGHTED mean of post-floor PD (Mean verb; every IRB
        // row carries a non-null pd_floored, so n is the non-null count)
        val n = subset.map(_.n).sum
        val meanPd = if (n == 0) None
          else Some(subset.iterator.map(_.m("pd_floored_sum")).sum / n)
        val obligors = distinctObligors(sheet, t)
        val defaulted = distinctObligors(sheet, r => t(r) && r.is("is_defaulted"))
        val rate = if (obligors <= 0) 0.0 else defaulted / obligors
        Seq(
          ((ref, "0010"), meanPd),
          ((ref, "0020"), Some(obligors)),
          ((ref, "0030"), Some(defaulted)),
          ((ref, "0040"), Some(rate)),
          ((ref, "0050"), Some(rate))) // no historical series → copy of 0040
      }.toMap
      ec -> frameOf(sheetGrid, computed)
    }.toMap
  }

  /** Generate C 08.04 / OF 08.04 per class sheet (the flow clone): no
    * prior-period frame on this path, so opening/residual stay null and
    * only the closing RWEA row reports. */
  def c0804(cfg: RefRunConfig, cube: Vector[CRow],
      prior: Option[Vector[CRow]] = None): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "c08_04")
    val pop = cube.filter(r => r.s("reporting_approach_origin").exists(irbNonSlotting))
    if (pop.isEmpty) return Map.empty
    val axis = pop.flatMap(_.s("reporting_class_origin")).toSet.toSeq.sorted
    // With a PRIOR-period cube (the same book at the previous reference
    // date — COREP Annex II §3.3.6.1 ¶79 defines the flows against it),
    // row 0010 opens on the prior RWEA and row 0080 "Other" carries the
    // signed residual closing − opening so the statement foots (reference
    // `c08.py::generate_c08_04` / `_c08_04_other_flow`; the six
    // attributable driver rows 0020-0070 stay null — two point-in-time
    // snapshots cannot supply exposure-level period-over-period lineage).
    // The sheet loop iterates the CURRENT period's classes only, exactly
    // as the reference records.
    axis.map { ec =>
      def sumRwa(rows: Vector[CRow]) = rows
        .filter(r => r.s("reporting_approach_origin").exists(irbNonSlotting) &&
          r.s("reporting_class_origin").contains(ec))
        .map(_.m("rwa_final")).sum
      val closing = sumRwa(pop)
      val opening = prior.map(sumRwa)
      val computed = grid.rows.flatMap { case (ref, _) =>
        grid.cols.map(c => ((ref, c), (ref, c) match {
          case ("0090", "0010") => Some(closing)
          case ("0010", "0010") => opening
          case ("0080", "0010") => opening.map(closing - _)
          case _ => Option.empty[Double]
        }))
      }.toMap
      ec -> frameOf(grid, computed)
    }.toMap
  }

  // =========================================================================
  // C 09.02 / OF 09.02 — geographical breakdown, IRB (reference `c09.py`)
  // =========================================================================

  /** Row ref → row key per framework (`CRR_C09_02_ROWS` / `B31_C09_02_ROWS`). */
  private def c0902RowKeys(isB31: Boolean): Map[String, String] = {
    val shared = Map("0010" -> "central_govt_central_bank", "0020" -> "institution",
      "0030" -> "corporate", "0042" -> "sl_excl_slotting", "0045" -> "sl_slotting",
      "0050" -> "corporate_sme", "0060" -> "retail",
      "0070" -> "retail_mortgage", "0100" -> "retail_qrre", "0110" -> "retail_other",
      "0120" -> "retail_other_sme", "0130" -> "retail_other_non_sme")
    if (isB31) (shared -- Set("0070", "0110")) ++ Map(
      "0048" -> "corporate_fse_large",
      "0049" -> "corporate_purchased_receivables", "0055" -> "corporate_non_sme",
      "0071" -> "retail_resi_re_sme", "0072" -> "retail_resi_re_non_sme",
      "0073" -> "retail_comm_re_sme", "0074" -> "retail_comm_re_non_sme",
      "0105" -> "retail_purchased_receivables")
    else shared ++ Map("0080" -> "retail_mortgage_sme",
      "0090" -> "retail_mortgage_non_sme", "0140" -> "equity")
  }

  /** `_c09_02_row_pred` over one class basis column. */
  private def c0902RowPred(key: String,
      classOf: CRow => Option[String]): Option[CRow => Boolean] = {
    val corpFamily = Set("corporate", "corporate_sme")
    key match {
      case "corporate" =>
        Some(r => classOf(r).exists(corpFamily + "specialised_lending"))
      case "sl_excl_slotting" => Some(r =>
        classOf(r).contains("specialised_lending") &&
          !r.s("reporting_approach_origin").contains("slotting"))
      case "sl_slotting" => Some(r =>
        classOf(r).contains("specialised_lending") &&
          r.s("reporting_approach_origin").contains("slotting"))
      case "corporate_sme" =>
        Some(r => classOf(r).exists(corpFamily) && smeClass(r))
      case "corporate_fse_large" => None // cp_apply_fi_scalar: never sealed
      case "corporate_purchased_receivables" => None // recorded empty key
      case "corporate_non_sme" =>
        Some(r => classOf(r).exists(corpFamily) && !smeClass(r))
      case "retail" => Some(r =>
        classOf(r).exists(Set("retail_mortgage", "retail_qrre", "retail_other")))
      case "retail_mortgage_sme" =>
        Some(r => classOf(r).contains("retail_mortgage") && smeClass(r))
      case "retail_mortgage_non_sme" =>
        Some(r => classOf(r).contains("retail_mortgage") && !smeClass(r))
      case "retail_other_sme" =>
        Some(r => classOf(r).contains("retail_other") && smeClass(r))
      case "retail_other_non_sme" =>
        Some(r => classOf(r).contains("retail_other") && !smeClass(r))
      case "retail_purchased_receivables" => None // recorded empty key
      case re if re.startsWith("retail_resi_re") || re.startsWith("retail_comm_re") =>
        val ptypes: Set[String] =
          if (re.contains("resi")) Set("residential", "rre") else Set("commercial", "cre")
        val wantSme = re.endsWith("_sme") && !re.endsWith("non_sme")
        Some(r => classOf(r).contains("retail_mortgage") &&
          (smeClass(r) == wantSme) &&
          r.s("property_type").exists(ptypes))
      case direct if Set("central_govt_central_bank", "institution",
        "retail_mortgage", "retail_qrre", "retail_other", "equity")(direct) =>
        Some(r => classOf(r).contains(direct))
      case _ => None
    }
  }

  /** Generate C 09.02 / OF 09.02: TOTAL first, then one frame per country
    * contributed by either basis of the IRB book (slotting included). */
  def c0902(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "c09_02")
    val keys = c0902RowKeys(cfg.isB31)
    val pop = cube.filter(r => popIrbOrigin(r) || popIrbPost(r))
    if (pop.isEmpty) return Map.empty
    def geoO(r: CRow) = r.s("reporting_country_origin").orElse(r.s("cp_country_code"))
    def geoP(r: CRow) = r.s("reporting_country").orElse(geoO(r))
    val axis = pop.flatMap(r =>
      (if (popIrbOrigin(r)) geoO(r) else None) ++
        (if (popIrbPost(r)) geoP(r) else None)).toSet.toSeq.sorted
    val negCols = Set("0121", "0122")
    val sheets = Seq(("TOTAL", (_: CRow) => true, (_: CRow) => true)) ++
      axis.map(c => (c, (r: CRow) => geoO(r).contains(c),
        (r: CRow) => geoP(r).contains(c)))
    sheets.map { case (name, gO, gP) =>
      val frameRows = pop.filter(r =>
        (popIrbOrigin(r) && gO(r)) || (popIrbPost(r) && gP(r)))
      def sum(m: String, pred: CRow => Boolean): Double =
        frameRows.iterator.filter(pred).map(_.m(m)).sum
      val computed = scala.collection.mutable.Map[(String, String), Option[Double]]()
      val rowPreds = scala.collection.mutable.Map[String, Option[CRow => Boolean]]()
      for ((ref, _) <- grid.rows) {
        val isTotal = ref == "0150"
        val predO0 = if (isTotal) Some((_: CRow) => true)
          else keys.get(ref).flatMap(k =>
            c0902RowPred(k, r => r.s("reporting_class_origin")))
        val predP0 = if (isTotal) Some((_: CRow) => true)
          else keys.get(ref).flatMap(k =>
            c0902RowPred(k, r => r.s("reporting_class")))
        val o = predO0.map(t => (r: CRow) => popIrbOrigin(r) && gO(r) && t(r))
        val p = predP0.map(t => (r: CRow) => popIrbPost(r) && gP(r) && t(r))
        rowPreds(ref) = (o, p) match {
          case (None, None) => None
          case _ => Some((r: CRow) => o.exists(_(r)) || p.exists(_(r)))
        }
        (o, p) match {
          case (Some(oP), Some(pP)) =>
            def put(c: String, v: Option[Double]): Unit =
              if (grid.cols.contains(c)) computed((ref, c)) = v
            val grossO = sum("reporting_gross_on_bs", oP) +
              sum("reporting_gross_off_bs", oP) // no CCR term (with_ccr=False)
            val defO = (r: CRow) => oP(r) && r.is("is_defaulted")
            val defP = (r: CRow) => pP(r) && r.is("is_defaulted")
            put("0010", Some(grossO))
            put("0030", Some(sum("reporting_gross_on_bs", defO) +
              sum("reporting_gross_off_bs", defO)))
            put("0040", None); put("0060", None); put("0070", None)
            put("0050", None); put("0055", None) // gcra/scra: never sealed
            put("0080", wavg(frameRows, oP, "pd_w", "ead_final"))
            put("0090", wavg(frameRows, oP, "lgd_postcrm_w", "ead_final"))
            put("0100", wavg(frameRows, defO, "lgd_postcrm_w", "ead_final"))
            put("0105", Some(sum("ead_final", pP)))
            put("0107", Some(sum("ead_final", defP)))
            put("0110", Some(sum("rwa_pre_factor", pP)))
            put("0120", Some(sum("rwa_final", defP)))
            put("0121", Some(sum("rwa_pre_factor", r =>
              pP(r) && r.is("sme_supporting_factor_applied")) -
              sum("rwa_final", r => pP(r) && r.is("sme_supporting_factor_applied"))))
            put("0122", Some(sum("rwa_pre_factor", r =>
              pP(r) && r.is("infrastructure_factor_applied")) -
              sum("rwa_final", r => pP(r) && r.is("infrastructure_factor_applied"))))
            put("0125", Some(sum("rwa_final", pP)))
            put("0130", Some(sum("expected_loss", oP)))
          case _ => ()
        }
      }
      val constrained = grid.rows.map(_._1).filterNot(_ == "0150").toSet
      val frame = nullEmptyRows(frameOf(grid, computed.toMap), frameRows,
        rowPreds.toMap, constrained, Set.empty)
      name -> frame.negate(negCols)
    }.toMap
  }

  // =========================================================================
  // C 34.01 / C 34.02 / C 34.08 — CCR (reference `c34.py`)
  // =========================================================================

  /** The SA-CCR population (`collect_ccr_rows`): the synthetic `ccr__`
    * netting-set rows, FCCM SFTs excluded. */
  private def ccrPop(cube: Vector[CRow]): Vector[CRow] =
    cube.filter(r => r.s("ccr_netting_set_id").isDefined &&
      !r.s("risk_type").contains("CCR_SFT"))
  private def qccpTrade(r: CRow): Boolean =
    r.s("cp_entity_type").contains("ccp") && r.b("cp_is_qccp").forall(identity)

  /** C 34.01: portfolio SA-CCR EAD + RWEA (None when no SA-CCR rows). */
  def c3401(cfg: RefRunConfig, cube: Vector[CRow]): Option[RefFrame] = {
    val ccr = ccrPop(cube)
    if (ccr.isEmpty) return None
    val grid = RefLayouts.grid(cfg.framework, "c34_01")
    Some(frameOf(grid, Map(
      ("0010", "0010") -> Some(ccr.map(_.m("ead_final")).sum),
      ("0010", "0020") -> Some(ccr.map(_.m("rwa_final")).sum))))
  }

  /** C 34.02: one 1-row frame per netting set (EAD). */
  def c3402(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val ccr = ccrPop(cube)
    val grid = RefLayouts.grid(cfg.framework, "c34_02")
    ccr.flatMap(_.s("ccr_netting_set_id")).distinct.sorted.map { ns =>
      val subset = ccr.filter(_.s("ccr_netting_set_id").contains(ns))
      ns -> frameOf(grid, Map(
        ("0010", "0010") -> Some(subset.map(_.m("ead_final")).sum)))
    }.toMap
  }

  /** C 34.08: the CCP subset split by the QCCP flag + default funds.
    * Emitted only when CCP trade legs or default-fund rows exist. */
  def c3408(cfg: RefRunConfig, cube: Vector[CRow]): Option[RefFrame] = {
    val ccr = ccrPop(cube)
    val df = cube.filter(_.s("risk_type").contains("CCR_DEFAULT_FUND"))
    val ccp = ccr.filter(_.s("cp_entity_type").contains("ccp"))
    if (ccp.isEmpty && df.isEmpty) return None
    val grid = RefLayouts.grid(cfg.framework, "c34_08")
    def sums(rows: Vector[CRow]) =
      (rows.map(_.m("ead_final")).sum, rows.map(_.m("rwa_final")).sum)
    val (qE, qR) = sums(ccp.filter(r => r.b("cp_is_qccp").forall(identity)))
    val (nE, nR) = sums(ccp.filterNot(r => r.b("cp_is_qccp").forall(identity)))
    val (dE, dR) = sums(df)
    Some(frameOf(grid, Map(
      ("0010", "0010") -> Some(qE), ("0010", "0020") -> Some(qR),
      ("0020", "0010") -> Some(nE), ("0020", "0020") -> Some(nR),
      ("0030", "0010") -> Some(dE), ("0030", "0020") -> Some(dR))))
  }

  // =========================================================================
  // C 08.06 / OF 08.06 — slotting (reference `c08.py::_c08_06_spec`)
  // =========================================================================

  /** The category × maturity-band row axis: ref → (short?, category or
    * None for Total, display RW). The B31 grid adds the PS1/26
    * substantially-stronger refinement rows 0015/0025 (no carrier is
    * sealed for them, so they always zero-fill with the display weight);
    * the published order comes from the grid itself. */
  private val c0806RowDefs: Map[String, (Option[Boolean], Option[String], Double)] = Map(
    "0010" -> ((Some(true), Some("strong"), 0.5)),
    "0015" -> ((Some(true), Some("strong_substantially_stronger"), 0.5)),
    "0020" -> ((Some(false), Some("strong"), 0.7)),
    "0030" -> ((Some(true), Some("good"), 0.7)),
    "0025" -> ((Some(true), Some("good_substantially_stronger"), 0.7)),
    "0040" -> ((Some(false), Some("good"), 0.9)),
    "0050" -> ((Some(true), Some("satisfactory"), 1.15)),
    "0060" -> ((Some(false), Some("satisfactory"), 1.15)),
    "0070" -> ((Some(true), Some("weak"), 2.5)),
    "0080" -> ((Some(false), Some("weak"), 2.5)),
    "0090" -> ((Some(true), Some("default"), 0.0)),
    "0100" -> ((Some(false), Some("default"), 0.0)),
    "0110" -> ((Some(true), None, Double.NaN)),
    "0120" -> ((Some(false), None, Double.NaN)))

  /** Generate C 08.06 / OF 08.06: one frame per SL type over the slotting
    * book. Empty non-Total rows zero-fill with the fixed display risk
    * weight in col 0070; populated rows and the Total pair compute. */
  def c0806(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "c08_06")
    val pop = cube.filter(r => r.s("reporting_approach_origin").contains("slotting"))
    if (pop.isEmpty) return Map.empty
    pop.flatMap(_.s("sl_type")).toSet.toSeq.sorted.map { slType =>
      val sheet = pop.filter(r => r.s("sl_type").contains(slType))
      def sum(m: String, pred: CRow => Boolean): Double =
        sheet.iterator.filter(pred).map(_.m(m)).sum
      val computed = grid.rows.flatMap { case (ref, _) =>
        val (short, cat, disp) = c0806RowDefs(ref)
        val t = (r: CRow) =>
          short.forall(sv => r.b("sl_short").contains(sv)) &&
            cat.forall(c => r.s("slotting_category").contains(c))
        val empty = cat.isDefined && !sheet.exists(t)
        val cells: Seq[(String, Option[Double])] =
          if (empty) // zero-fill with the display RW (`c08_06_zero_row`)
            grid.cols.map(c => c -> (if (c == "0070") Some(disp)
              else if (c == "0031" || c == "0060") Some(0.0) else Some(0.0)))
          else {
            val ead = sum("ead_final", t)
            Seq(
              "0010" -> Some(sum("reporting_gross_on_bs", t) +
                sum("reporting_gross_off_bs", t)),
              "0020" -> Some(sum("reporting_gross_on_bs", t) +
                sum("reporting_gross_off_bs", t)), // post == origin: no CRM
              "0030" -> Some(sum("reporting_gross_off_bs", t)),
              "0031" -> None, // B31 FCCM delta: structural null
              "0040" -> Some(ead),
              "0050" -> { // off-BS exposure value, null on an empty side
                val off = sheet.filter(r => t(r) && bsSide(r).contains("off"))
                if (off.isEmpty) None else Some(off.map(_.m("ead_final")).sum)
              },
              "0060" -> None, // CCR of-which: structural null
              "0070" -> (if (ead == 0.0) None
                else Some(sum("rwa_pre_factor", t) / ead)),
              "0080" -> Some(sum("rwa_final", t)),
              "0090" -> Some(sum("expected_loss", t)),
              "0100" -> Some(sum("provision_allocated", t)))
          }
        cells.filter { case (c, _) => grid.cols.contains(c) }
          .map { case (c, v) => ((ref, c), v) }
      }.toMap
      slType -> frameOf(grid, computed)
    }.toMap
  }
}
