package graft.refbook

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The reporting cube: ONE distributed aggregation of the sealed ledger
  * over the full discriminator key set, collected at presentation grain.
  *
  * Every COREP / Pillar 3 cell in the estate is a conditional sum over
  * the sealed ledger keyed by bounded-cardinality discriminators (class,
  * approach, risk type, balance-sheet side, risk weight, CCF, flags…).
  * Materialising the cube once — `groupBy(keys).agg(sum(measures))`, a
  * single map-side-combinable shuffle whose output is bounded by the
  * number of REALISED key profiles, not by row count — and assembling
  * the small published grids driver-side keeps the whole template estate
  * at one pass over a 100 TB book (the reference collects each
  * template's population separately; this is the Spark-shaped
  * equivalent of its `_predicate_subsets` batching).
  */
object RefCube {

  /** Discriminator keys (nullable; null is a legitimate key value). */
  val keyCols: Seq[String] = Seq(
    "exposure_class", "reporting_class_origin", "reporting_class",
    "reporting_approach_origin", "reporting_approach", "risk_type",
    "exposure_type", "reporting_on_balance_sheet", "reporting_rw", "ccf",
    "is_defaulted", "is_sme", "sme_supporting_factor_applied",
    "infrastructure_factor_applied", "currency_mismatch_multiplier_applied",
    "is_under_irb_rollout", "sl_type", "property_type",
    "materially_dependent_on_property", "is_qualifying_re", "is_adc",
    "cp_entity_type", "cp_is_qccp", "cp_country_code",
    "reporting_country_origin", "reporting_country",
    "is_guarantee_beneficial", "post_crm_exposure_class_guaranteed",
    "protection_type", "external_unrated",
    // IRB row axes (bounded: band-label vocabularies, the grade ladder)
    "pd_band_leaf", "pd_band_parent", "cr6_band_leaf", "cr6_band_parent",
    "pd_band_coarse", "cp_internal_rating_grade",
    // CCR: the netting-set id IS the C 34.02 sheet axis (bounded by the
    // book's netting sets, the grain that template publishes at)
    "ccr_netting_set_id",
    // slotting / equity axes (C 08.06, CR10, C 02.00 equity method split)
    "slotting_category", "sl_short", "equity_method", "equity_type")

  /** Summed measures (nulls count 0.0 — the reference `col_sum` rule). */
  val measureCols: Seq[String] = Seq(
    "reporting_gross_on_bs", "reporting_gross_off_bs",
    "reporting_gross_drawn", "reporting_gross_undrawn",
    "ead_final", "rwa_final", "rwa_pre_factor", "rwa_pre_floor", "sa_rwa",
    "provision_deducted", "provision_allocated",
    "collateral_adjusted_value", "vol_mat_adj",
    "prot_guarantee", "prot_credit_derivative", "prot_fcsm",
    "prot_other_funded", "prot_unfunded", "prot_unfunded_irb",
    // IRB weighted-average carriers (per-row products summed, so a cell's
    // WeightedAvg is Σ(value·weight)/Σ(weight)), plus unweighted sums for
    // the arithmetic-mean cells and the EL total
    "expected_loss", "pd_floored_sum", "pd_w", "lgd_w", "lgd_postcrm_w",
    "m_w", "ccf_offw", "ccf_eadw",
    // IRB collateral-in-LGD carriers (C 08.01 cols 0180-0210 read them
    // uncapped; CR7-A caps each at the leg's own exposure value)
    "crm_lgd_re", "coll_re_capped")

  /** Distinct-obligor index for the COREP/Pillar 3 obligor-count cells
    * (`Count(counterparty_reference, distinct=True)`, reference
    * `reporting/kernel/sums.py` Count-distinct verbs).
    *
    * A cell's population is an arbitrary PREDICATE over cube profiles, and
    * populations UNION profiles (a band total unions its leaves, the grades
    * row unions F-IRB and A-IRB), so a per-profile `countDistinct` cannot
    * be summed — an obligor with legs in two profiles of one population
    * would double-count. Collecting obligor-id sets per profile (the
    * pre-round-15 shape) is exact but puts O(obligors) strings on the
    * driver — the one scale soft spot the r14 verdict flagged.
    *
    * This index is the distributed exact answer: one extra pass groups the
    * ledger's obligors by their SIGNATURE — the sorted set of cube-profile
    * ids the obligor has rows under — and collects only (signature,
    * obligor-count) pairs. Any population (a set of profile ids) then
    * counts exactly, driver-side, as Σ count over signatures that
    * intersect it. Driver memory is bounded by the number of REALISED
    * signatures (obligors cluster into few distinct profile combinations),
    * the same realised-profile bound the cube itself rests on — never by
    * the obligor count. */
  final class ObligorIndex(sigs: Vector[(Array[Int], Long)]) {
    /** Exact distinct obligors having ≥1 row in any of `pids`. */
    def count(pids: Set[Int]): Long =
      if (pids.isEmpty) 0L
      else sigs.iterator.collect {
        case (sig, k) if sig.exists(pids.contains) => k
      }.sum
  }
  object ObligorIndex { val empty = new ObligorIndex(Vector.empty) }

  /** Exact distinct-obligor count over the cube rows matching `pred` —
    * shared by every obligor-count cell (C 08.01 col 0300, C 08.03 col
    * 0060, C 08.05, CR6 col g, CR9). Predicate evaluation stays on the
    * bounded collected profiles; the count resolves against the
    * distributed-built [[ObligorIndex]]. */
  def distinctObligors(rows: Vector[CRow], pred: CRow => Boolean): Double = {
    val matched = rows.iterator.filter(pred).map(_.pid).toSet
    if (matched.isEmpty) 0.0
    else rows.head.oindex.count(matched).toDouble
  }

  /** One collected cube row: typed key accessors + measure sums, plus the
    * row's profile id and the run's shared [[ObligorIndex]] (obligor
    * counts resolve through the index — no obligor ids on the driver). */
  final case class CRow(k: Map[String, Any], m: Map[String, Double], n: Long,
      pid: Int = -1, oindex: ObligorIndex = ObligorIndex.empty) {
    def s(name: String): Option[String] = k.get(name).collect { case v: String => v }
    def b(name: String): Option[Boolean] = k.get(name).collect { case v: Boolean => v }
    def d(name: String): Option[Double] = k.get(name).collect {
      case v: Double => v
      case v: java.lang.Number => v.doubleValue()
    }
    def is(name: String): Boolean = b(name).contains(true)
  }

  /** Derive the per-row reporting magnitudes the cube sums (reference
    * `reporting/corep/c07.py::_prepare` + `_protection_exprs`: the
    * Annex II substitution block with the proportional block cap, the
    * collateral volatility adjustment) then cube the ledger. */
  def build(ledger: DataFrame): Vector[CRow] = {
    val guaranteed = coalesce(col("guaranteed_portion"), lit(0.0))
    val applied = coalesce(col("is_guarantee_beneficial") === true, lit(false))
    val guarantee = when(col("protection_type") === "guarantee" && applied, guaranteed)
      .otherwise(0.0)
    val creditDeriv =
      when(col("protection_type") === "credit_derivative" && applied, guaranteed)
        .otherwise(0.0)
    val fcsm = coalesce(col("fcsm_collateral_value"), lit(0.0))
    val otherFunded = coalesce(col("life_ins_collateral_value"), lit(0.0)) +
      coalesce(col("third_party_deposit_value"), lit(0.0))
    val blockTotal = guarantee + creditDeriv + fcsm + otherFunded
    // Cap basis: the row's contribution to C 07.00 col 0040 (gross net of
    // provisions), floored at zero; proportional shed on over-run.
    val grossBasis =
      coalesce(col("reporting_gross_on_bs"), lit(0.0)) +
        coalesce(col("reporting_gross_off_bs"), lit(0.0))
    val basis = greatest(
      grossBasis - coalesce(col("provision_deducted"), lit(0.0)), lit(0.0))
    val scale = when(blockTotal > basis, basis / blockTotal).otherwise(lit(1.0))
    // The IRB-template twin of the unfunded carrier (reference
    // `corep/crm_substitution.py::irb_protection_exprs` /
    // `irb_block_cap_scale`): C 08.01/02's block cap nets NO provisions
    // off its basis — the Art. 111(2) drawn-first deduction is SA-only —
    // so the C 07.00-capped `prot_unfunded` cannot serve both templates.
    // The C 08.01 cols 0040/0050 split this one carrier by the
    // `protection_type` cube key; the col 0080 INFLOW binds it too, so
    // outflow and inflow stay the same capped magnitude by construction.
    val unfundedRaw = guarantee + creditDeriv
    val basisIrb = greatest(grossBasis, lit(0.0))
    val scaleIrb = when(unfundedRaw > basisIrb, basisIrb / unfundedRaw)
      .otherwise(lit(1.0))
    val prepared = ledger.withColumns(Map(
      "external_unrated" -> col("external_cqs").isNull,
      "vol_mat_adj" ->
        (coalesce(col("collateral_market_value"), lit(0.0)) -
          coalesce(col("collateral_adjusted_value"), lit(0.0))),
      "prot_guarantee" -> guarantee * scale,
      "prot_credit_derivative" -> creditDeriv * scale,
      "prot_fcsm" -> fcsm * scale,
      "prot_other_funded" -> otherFunded * scale,
      "prot_unfunded" -> (guarantee + creditDeriv) * scale,
      "prot_unfunded_irb" -> unfundedRaw * scaleIrb,
      // IRB weighted-average carriers (see measureCols)
      "pd_floored_sum" -> col("pd_floored"),
      "pd_w" -> col("pd_floored") * col("ead_final"),
      "lgd_w" -> col("lgd_floored") * col("ead_final"),
      "lgd_postcrm_w" -> col("lgd_post_crm") * col("ead_final"),
      "m_w" -> col("irb_maturity_m") * col("ead_final"),
      "ccf_offw" -> col("ccf") * col("reporting_gross_off_bs"),
      "ccf_eadw" -> col("ccf") * col("ead_final"),
      "crm_lgd_re" -> col("collateral_re_value"),
      "coll_re_capped" -> least(col("collateral_re_value"), col("ead_final"))))
    val aggs = measureCols.map(c => sum(coalesce(col(c), lit(0.0))).as(c)) :+
      count(lit(1)).as("__n")
    val rows = prepared
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val oindex = buildObligorIndex(prepared, rows)
    rows.iterator.zipWithIndex.map { case (r: Row, pid) =>
      val k = keyCols.map(c => c -> r.get(r.fieldIndex(c))).toMap
      val m = measureCols.map { c =>
        val v = r.get(r.fieldIndex(c))
        c -> (if (v == null) 0.0 else v.asInstanceOf[Number].doubleValue())
      }.toMap
      CRow(k, m, r.getLong(r.fieldIndex("__n")), pid, oindex)
    }.toVector
  }

  /** The obligor-signature pass behind [[ObligorIndex]]: broadcast the
    * collected profile→pid map back onto the prepared ledger (null-safe
    * equality on every key column — null is a legitimate key value), then
    * two bounded shuffles: obligor → sorted set of its profile ids, and
    * signature → obligor count. Only (signature, count) rows reach the
    * driver. Null obligor references are excluded, matching both
    * `collect_set`'s and `countDistinct`'s null discipline. */
  private def buildObligorIndex(prepared: DataFrame, rows: Array[Row]): ObligorIndex = {
    if (rows.isEmpty) return ObligorIndex.empty
    val spark = prepared.sparkSession
    val keySchema = org.apache.spark.sql.types.StructType(
      prepared.select(keyCols.map(col): _*).schema.fields :+
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType, nullable = false))
    val pidRows: java.util.List[Row] = java.util.Arrays.asList(
      rows.zipWithIndex.map { case (r, pid) =>
        Row.fromSeq(keyCols.map(c => r.get(r.fieldIndex(c))) :+ pid)
      }: _*)
    val pidMap = spark.createDataFrame(pidRows, keySchema)
    val joinCond = keyCols.map(c => prepared(c) <=> pidMap(c)).reduce(_ && _)
    val sigRows = prepared
      .filter(col("counterparty_reference").isNotNull)
      .join(broadcast(pidMap), joinCond)
      .groupBy(prepared("counterparty_reference"))
      .agg(sort_array(collect_set(col("__pid"))).as("__sig"))
      .groupBy(col("__sig")).agg(count(lit(1)).as("__k"))
      .collect()
    new ObligorIndex(sigRows.iterator.map { r =>
      (r.getSeq[Int](r.fieldIndex("__sig")).toArray,
        r.getLong(r.fieldIndex("__k")))
    }.toVector)
  }

  // ---- driver-side aggregation helpers (the cellspec sum semantics) ---

  type Pred = CRow => Boolean

  def n(cube: Vector[CRow], pred: Pred): Long =
    cube.iterator.filter(pred).map(_.n).sum

  def total(cube: Vector[CRow], pred: Pred, measure: String): Double =
    cube.iterator.filter(pred).map(_.m(measure)).sum

  /** `Sum` with the COREP/Pillar 3 empty-subset policy: None when the
    * subset is empty and the policy is null; 0.0 when zero. */
  def sumCell(cube: Vector[CRow], pred: Pred, measure: String,
      emptyAsNone: Boolean): Option[Double] =
    if (emptyAsNone && n(cube, pred) == 0) None
    else Some(total(cube, pred, measure))
}

/** One rendered template frame in the published grid. `strCells` carries
  * the String label columns (C 08.02 col 0005, CR6 col a, CR9 cols a/b) —
  * injected post-execute in the reference, so they survive the all-null
  * row passes, which touch the Float64 cells only. */
final case class RefFrame(
    rows: Vector[(String, String)],
    cols: Vector[String],
    cells: Map[(String, String), Option[Double]],
    strCells: Map[(String, String), Option[String]] = Map.empty) {

  def strValue(rowRef: String, colRef: String): Option[String] =
    strCells.getOrElse((rowRef, colRef), None)

  def value(rowRef: String, colRef: String): Option[Double] =
    cells.getOrElse((rowRef, colRef), None)

  /** Negate the "(-)"-labelled deduction columns (COREP Annex II §1.3),
    * normalising -0.0 and keeping nulls null (reference
    * `corep/postpass.py::negate_deduction_cols`). */
  def negate(colRefs: Set[String]): RefFrame =
    copy(cells = cells.map {
      case ((r, c), Some(v)) if colRefs(c) =>
        ((r, c), Some(if (v == 0.0) 0.0 else -v))
      case other => other
    })

  /** Render the named rows all-null (empty-subset / structural rows). */
  def nullRows(refs: Set[String]): RefFrame =
    if (refs.isEmpty) this
    else copy(cells = cells.map {
      case ((r, c), _) if refs(r) => ((r, c), None)
      case other => other
    })
}

object RefFrame {
  /** Assemble a frame over a published grid from a cell function. */
  def build(grid: RefLayouts.Grid)(
      cell: (String, String) => Option[Double]): RefFrame =
    RefFrame(grid.rows, grid.cols,
      (for { (r, _) <- grid.rows; c <- grid.cols } yield ((r, c), cell(r, c))).toMap)
}
