package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Two-run comparison / reconciliation at reference depth (reference
  * `analysis/reconciliation.py` ~1356 LoC; collapse pre-step
  * `engine/aggregator/_collapse.py`):
  *
  *  1. **Collapse to key grain** — our engine splits one loan into
  *     sub-rows (guarantee legs, RE splits); a legacy calculator reports
  *     one row per loan. Before comparing, sub-rows collapse back to the
  *     reconciliation key: additive money fields summed (exact decimal
  *     accumulation), ratio columns recomputed from the summed
  *     numerator/denominator, categoricals reduced deterministically
  *     (min — the reference's `first` is partition-order-dependent) with
  *     a heterogeneity flag when a group disagreed.
  *  2. **Multi-component compare** — full-outer join on the composite
  *     key with presence flags; per component (numeric with abs/rel
  *     tolerance, or categorical with normalisation + legacy value-map)
  *     a delta, a relative delta and a five-way bucket
  *     (`reconciliation.py:67-71` taxonomy); then the row-level rollup
  *     bucket and the break/within component name lists.
  *  3. **Worklist** — breaks ordered by materiality with a deterministic
  *     key tiebreak (the analyst queue, `reconciliation.py:1120`).
  */
object Reconciliation {

  val Buckets = Seq("exact_match", "within_tolerance", "break",
    "missing_left", "missing_right")

  final case class NumericComponent(
      name: String, absTol: Double, relTol: Double = 0.0)
  final case class CategoricalComponent(
      name: String, valueMap: Seq[(String, String)] = Nil)

  /** abs(delta) at or under this is EXACT, not merely within tolerance. */
  val ExactEpsilon = 1e-9
  /** |legacy| under this guard suppresses the relative delta (div-0). */
  val ZeroGuard = 1e-10

  // ---- 1. collapse ----------------------------------------------------

  /** Collapse sub-rows to one row per key: `additive` = (column,
    * decimal scale) summed exactly; `ratios` = (name, numerator,
    * denominator) recomputed post-sum; categoricals reduced by min with
    * `recon_grain_heterogeneous` set when any group disagreed. */
  def collapseToKeyGrain(
      df: DataFrame, keys: Seq[String],
      additive: Seq[(String, Int)],
      ratios: Seq[(String, String, String)] = Nil,
      categoricals: Seq[String] = Nil): DataFrame = {
    // One collect_set per categorical feeds BOTH the deterministic-min
    // representative (array_min over the set == min over the column,
    // nulls dropped by both) and the heterogeneity count (size(set) ==
    // countDistinct). Value-identical to the min+countDistinct form, but
    // (a) a string-buffer min forces SortAggregate — two full sorts
    // around the exchange — while collect_set plans as an
    // OBJECT-HASH aggregate, and (b) countDistinct plans a two-phase
    // distinct aggregation (an Expand multiplying rows per distinct
    // column) that size(collect_set) avoids outright (r19, guide §2.3/§4:
    // the q93 collapse was 2 sorts of the full leg frame per execution).
    val aggs =
      additive.map { case (c, sc) =>
        sum(col(c).cast(DecimalType(38, sc))).cast("double").as(c) } ++
      categoricals.map(c => collect_set(col(c)).as(s"_set_$c"))
    val grouped = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val withReps = categoricals.foldLeft(grouped) { (acc, c) =>
      acc.withColumn(c, array_min(col(s"_set_$c")))
    }
    val ratioed = ratios.foldLeft(withReps) { case (acc, (n, num, den)) =>
      acc.withColumn(n, col(num) / col(den))
    }
    val het = categoricals.map(c => size(col(s"_set_$c")) > 1)
      .reduceOption(_ || _).getOrElse(lit(false))
    ratioed
      .withColumn("recon_grain_heterogeneous", het)
      .drop(categoricals.map(c => s"_set_$c"): _*)
  }

  // ---- 2. multi-component compare -------------------------------------

  private def normalise(c: Column): Column = upper(trim(c))

  /** Map keys/values are casefolded+stripped before matching, mirroring
    * the reference's `_apply_value_map` (`reconciliation.py:1346-1351`)
    * — a config with lowercase/mixed-case keys still matches the
    * already-normalised legacy value. */
  private def applyValueMap(c: Column, vm: Seq[(String, String)]): Column =
    vm.foldLeft(Option.empty[Column]) {
      case (None, (k, v)) => Some(when(c === k.trim.toUpperCase, v.trim))
      case (Some(acc), (k, v)) => Some(acc.when(c === k.trim.toUpperCase, v.trim))
    }.fold(c)(_.otherwise(c))

  /** Full-outer multi-measure compare. Output: keys, our_/legacy_ value
    * pairs, per-component `abs_delta_*` / `rel_delta_*` / `*_bucket`,
    * the `row_bucket` rollup, and `break_components`. */
  def compareMulti(
      ours: DataFrame, theirs: DataFrame, keys: Seq[String],
      numerics: Seq[NumericComponent],
      categoricals: Seq[CategoricalComponent] = Nil): DataFrame = {
    val compNames = numerics.map(_.name) ++ categoricals.map(_.name)
    val lcols = keys.map(col) ++
      compNames.map(n => col(n).as(s"our_$n")) :+ lit(true).as("_our_present")
    val rcols = keys.map(col) ++
      compNames.map(n => col(n).as(s"legacy_$n")) :+ lit(true).as("_legacy_present")
    val joined = ours.select(lcols: _*)
      .join(theirs.select(rcols: _*), keys, "full")
      .withColumn("_our_present", coalesce(col("_our_present"), lit(false)))
      .withColumn("_legacy_present", coalesce(col("_legacy_present"), lit(false)))

    def presenceChain(rest: Column): Column =
      when(!col("_our_present"), "missing_left")
        .when(!col("_legacy_present"), "missing_right")
        .otherwise(rest)

    val withNumerics = numerics.foldLeft(joined) { (acc, n) =>
      val ov = col(s"our_${n.name}")
      val lv = col(s"legacy_${n.name}")
      val delta = ov - lv
      val within = (abs(delta) <= n.absTol) ||
        (abs(lv) > ZeroGuard && abs(delta / lv) <= n.relTol)
      acc
        .withColumn(s"abs_delta_${n.name}", delta)
        .withColumn(s"rel_delta_${n.name}",
          when(abs(lv) > ZeroGuard, delta / lv))
        .withColumn(s"${n.name}_bucket", presenceChain(
          when(ov.isNull && lv.isNull, "exact_match")
            .when(ov.isNull || lv.isNull, "break")
            .when(abs(delta) <= ExactEpsilon, "exact_match")
            .when(within, "within_tolerance")
            .otherwise("break")))
    }
    val withCats = categoricals.foldLeft(withNumerics) { (acc, c) =>
      val ov = normalise(col(s"our_${c.name}"))
      // re-normalise after the value-map so a map to canonical lowercase
      // ("CORP" -> "corporate") still matches the normalised our-side
      val lv = normalise(
        applyValueMap(normalise(col(s"legacy_${c.name}")), c.valueMap))
      acc.withColumn(s"${c.name}_bucket", presenceChain(
        when(col(s"our_${c.name}").isNull && col(s"legacy_${c.name}").isNull,
          "exact_match")
          .when(col(s"our_${c.name}").isNull || col(s"legacy_${c.name}").isNull,
            "break")
          .when(ov === lv, "exact_match")
          .otherwise("break")))
    }
    val bucketCols = compNames.map(n => col(s"${n}_bucket"))
    val anyBreak = bucketCols.map(_ === "break").reduce(_ || _)
    val anyWithin = bucketCols.map(_ === "within_tolerance").reduce(_ || _)
    withCats
      .withColumn("row_bucket", presenceChain(
        when(anyBreak, "break")
          .when(anyWithin, "within_tolerance")
          .otherwise("exact_match")))
      .withColumn("break_components", concat_ws(",",
        compNames.map(n =>
          when(col(s"${n}_bucket") === "break", n)): _*))
  }

  /** Bucket summary: counts + absolute materiality per row bucket. */
  def summary(recon: DataFrame, materialityCol: String): DataFrame =
    recon.groupBy(col("row_bucket"))
      .agg(count(lit(1)).as("n"),
           sum(coalesce(abs(col(materialityCol)), lit(0.0))).as("abs_materiality"))
      .orderBy(col("row_bucket"))

  /** Break worklist: breaks ranked by descending materiality with a
    * deterministic key tiebreak (the reference's analyst queue).
    *
    * `orderBy(...).limit(n)` plans as TakeOrderedAndProject — each
    * partition keeps its local top-n and only those survivors merge on
    * the driver side — so a recon with millions of break rows never
    * funnels through a single-partition global sort. The rank window
    * then runs over the ≤limit survivors only (bounded input). */
  def breakWorklist(
      recon: DataFrame, keys: Seq[String], materialityCol: String,
      limit: Int = 100): DataFrame = {
    val order = (coalesce(abs(col(materialityCol)), lit(0.0)).desc +:
      keys.map(col)): Seq[Column]
    recon.filter(col("row_bucket") === "break")
      .orderBy(order: _*).limit(limit)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(order: _*)).cast("long"))
  }
}
