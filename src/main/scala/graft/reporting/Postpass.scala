package graft.reporting

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COREP post-execute passes shared by the published sheet builders
  * (reference `reporting/corep/postpass.py` — the folded per-template
  * copies of the C 07.00 / C 08.01/02 / C 09.01/02 final transforms).
  * They run on the REPORTED frame, after the aggregation that produced
  * it, so every downstream consumer (drill-down, validation gate,
  * export) honours them.
  *
  * Spark-first shape: each pass is a pure Column rewrite over the
  * already-tiny grid frame (a few hundred rows after the sheet
  * aggregation) — no shuffle, no collect. The reference's driver-side
  * `subset_rows` re-scans are replaced by carrying the row's matched
  * count (`countCol`) and fallback sums IN-BAND through the same
  * aggregation that computed the cells, so the passes stay O(grid).
  */
object Postpass {

  /** Annex II §1.3: emit the "(-)"-labelled deduction columns as
    * negatives (reference `postpass.py:118-127` negate_deduction_cols).
    * Runs AFTER the template's waterfalls have consumed the positive
    * magnitudes. Columns absent from the frame are no-ops, so the
    * framework-specific members cost nothing in the regime that lacks
    * them. A zero deduction is normalised to +0.0 (plain negation flips
    * the IEEE sign bit and a -0.0 cell would serialise differently);
    * null stays null (the `otherwise` branch negates null to null).
    */
  def negateDeductionCols(frame: DataFrame, negativeCols: Set[String]): DataFrame = {
    val targets = frame.columns.filter(negativeCols)
    targets.foldLeft(frame) { (df, c) =>
      df.withColumn(c, when(col(c) === 0.0, lit(0.0)).otherwise(-col(c)))
    }
  }

  /** Render inert rows and rows with EMPTY subsets all-null (reference
    * `postpass.py:55-116` null_empty_rows): the COREP zero policy
    * applies only to POPULATED rows' unbound cells — zero is a computed
    * claim, null is "nothing here". A row is nulled when it is inert
    * (its ref never binds a population — `inertRefs`) or its matched
    * count is zero; `keep` exempts rows whose content is a cross-sheet
    * inflow (their own subset is legitimately empty). The Total row
    * passes a non-null count by construction and is never nulled.
    *
    * `countCol` is the in-band matched count: null OR zero both mean
    * an empty subset (a left-joined axis row that matched nothing
    * carries a null count).
    */
  def nullEmptyRows(
      frame: DataFrame,
      countCol: String,
      valueCols: Seq[String],
      inertRefs: Set[String],
      keep: Set[String] = Set.empty): DataFrame = {
    val isNullRow =
      (col("row_ref").isin(inertRefs.toSeq: _*) ||
        coalesce(col(countCol), lit(0L)) === 0L) &&
        !col("row_ref").isin(keep.toSeq: _*)
    valueCols.filter(frame.columns.contains).foldLeft(frame) { (df, c) =>
      df.withColumn(c, when(isNullRow, lit(null).cast(df.schema(c).dataType))
        .otherwise(col(c)))
    }
  }

  /** The provisions ladder (reference `postpass.py:247-306`
    * provisions_postfix): when the preferred SCRA/GCRA base cell nets to
    * ~0 on a populated row, swap the whole cell to the best available
    * provisions carrier — a value-dependent PER-CELL branch. Both sums
    * arrive in-band (`ref` the base, `fallbackCol` the carrier sum from
    * the same aggregation); a null base (inert/empty row) stays null.
    */
  def provisionsPostfix(frame: DataFrame, ref: String, fallbackCol: String): DataFrame =
    if (!frame.columns.contains(ref) || !frame.columns.contains(fallbackCol)) frame
    else frame.withColumn(ref,
      when(col(ref).isNotNull && abs(col(ref)) < 1e-9, col(fallbackCol))
        .otherwise(col(ref)))

  /** Fill an after-all-CRM style derived column (reference
    * `postpass.py:205-244` c08_after_all_crm): `target` = `base` plus
    * the `addCols` minus the `subCols`, computed on the POSITIVE
    * magnitudes (this runs before [[negateDeductionCols]]). A null base
    * keeps the target null for [[nullEmptyRows]]; absent optional
    * columns contribute nothing.
    */
  def afterAllCrm(
      frame: DataFrame,
      target: String,
      base: String,
      addCols: Seq[String] = Nil,
      subCols: Seq[String] = Nil): DataFrame = {
    if (!frame.columns.contains(target) || !frame.columns.contains(base)) frame
    else {
      val add = addCols.filter(frame.columns.contains)
        .map(c => coalesce(col(c), lit(0.0))).foldLeft(coalesce(col(base), lit(0.0)))(_ + _)
      val tot = subCols.filter(frame.columns.contains)
        .map(c => coalesce(col(c), lit(0.0))).foldLeft(add)(_ - _)
      frame.withColumn(target,
        when(col(base).isNull, lit(null).cast("double")).otherwise(tot))
    }
  }
}
