package graft.reporting

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Regulatory template generation (reference `reporting/cellspec.py`,
  * `reporting/corep/generator.py`, `reporting/pillar3`): a template is a
  * list of cells, each defined by a row predicate over the sealed ledger
  * plus a measure — the declarative reshape from the per-exposure frame to
  * fixed template rows.
  *
  * Evaluated in ONE aggregation pass: every cell becomes
  * `sum(when(predicate, measure))`, so a 200-cell COREP sheet is a single
  * scan + single-row aggregate regardless of ledger size — the shape that
  * holds at 100 TB. Money cells accumulate in DECIMAL(38, scale) so the
  * template value is independent of partition/addition order (the [[
  * graft.queries.Q.dsum]] discipline). Lineage (reference
  * `reporting/lineage.py`: cell drill-down re-runs the predicate) falls
  * out of `drilldown`.
  */
final case class CellSpec(
    cellId: String, predicate: Column, measure: Column, scale: Int = 2)

object TemplateGenerator {

  /** All cells in one aggregation → ONE wide row (cellId columns). */
  def wideRow(ledger: DataFrame, cells: Seq[CellSpec]): DataFrame = {
    require(cells.nonEmpty)
    val aggs = cells.map(c =>
      sum(when(c.predicate, c.measure).otherwise(lit(0.0))
        .cast(DecimalType(38, c.scale))).cast("double").as(c.cellId))
    ledger.agg(aggs.head, aggs.tail: _*)
  }

  /** Unpivot a [[wideRow]] to the long (cell_id, value) template. */
  def stackCells(row: DataFrame, cells: Seq[CellSpec]): DataFrame = {
    val stackArgs = cells.map(c => s"'${c.cellId}', `${c.cellId}`").mkString(", ")
    row.select(expr(s"stack(${cells.size}, $stackArgs) AS (cell_id, value)"))
  }

  /** All cells in one pass → long-format (cell_id, value) frame. */
  def generate(ledger: DataFrame, cells: Seq[CellSpec]): DataFrame =
    stackCells(wideRow(ledger, cells), cells)

  /** Cell drill-down: the ledger rows behind one cell (lineage). */
  def drilldown(ledger: DataFrame, cell: CellSpec): DataFrame =
    ledger.filter(cell.predicate)
}

/** A published-style cross-cell validation rule: sum(LHS cells) must
  * equal sum(RHS cells) within tolerance (reference
  * `reporting/validations/rules.py` — additivity / subtotal identities
  * like v0305_m, evaluated over the generated estate by
  * `validations/evaluate.py`). */
final case class TemplateRule(
    ruleId: String, lhs: Seq[String], rhs: Seq[String],
    tolerance: Double = 0.01)

object TemplateValidator {

  /** Evaluate every rule against a long-format (cell_id, value) template.
    * One conditional-aggregation pass per template (not per rule): each
    * rule's LHS/RHS totals are decimal-exact sums over its cell ids.
    * Output: (rule_id, lhs_total, rhs_total, diff, status).
    */
  def evaluate(template: DataFrame, rules: Seq[TemplateRule]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = rules.flatMap { r =>
      Seq(
        sum(when(col("cell_id").isin(r.lhs: _*), col("value")).otherwise(0.0)
          .cast(DecimalType(38, 2))).cast("double").as(s"${r.ruleId}__lhs"),
        sum(when(col("cell_id").isin(r.rhs: _*), col("value")).otherwise(0.0)
          .cast(DecimalType(38, 2))).cast("double").as(s"${r.ruleId}__rhs"))
    }
    val row = template.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map(r =>
      s"'${r.ruleId}', `${r.ruleId}__lhs`, `${r.ruleId}__rhs`").mkString(", ")
    val long = row.select(expr(
      s"stack(${rules.size}, $stackArgs) AS (rule_id, lhs_total, rhs_total)"))
    val tolChain = rules.foldLeft(Option.empty[Column]) {
      case (None, r) => Some(when(col("rule_id") === r.ruleId, r.tolerance))
      case (Some(acc), r) => Some(acc.when(col("rule_id") === r.ruleId, r.tolerance))
    }.get.otherwise(0.01)
    long
      .withColumn("diff", col("lhs_total") - col("rhs_total"))
      .withColumn("status",
        when(abs(col("diff")) <= tolChain, "pass").otherwise("fail"))
  }

  /** One-pass variant: evaluate the rules HORIZONTALLY on the wide 1-row
    * cell frame (`ledger.agg(cell1, …, cellN)`) instead of re-aggregating
    * the stacked template — the sheet and every validation then share a
    * single scan of the ledger (one aggregation total, not two). Value
    * semantics match [[evaluate]] exactly: each addend round-trips
    * through DECIMAL(38,2) so the horizontal sum is the same exact
    * decimal sum the vertical pass computes.
    */
  def evaluateWide(row: DataFrame, rules: Seq[TemplateRule]): DataFrame = {
    require(rules.nonEmpty)
    def dsumH(cellIds: Seq[String]): Column =
      cellIds.map(id => col(s"`$id`").cast(DecimalType(38, 2)))
        .reduce(_ + _).cast("double")
    val ruleCols = rules.flatMap { r =>
      Seq(dsumH(r.lhs).as(s"${r.ruleId}__lhs"),
          dsumH(r.rhs).as(s"${r.ruleId}__rhs"))
    }
    val wide = row.select(ruleCols: _*)
    val stackArgs = rules.map(r =>
      s"'${r.ruleId}', `${r.ruleId}__lhs`, `${r.ruleId}__rhs`").mkString(", ")
    val long = wide.select(expr(
      s"stack(${rules.size}, $stackArgs) AS (rule_id, lhs_total, rhs_total)"))
    val tolChain = rules.foldLeft(Option.empty[Column]) {
      case (None, r) => Some(when(col("rule_id") === r.ruleId, r.tolerance))
      case (Some(acc), r) => Some(acc.when(col("rule_id") === r.ruleId, r.tolerance))
    }.get.otherwise(0.01)
    long
      .withColumn("diff", col("lhs_total") - col("rhs_total"))
      .withColumn("status",
        when(abs(col("diff")) <= tolChain, "pass").otherwise("fail"))
  }
}
