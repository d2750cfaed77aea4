package graft.reporting

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regulatory template generation (reference `reporting/cellspec.py`,
  * `reporting/corep/generator.py`, `reporting/pillar3`): a template is a
  * list of cells, each defined by a row predicate over the sealed ledger
  * plus a measure — the declarative reshape from the per-exposure frame to
  * fixed template rows.
  *
  * Evaluated in ONE aggregation pass: every cell becomes
  * `sum(when(predicate, measure))`, so a 200-cell COREP sheet is a single
  * scan + single-row aggregate regardless of ledger size — the shape that
  * holds at 100 TB. Lineage (reference `reporting/lineage.py`: cell
  * drill-down re-runs the predicate) falls out of `drilldown`.
  */
final case class CellSpec(cellId: String, predicate: Column, measure: Column)

object TemplateGenerator {

  /** All cells in one pass → long-format (cell_id, value) frame. */
  def generate(ledger: DataFrame, cells: Seq[CellSpec]): DataFrame = {
    require(cells.nonEmpty)
    val aggs = cells.map(c =>
      sum(when(c.predicate, c.measure).otherwise(lit(0.0))).as(c.cellId))
    val row = ledger.agg(aggs.head, aggs.tail: _*)
    // unpivot to (cell_id, value) via stack
    val stackArgs = cells.map(c => s"'${c.cellId}', `${c.cellId}`").mkString(", ")
    row.select(expr(s"stack(${cells.size}, $stackArgs) AS (cell_id, value)"))
  }

  /** Cell drill-down: the ledger rows behind one cell (lineage). */
  def drilldown(ledger: DataFrame, cell: CellSpec): DataFrame =
    ledger.filter(cell.predicate)
}
