package graft.contracts

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Value-constraint validation (reference `contracts/validation.py` +
  * the VALID_* enum sets in `data/schemas.py`): per-column membership
  * checks reported as COUNTS on the error channel, never exceptions —
  * one aggregation pass over the frame for all columns together.
  */
object Validation {

  /** One pass: for each (column → allowed values), count rows whose
    * non-null value falls outside the set. Returns (counts, errors) where
    * errors carries one DQ002 CalcError per violating column.
    */
  def enumViolations(
      df: DataFrame, table: String,
      constraints: Map[String, Seq[String]]): (Map[String, Long], Seq[CalcError]) = {
    if (constraints.isEmpty) return (Map.empty, Nil)
    val aggs = constraints.toSeq.map { case (c, allowed) =>
      count(when(col(c).isNotNull && !col(c).isin(allowed: _*), lit(1))).as(c)
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).first()
    val counts = constraints.keys.map(c => c -> row.getAs[Long](c)).toMap
    val errors = counts.collect {
      case (c, n) if n > 0 =>
        CalcError("DQ002", s"$n rows with values outside the allowed set",
          table = table, column = c)
    }.toSeq
    (counts, errors)
  }

  /** Distributed variant: the same single aggregation pass surfaced as a
    * long-format (column_name, n_violations) frame — stays lazy, so it
    * composes into a plan instead of forcing a driver action (the shape
    * that holds when the validated frame is 100 TB).
    */
  def enumViolationsDf(
      df: DataFrame, constraints: Seq[(String, Seq[String])]): DataFrame = {
    require(constraints.nonEmpty)
    val aggs = constraints.map { case (c, allowed) =>
      count(when(col(c).isNotNull && !col(c).isin(allowed: _*), lit(1)))
        .as(s"_viol_$c")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = constraints
      .map { case (c, _) => s"'$c', `_viol_$c`" }.mkString(", ")
    row.selectExpr(
      s"stack(${constraints.size}, $stackArgs) AS (column_name, n_violations)")
  }
}
