package graft.contracts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed error channel — data-quality findings accumulate as values beside
  * the data, never as exceptions (reference `contracts/errors.py`;
  * channel wiring `engine/orchestrator.py:149-162`).
  */
final case class CalcError(
    code: String,
    message: String,
    table: String = "",
    column: String = "")

/** Declared column: Spark dtype + optional default + required flag
  * (reference `data/column_spec.py:33-48`).
  *
  * The default is only ever APPLIED to Boolean columns — float/string nulls
  * deliberately propagate, because a silent 0.0 EAD understates RWA
  * (reference `data/column_spec.py:79-115`, `contracts/edges.py:24-30`;
  * contract test `tests/contracts/test_boolean_defaults_only.py`). The
  * same invariant is enforced here at conform time.
  */
final case class ColumnSpec(
    dtype: DataType,
    default: Option[Any] = None,
    required: Boolean = false)

/** Per-stage-exit declared schema with conform/seal semantics (reference
  * `contracts/edges.py:114-266`):
  *   - conform: cast declared dtypes (invalid→null via try_cast), add
  *     missing optional columns as typed nulls, apply Boolean-only
  *     defaults, DROP undeclared columns, emit columns in declared order.
  *   - seal: conform + verify required columns are present (a missing
  *     required column yields a typed-null column plus a DQ001 error —
  *     the loader's lenient-seal behaviour, `engine/loader.py:108-157`).
  */
final case class EdgeContract(
    name: String,
    columns: Seq[(String, ColumnSpec)]) {

  private def declared: Map[String, ColumnSpec] = columns.toMap

  /** Booleans get their declared default; everything else keeps nulls. */
  private def withDefault(c: Column, spec: ColumnSpec): Column =
    (spec.dtype, spec.default) match {
      case (BooleanType, Some(d: Boolean)) => coalesce(c, lit(d))
      case _                               => c
    }

  def conform(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val cols = columns.map { case (name, spec) =>
      val base =
        if (present.contains(name)) col(name).try_cast(spec.dtype)
        else lit(null).cast(spec.dtype)
      withDefault(base, spec).as(name)
    }
    df.select(cols: _*)
  }

  /** Conform + report missing required columns on the error channel. */
  def seal(df: DataFrame): (DataFrame, Seq[CalcError]) = {
    val edgeName = name
    val present = df.columns.toSet
    val errors = columns.collect {
      case (colName, spec) if spec.required && !present.contains(colName) =>
        CalcError("DQ001", s"required column missing at edge '$edgeName'",
          table = edgeName, column = colName)
    }
    (conform(df), errors)
  }

  def schema: StructType =
    StructType(columns.map { case (n, s) => StructField(n, s.dtype) })
}

object EdgeContract {
  /** Null out NaN/±Inf in every float column before any consumer — DQ011
    * (reference `contracts/validation.py` scrub_non_finite_values, called
    * from `engine/pipeline.py:255-269`). Stays inside codegen: one `when`
    * per double column, no UDFs.
    */
  def scrubNonFinite(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map {
      case StructField(n, DoubleType, _, _) =>
        val c = col(n)
        when(isnan(c) || c === Double.PositiveInfinity ||
             c === Double.NegativeInfinity, lit(null)).otherwise(c).as(n)
      case f => col(f.name)
    }
    df.select(cols.toSeq: _*)
  }
}
