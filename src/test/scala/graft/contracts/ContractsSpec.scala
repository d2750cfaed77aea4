package graft.contracts

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ContractsSpec extends SparkSpec {
  import spark.implicits._

  private val edge = EdgeContract("exposures", Seq(
    "ref" -> ColumnSpec(StringType, required = true),
    "amount" -> ColumnSpec(DoubleType),
    "is_defaulted" -> ColumnSpec(BooleanType, default = Some(false)),
    "value_date" -> ColumnSpec(DateType)))

  test("conform casts, reorders, drops undeclared, adds missing as nulls") {
    val df = Seq(("x1", "100.5", "junk_col")).toDF("ref", "amount", "junk")
    val out = edge.conform(df)
    assert(out.columns.toSeq == Seq("ref", "amount", "is_defaulted", "value_date"))
    val r = out.first()
    assert(r.getString(0) == "x1")
    assert(r.getDouble(1) == 100.5)
    assert(r.getBoolean(2) == false) // boolean default applied
    assert(r.isNullAt(3))            // missing optional -> typed null
  }

  test("invalid cast becomes null, not an error (try_cast discipline)") {
    val df = Seq(("x1", "not_a_number")).toDF("ref", "amount")
    val r = edge.conform(df).first()
    assert(r.isNullAt(1))
  }

  test("boolean-only defaults: float/string nulls propagate") {
    val df = Seq(("x1", null: String, null: String))
      .toDF("ref", "amount", "is_defaulted")
    val r = edge.conform(df).first()
    assert(r.isNullAt(1), "float null must propagate, never filled")
    assert(r.getBoolean(2) == false, "boolean null gets its declared default")
  }

  test("seal reports missing required columns as DQ001 values") {
    val df = Seq(Tuple1(1.0)).toDF("amount")
    val (out, errs) = edge.seal(df)
    assert(errs.map(_.code) == Seq("DQ001"))
    assert(errs.head.column == "ref")
    assert(out.columns.toSeq == edge.schema.fieldNames.toSeq)
  }

  test("scrubNonFinite nulls NaN and infinities in double columns only") {
    val df = Seq(
      (1.0, "keep"), (Double.NaN, "keep"),
      (Double.PositiveInfinity, "keep"), (Double.NegativeInfinity, "keep"))
      .toDF("x", "s")
    val out = EdgeContract.scrubNonFinite(df).collect()
    assert(out.count(_.isNullAt(0)) == 3)
    assert(out.forall(_.getString(1) == "keep"))
  }
}
