package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkAllocationSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(rows: Seq[(String, String, Integer, Double, Double, Double, java.lang.Double)]) =
    rows.toDF("collateral_reference", "beneficiary_reference", "priority",
      "metric", "item_value", "demand", "max_pledge")

  private def slices(df: org.apache.spark.sql.DataFrame): Map[(String, String), Double] =
    LinkAllocation.allocateSlices(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

  test("two-sided residual: demand filled by one item spills the next item onward") {
    val s = slices(edgesDf(Seq(
      ("I1", "B1", null, 2.0, 100.0, 120.0, null),
      ("I1", "B2", null, 1.0, 100.0, 50.0, null),
      ("I2", "B1", null, 2.0, 100.0, 120.0, null),
      ("I2", "B3", null, 0.5, 100.0, 80.0, null))))
    // B1 (highest metric) drains I1 fully, then takes only its residual 20
    // from I2 — I2's remaining 80 spills to B3 instead of piling onto B1
    assert(s(("I1", "B1")) == 100.0)
    assert(s(("I2", "B1")) == 20.0)
    assert(s(("I1", "B2")) == 0.0)
    assert(s(("I2", "B3")) == 80.0)
  }

  test("explicit priority fills before any metric-ordered edge; caps bind") {
    val s = slices(edgesDf(Seq(
      ("I1", "B1", null, 2.0, 100.0, 120.0, null),
      ("I1", "B2", Int.box(1), 1.0, 100.0, 50.0, null),
      ("I2", "B1", null, 2.0, 100.0, 120.0, null),
      ("I2", "B3", null, 0.5, 100.0, 80.0, Double.box(10.0)))))
    assert(s(("I1", "B2")) == 50.0, "priority edge fills first")
    assert(s(("I1", "B1")) == 50.0)
    assert(s(("I2", "B1")) == 70.0)
    assert(s(("I2", "B3")) == 10.0, "per-link cap binds")
  }

  test("conservation: no item over-allocates, no beneficiary over-fills") {
    val df = edgesDf(for {
      i <- 0 until 20; b <- 0 until 5
    } yield (s"I$i", s"B${(i + b) % 12}", null: Integer,
      (b % 3) * 1.0, 500.0, 300.0, null: java.lang.Double))
    val out = LinkAllocation.allocateSlices(df)
    val perItem = out.groupBy("collateral_reference").agg(sum("slice").as("s"))
      .filter(col("s") > 500.0 + 1e-6).count()
    val perBen = out.groupBy("beneficiary_reference").agg(sum("slice").as("s"))
      .filter(col("s") > 300.0 + 1e-6).count()
    assert(perItem == 0 && perBen == 0)
  }
}
