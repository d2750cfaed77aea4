package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `aggregate_to_key_grain` (reference `engine/aggregator/_collapse.py`):
  * money sums, ratio recomputation, deterministic representatives, and
  * the heterogeneity flag. */
class CollapseSpec extends SparkSpec {
  import spark.implicits._

  test("collapses sub-rows: sums money, recomputes the ratio from the " +
    "summed legs, flags heterogeneous categoricals") {
    val legs = Seq(
      ("L1__G_1", Some("L1"), 30.0, 6.0, "SA", "EUR"),
      ("L1__REM", Some("L1"), 70.0, 70.0, "IRB", "EUR"),
      ("L2", None, 50.0, 25.0, "SA", "GBP"))
      .toDF("exposure_reference", "parent_exposure_reference",
        "ead", "rwa", "approach", "currency")
    val out = Collapse.aggregateToKeyGrain(legs,
      coalesce(col("parent_exposure_reference"), col("exposure_reference")),
      moneyCols = Seq("ead", "rwa"),
      ratioCols = Seq(("risk_weight", "rwa", "ead")),
      representativeCols = Seq("currency"),
      categoricalCols = Seq("approach"))
      .collect().map(r => r.getAs[String]("collapse_key") -> r).toMap
    val l1 = out("L1")
    assert(l1.getAs[Double]("ead") === 100.0)
    assert(l1.getAs[Double]("rwa") === 76.0)
    // ratio from the SUMMED legs (76/100), never an average of 0.2 and 1.0
    assert(l1.getAs[Double]("risk_weight") === 0.76)
    assert(l1.getAs[Boolean]("heterogeneous"))
    assert(l1.getAs[Long]("n_legs") === 2L)
    val l2 = out("L2")
    assert(!l2.getAs[Boolean]("heterogeneous"))
    assert(l2.getAs[String]("currency") === "GBP")
    assert(l2.getAs[Double]("risk_weight") === 0.5)
  }

  test("a null among string categoricals still flags heterogeneity, and " +
    "an all-null categorical collapses to null without flagging") {
    // {SA, null} must flag (null is a distinct value per the reference's
    // n_unique) — pins the r19 collect_set rewrite's null handling
    val legs = Seq(
      ("L1__G_1", Some("L1"), 30.0, 6.0, Some("SA")),
      ("L1__REM", Some("L1"), 70.0, 70.0, None),
      ("L2", None, 50.0, 25.0, None))
      .toDF("exposure_reference", "parent_exposure_reference",
        "ead", "rwa", "approach")
    val out = Collapse.aggregateToKeyGrain(legs,
      coalesce(col("parent_exposure_reference"), col("exposure_reference")),
      moneyCols = Seq("ead", "rwa"),
      categoricalCols = Seq("approach"))
      .collect().map(r => r.getAs[String]("collapse_key") -> r).toMap
    assert(out("L1").getAs[Boolean]("heterogeneous"))
    assert(out("L1").getAs[String]("approach") === "SA")
    assert(!out("L2").getAs[Boolean]("heterogeneous"))
    assert(out("L2").isNullAt(out("L2").fieldIndex("approach")))
  }

  test("a zero denominator yields a null ratio, not a division error") {
    val legs = Seq(("L1", None.asInstanceOf[Option[String]], 0.0, 0.0, "SA"))
      .toDF("exposure_reference", "parent_exposure_reference",
        "ead", "rwa", "approach")
    val out = Collapse.aggregateToKeyGrain(legs,
      coalesce(col("parent_exposure_reference"), col("exposure_reference")),
      moneyCols = Seq("ead", "rwa"),
      ratioCols = Seq(("risk_weight", "rwa", "ead")))
      .collect().head
    assert(out.isNullAt(out.fieldIndex("risk_weight")))
  }
}
