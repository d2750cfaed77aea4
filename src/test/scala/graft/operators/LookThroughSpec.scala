package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Art. 191A(2)(e)(i) funded-only look-through
  * (`engine/crm/look_through.py` semantics). */
class LookThroughSpec extends SparkSpec {
  import spark.implicits._

  private def books = {
    val g = Seq(
      ("G-1", "exposure", "ORD-1", "funded_only"),
      ("G-2", "exposure", "ORD-2", "both"),
      ("G-3", "exposure", "ORD-3", "none"),
      ("G-4", "exposure", "ORD-4", null.asInstanceOf[String]))
      .toDF("guarantee_reference", "beneficiary_type",
        "beneficiary_reference", "look_through_election")
    val c = Seq(
      ("C-1", "guarantee", "G-1", 100.0), // behind the electing guarantee
      ("C-2", "guarantee", "G-2", 50.0),  // behind a 'both' guarantee
      ("C-3", "exposure", "ORD-9", 75.0)) // direct
      .toDF("collateral_reference", "beneficiary_type",
        "beneficiary_reference", "market_value")
    (g, c)
  }

  test("re-anchors electing-guarantee collateral onto the obligor and " +
    "suppresses the guarantee; other rows untouched") {
    val (g, c) = books
    val (g2, c2, w) = LookThrough.applyFundedOnly(g, c)
    // suppression: only the funded_only guarantee leaves the book
    assert(g2.select("guarantee_reference").as[String].collect().sorted
      .toSeq === Seq("G-2", "G-3", "G-4"))
    val moved = c2.filter(col("collateral_reference") === "C-1").head
    assert(moved.getAs[String]("beneficiary_type") === "exposure")
    assert(moved.getAs[String]("beneficiary_reference") === "ORD-1")
    assert(moved.getAs[Boolean]("re_anchored"))
    // a 'both' guarantee's collateral stays put
    val kept = c2.filter(col("collateral_reference") === "C-2").head
    assert(kept.getAs[String]("beneficiary_type") === "guarantee")
    assert(!kept.getAs[Boolean]("re_anchored"))
    // warnings: applied + not-implemented, one each
    val codes = w.select("code").as[String].collect().sorted.toSeq
    assert(codes === Seq("CRM_LOOK_THROUGH_APPLIED",
      "CRM_LOOK_THROUGH_NOT_IMPLEMENTED"))
  }

  test("presence-tolerant: no election carrier -> both books unchanged") {
    val g = Seq(("G-1", "exposure", "ORD-1"))
      .toDF("guarantee_reference", "beneficiary_type", "beneficiary_reference")
    val c = Seq(("C-1", "guarantee", "G-1", 1.0))
      .toDF("collateral_reference", "beneficiary_type",
        "beneficiary_reference", "market_value")
    val (g2, c2, w) = LookThrough.applyFundedOnly(g, c)
    assert(g2.count() === 1L && c2.count() === 1L && w.isEmpty)
    assert(!c2.columns.contains("re_anchored"))
  }
}
