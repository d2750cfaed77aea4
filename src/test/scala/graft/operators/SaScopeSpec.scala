package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Pillar-3 SA scope (reference `reporting/pillar3/sa_scope.py`):
  * exclusion of the non-credit-risk synthetic legs, the local
  * off-balance-sheet patch for the commitment leg, and the reference's
  * recorded presence-tolerance / null-is-never-excluded contracts.
  */
class SaScopeSpec extends SparkSpec {
  import spark.implicits._

  private def pop = Seq(
    ("E1", "loan", Some(true)),
    ("E2", "facility_undrawn", None),
    ("E3", "ccr_netting_set", None),
    ("E4", "ccr_default_fund", None),
    ("E5", "ccr_failed_trade", None),
    ("E6", null.asInstanceOf[String], None))
    .toDF("ref", "exposure_type", "reporting_on_balance_sheet")

  test("drops exactly the three non-credit-risk exposure types") {
    val out = SaScope.saCreditRiskPopulation(pop)
    assert(out.select("ref").as[String].collect().sorted.toSeq ===
      Seq("E1", "E2", "E6"))
  }

  test("a null exposure_type is never excluded (sa_scope.py:82-84)") {
    val out = SaScope.saCreditRiskPopulation(pop)
    assert(out.filter(col("exposure_type").isNull).count() === 1L)
  }

  test("patches the facility_undrawn commitment leg off-balance-sheet, " +
    "leaves the loan side untouched") {
    val out = SaScope.saCreditRiskPopulation(pop)
      .select("ref", "reporting_on_balance_sheet")
      .as[(String, Option[Boolean])].collect().toMap
    assert(out("E1") === Some(true))
    assert(out("E2") === Some(false))
    assert(out("E6") === None)
  }

  test("presence-tolerant: no exposure_type carrier -> frame unchanged") {
    val frame = Seq(("A", 1.0), ("B", 2.0)).toDF("ref", "ead")
    val out = SaScope.saCreditRiskPopulation(frame)
    assert(out.count() === 2L)
    assert(out.columns.toSeq === frame.columns.toSeq)
  }

  test("presence-tolerant: no balance-sheet carrier -> filter only") {
    val frame = Seq(("A", "loan"), ("B", "ccr_netting_set"))
      .toDF("ref", "exposure_type")
    val out = SaScope.saCreditRiskPopulation(frame)
    assert(out.select("ref").as[String].collect().toSeq === Seq("A"))
    assert(!out.columns.contains("reporting_on_balance_sheet"))
  }

  test("q157 sheet internally reconciles: every scoped row lands on " +
    "exactly one side, so total gross == on+off coverage") {
    val q = graft.queries.Pillar3.q157SaScope
      .build(spark, "/root/testdata/sf0.001")
    val rows = q.collect().map(r => r.getString(0) -> r).toMap
    val total = rows("total")
    // class rows re-sum to the total row (single-population discipline)
    val classRows = rows.filterKeys(k => k != "total" && !k.startsWith("memo"))
    def s(i: Int) = classRows.values.map(r => BigDecimal(r.getDouble(i))).sum
    assert(s(6) === BigDecimal(total.getDouble(6))) // rwea
    assert(s(4) === BigDecimal(total.getDouble(4))) // ead_on_bs
    assert(s(5) === BigDecimal(total.getDouble(5))) // ead_off_bs
    // the exclusion is non-vacuous: each memo family matched real rows
    Seq("ccr_netting_set", "ccr_default_fund", "ccr_failed_trade").foreach {
      t => assert(rows(s"memo_excluded:$t").getLong(1) > 0L)
    }
  }
}
