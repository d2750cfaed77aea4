package graft.acceptance

import graft.SparkSpec
import graft.engine.{IrbKernel, Slotting}
import org.apache.spark.sql.functions._

/** Golden-scenario acceptance replay (SURVEY §5 layer 2): the reference
  * publishes ENGINE-INDEPENDENT expected outputs
  * (`tests/expected_outputs/{crr,basel31}`) — scenario inputs with the
  * regulator-derivable risk weight / supporting factor / RWEA. Replaying
  * them through the repo's kernels is the one correctness layer the
  * DuckDB oracle cannot substitute for: the oracle SQL shares the repo's
  * own constants, so a constant-level drift (a wrong correlation bound,
  * a mis-keyed slotting cell, a stale threshold) passes the hash gate
  * and only this replay catches it.
  *
  * Tolerances: IRB risk weights at relative 1e-6 (the repo's norm_ppf is
  * the Acklam polynomial — OracleDerivationsSpec pins the same bound);
  * slotting and supporting factors are closed-form — 1e-9.
  */
class AcceptanceSpec extends SparkSpec {
  import spark.implicits._

  private def relErr(got: Double, exp: Double): Double =
    math.abs(got - exp) / math.max(1e-12, math.abs(exp))

  test("CRR-B + B31-B: IRB formula replays the published risk weights and RWEA") {
    val scens = AcceptanceFixtures.scenarios.filter(_.group.endsWith("-B"))
    assert(scens.size === 14)
    val in = scens.map { s =>
      (s.id, s.framework, s.approach.get, s.exposureClass, s.ead,
        s.pd.get, s.lgd.get, s.maturity.get, s.seniority.get,
        s.smeSizeMetricM, s.rwExpected, s.rwaExpected)
    }.toDF("id", "framework", "approach", "exposure_class", "ead",
      "pd_value", "lgd", "maturity", "seniority", "sme_size_metric_m",
      "rw_expected", "rwa_expected")
      .withColumn("is_fse", lit(false))
      .withColumn("beel", lit(null).cast("double"))
      .withColumn("is_defaulted", lit(false))
      .withColumn("is_qrre_transactor", lit(false))
      .withColumn("is_uk_property", lit(false))
    val out = IrbKernel.calculate(in)
      .select("id", "risk_weight", "rwa", "rw_expected", "rwa_expected")
      .collect()
    assert(out.length === 14)
    // The published B31 expected file computed its SME firm-size clamp on
    // EUR-converted turnover with the EUR 5/50 bounds (B31-B4's implied
    // reduction is 0.0088156 = the EUR clamp, not the PS1/26 GBP-native
    // 4.4/44 the engine applies — reference `engine/irb/formulas.py:746`);
    // the reference's own acceptance gate is 1% relative
    // (`tests/acceptance/acceptance_helpers.py:61`), which absorbs exactly
    // this. Mirror it for the two B31 SME scenarios, strict elsewhere.
    val relaxed = Set("B31-B4", "B31-B5")
    for (r <- out) {
      val id = r.getString(0)
      val tol = if (relaxed(id)) 1e-2 else 1e-6
      assert(relErr(r.getDouble(1), r.getDouble(3)) < tol,
        s"$id risk_weight ${r.getDouble(1)} != ${r.getDouble(3)}")
      assert(relErr(r.getDouble(2), r.getDouble(4)) < tol,
        s"$id rwa ${r.getDouble(2)} != ${r.getDouble(4)}")
    }
  }

  test("CRR-E: Art. 153(5) Table 1 slotting replays every published cell") {
    val scens = AcceptanceFixtures.scenarios.filter(_.group == "CRR-E")
    assert(scens.size === 9)
    val in = scens.map { s =>
      (s.id, s.slotCategory.get,
        if (s.slotMaturityLt25.get) 1.0 else 3.0, s.ead,
        s.rwExpected, s.rwaExpected)
    }.toDF("id", "category", "residual_maturity", "ead",
      "rw_expected", "rwa_expected")
    val out = in.select(col("id"),
      Slotting.riskWeight(col("category"), col("residual_maturity")).as("rw"),
      col("ead"), col("rw_expected"), col("rwa_expected")).collect()
    for (r <- out) {
      assert(r.getDouble(1) === r.getDouble(3),
        s"${r.getString(0)} slot RW ${r.getDouble(1)} != ${r.getDouble(3)}")
      assert(relErr(r.getDouble(1) * r.getDouble(2), r.getDouble(4)) < 1e-9,
        s"${r.getString(0)} rwa")
    }
  }

  test("CRR-F: tiered SME / infrastructure supporting factors replay exactly") {
    val scens = AcceptanceFixtures.scenarios.filter(_.group == "CRR-F")
    assert(scens.size === 8)
    // The reference applies the EUR 2.5m Art. 501 threshold converted to
    // the GBP book at 0.8732 → 2,183,000 (formulas.py:685).
    val gbpThreshold = 2500000.0 * 0.8732
    val in = scens.map { s =>
      (s.id, s.exposureClass, s.infrastructure,
        s.groupEstar.getOrElse(s.ead), s.ead,
        s.rwExpected, s.sfExpected, s.rwaExpected)
    }.toDF("id", "exposure_class", "infrastructure", "estar", "ead",
      "rw_expected", "sf_expected", "rwa_expected")
    val sf = when(col("infrastructure"), 0.75)
      .when(col("exposure_class").isin("corporate_sme", "retail_sme"),
        IrbKernel.smeSupportingFactor(col("estar"), gbpThreshold))
      .otherwise(1.0)
    val out = in.select(col("id"), sf.as("sf"), col("ead"),
      col("rw_expected"), col("sf_expected"), col("rwa_expected")).collect()
    for (r <- out) {
      val id = r.getString(0)
      assert(relErr(r.getDouble(1), r.getDouble(4)) < 1e-9,
        s"$id sf ${r.getDouble(1)} != ${r.getDouble(4)}")
      assert(relErr(r.getDouble(2) * r.getDouble(3) * r.getDouble(1),
        r.getDouble(5)) < 1e-9, s"$id rwa")
    }
  }
}
