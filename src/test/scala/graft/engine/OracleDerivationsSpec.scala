package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's independently hand-derived oracle values (reference
  * `tests/oracle/ORACLE_DERIVATIONS.md` + `derivations/` — stdlib-only
  * shadow calculator, expected values translated from
  * `tests/oracle/expected_values.json`, phase O2: IRB), pinned against
  * this engine's `IrbKernel` at the reference's tolerances (relative
  * 1e-6, absolute minor 0.01). This is the only layer that can catch a
  * WRONG CONSTANT: conservation, monotonicity and plan-shape tests all
  * pass with a 45% weight where the regulation says 50%.
  *
  * `assertRw`/`assertRwa` mirror the reference's per-field `unasserted`
  * markers (ORC-097 asserts the weight but not the RWEA; ORC-141 is a
  * floor-scope-only record).
  */
case class OracleRecord(
    id: String, framework: String, approach: String, exposure_class: String,
    ead: Double, pd_value: Double, lgd: Option[Double],
    maturity: Option[Double], seniority: Option[String], is_fse: Boolean,
    sme_size_metric_m: Option[Double], beel: Option[Double],
    is_defaulted: Boolean, is_qrre_transactor: Boolean,
    is_uk_property: Boolean,
    expRw: Double, expRwa: Double, assertRw: Boolean, assertRwa: Boolean)

class OracleDerivationsSpec extends SparkSpec {
  import spark.implicits._

  // (exposure_id, framework, approach, class, ead, pd, lgd, maturity,
  //  seniority, fse, sme_size_m, beel, defaulted, qrre_transactor, uk,
  //  expected_rw, expected_rwa, assertRw, assertRwa)
  private def R = OracleRecord
  private val records = Seq(
    R("ORC-003", "CRR", "FIRB", "corporate", 10000000.0, 0.01,
      None, Some(2.5), None, false, None, None, false, false, true,
      0.9785580947557455, 9785580.947557455, true, true),
    R("ORC-081", "CRR", "FIRB", "corporate", 10000000.0, 0.01,
      None, Some(2.5), Some("subordinated"), false, None, None, false, false, true,
      1.6309301579262427, 16309301.579262428, true, true),
    R("ORC-082", "CRR", "AIRB", "corporate", 10000000.0, 0.01,
      Some(0.3), Some(5.0), None, false, None, None, false, false, true,
      0.8766023403469071, 8766023.40346907, true, true),
    R("ORC-083", "CRR", "AIRB", "corporate", 10000000.0, 0.01,
      Some(0.3), Some(1.0), None, false, None, None, false, false, true,
      0.5178338968646511, 5178338.9686465105, true, true),
    R("ORC-084", "CRR", "FIRB", "corporate", 10000000.0, 0.0001,
      None, Some(2.5), None, false, None, None, false, false, true,
      0.15310181328635927, 1531018.1328635928, true, true),
    R("ORC-085", "CRR", "FIRB", "institution", 10000000.0, 0.002,
      None, Some(2.5), None, false, None, None, false, false, true,
      0.46528152858070576, 4652815.285807057, true, true),
    R("ORC-086", "CRR", "FIRB", "corporate", 10000000.0, 0.01,
      None, Some(2.5), None, true, None, None, false, false, true,
      1.2502635340913217, 12502635.340913218, true, true),
    R("ORC-087", "CRR", "FIRB", "corporate_sme", 1000000.0, 0.01,
      None, Some(2.5), None, false, Some(3.0), None, false, false, true,
      0.7673841096725174, 584669.9531594911, true, true),
    R("ORC-088", "CRR", "AIRB", "retail_other", 10000000.0, 0.02,
      Some(0.4), None, None, false, None, None, false, false, true,
      0.5463611515913098, 5463611.515913098, true, true),
    R("ORC-089", "CRR", "AIRB", "retail_mortgage", 10000000.0, 0.01,
      Some(0.2), None, None, false, None, None, false, false, true,
      0.2657016048700774, 2657016.0487007736, true, true),
    R("ORC-090", "CRR", "AIRB", "retail_qrre", 10000000.0, 0.03,
      Some(0.6), None, None, false, None, None, false, false, true,
      0.5464532898894123, 5464532.898894124, true, true),
    R("ORC-091", "BASEL_3_1", "FIRB", "corporate", 10000000.0, 0.01,
      None, Some(2.5), None, false, None, None, false, false, true,
      0.8205937901515686, 8205937.901515686, true, true),
    R("ORC-092", "BASEL_3_1", "FIRB", "corporate", 10000000.0, 0.01,
      None, Some(2.5), None, true, None, None, false, false, true,
      1.1794939000861526, 11794939.000861526, true, true),
    R("ORC-093", "BASEL_3_1", "FIRB", "corporate", 10000000.0, 0.01,
      None, Some(2.5), Some("subordinated"), false, None, None, false, false, true,
      1.5386133565341913, 15386133.565341912, true, true),
    R("ORC-094", "BASEL_3_1", "FIRB", "corporate", 10000000.0, 0.0001,
      None, Some(2.5), None, false, None, None, false, false, true,
      0.17467703440361587, 1746770.3440361586, true, true),
    R("ORC-095", "BASEL_3_1", "AIRB", "corporate", 10000000.0, 0.01,
      Some(0.1), Some(2.5), None, false, None, None, false, false, true,
      0.5128711188447304, 5128711.188447303, true, true),
    R("ORC-096", "BASEL_3_1", "AIRB", "corporate", 10000000.0, 0.01,
      Some(0.3), Some(5.0), None, false, None, None, false, false, true,
      0.8269833399499124, 8269833.399499124, true, true),
    R("ORC-097", "BASEL_3_1", "FIRB", "corporate_sme", 10000000.0, 0.01,
      None, Some(2.5), None, false, Some(22.0), None, false, false, true,
      0.7209125549377918, 7209125.549377918, true, false),
    R("ORC-098", "BASEL_3_1", "AIRB", "retail_other", 10000000.0, 0.02,
      Some(0.4), None, None, false, None, None, false, false, true,
      0.515435048671047, 5154350.486710469, true, true),
    R("ORC-099", "BASEL_3_1", "AIRB", "retail_other", 10000000.0, 0.02,
      Some(0.12), None, None, false, None, None, false, false, true,
      0.3865762865032852, 3865762.8650328517, true, true),
    R("ORC-100", "BASEL_3_1", "AIRB", "retail_mortgage", 10000000.0, 0.01,
      Some(0.02), None, None, false, None, None, false, false, true,
      0.06266547284671636, 1000000.0, true, true),
    R("ORC-101", "BASEL_3_1", "AIRB", "retail_qrre", 10000000.0, 0.0002,
      Some(0.35), None, None, false, None, None, false, false, true,
      0.030095034135413028, 300950.3413541303, true, true),
    R("ORC-102", "BASEL_3_1", "AIRB", "retail_other", 10000000.0, 0.0002,
      Some(0.4), None, None, false, None, None, false, false, true,
      0.058925504556873454, 589255.0455687345, true, true),
    R("ORC-103", "CRR", "AIRB", "retail_other", 10000000.0, 1.0,
      Some(0.45), None, None, false, None, Some(0.3), true, false, true,
      1.8750000000000002, 18750000.000000004, true, true),
    R("ORC-104", "BASEL_3_1", "FIRB", "corporate", 10000000.0, 1.0,
      None, None, None, false, None, None, true, false, true,
      0.0, 0.0, true, true),
    R("ORC-140", "BASEL_3_1", "AIRB", "retail_mortgage", 10000000.0, 1.0,
      Some(0.05), None, None, false, None, Some(0.05), true, false, true,
      0.0, 0.0, true, true),
    R("ORC-141", "BASEL_3_1", "AIRB", "commercial_mortgage", 10000000.0, 0.0005,
      Some(0.05), None, None, false, None, None, false, false, true,
      0.0, 0.0, false, false),
    R("ORC-142", "BASEL_3_1", "AIRB", "retail_mortgage", 10000000.0, 0.01,
      Some(0.02), None, None, false, None, None, false, false, false,
      0.06266547284671636, 626654.7284671636, true, true))

  private val relTol = 1e-6
  private val absMinor = 0.01

  private def close(actual: Double, expected: Double): Boolean =
    if (expected == 0.0) math.abs(actual) <= 1e-9
    else math.abs(actual - expected) <=
      math.max(relTol * math.abs(expected), absMinor)

  test("IRB kernel matches all 28 reference oracle derivations (rel err 1e-6)") {
    val input = records.map(r => (r.id, r.framework, r.approach,
      r.exposure_class, r.ead, r.pd_value, r.lgd, r.maturity, r.seniority,
      r.is_fse, r.sme_size_metric_m, r.beel, r.is_defaulted,
      r.is_qrre_transactor, r.is_uk_property))
      .toDF("id", "framework", "approach", "exposure_class", "ead",
        "pd_value", "lgd", "maturity", "seniority", "is_fse",
        "sme_size_metric_m", "beel", "is_defaulted", "is_qrre_transactor",
        "is_uk_property")
    val out = IrbKernel.calculate(input)
      .select(col("id"), col("risk_weight"), col("rwa"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val failures = records.flatMap { r =>
      val (rw, rwa) = out(r.id)
      val rwBad = r.assertRw && !close(rw, r.expRw)
      val rwaBad = r.assertRwa && !close(rwa, r.expRwa)
      if (rwBad || rwaBad)
        Some(s"${r.id}: rw $rw (exp ${r.expRw}), rwa $rwa (exp ${r.expRwa})")
      else None
    }
    assert(failures.isEmpty, s"oracle mismatches:\n${failures.mkString("\n")}")
  }

  test("q51's inline corporate kernel agrees with IrbKernel on its grid") {
    // cross-check the two implementations on a PD×M grid (CRR corporate)
    val grid = for {
      pd <- Seq(0.001, 0.005, 0.01, 0.05, 0.1)
      m <- Seq(1.0, 2.5, 5.0)
    } yield ("g", "CRR", "AIRB", "corporate", 1000.0, pd, Some(0.45),
      Some(m), Option.empty[String], false, Option.empty[Double],
      Option.empty[Double], false, false, true)
    val out = IrbKernel.calculate(grid.toDF("id", "framework", "approach",
      "exposure_class", "ead", "pd_value", "lgd", "maturity", "seniority",
      "is_fse", "sme_size_metric_m", "beel", "is_defaulted",
      "is_qrre_transactor", "is_uk_property"))
      .select("pd_applied", "maturity", "risk_weight").collect()
    out.foreach { r =>
      val (pd, m, rw) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      // q51 shape: K·12.5·1.06, K = lgd·(N(g)−pd)·MA
      val b = math.pow(0.11852 - 0.05478 * math.log(pd), 2)
      val a = (1 - math.exp(-50 * pd)) / (1 - math.exp(-50))
      val corr = 0.12 * a + 0.24 * (1 - a)
      val g = (graft.functions.NormalMath.normPpf(pd) +
        math.sqrt(corr) * graft.functions.NormalMath.normPpf(0.999)) /
        math.sqrt(1 - corr)
      val k = 0.45 * (graft.functions.NormalMath.normCdf(g) - pd) *
        (1 + (m - 2.5) * b) / (1 - 1.5 * b)
      val expected = k * 12.5 * 1.06
      assert(math.abs(rw - expected) <= 1e-9 * math.max(1.0, expected),
        s"kernel/q51 divergence at pd=$pd m=$m: $rw vs $expected")
    }
  }
}
