package graft.acceptance

import graft.SparkSpec
import graft.refbook._

/** CRM guarantee-substitution acceptance: the crm-substitution portfolio
  * (reference `tests/fixtures/reporting_crm_substitution_portfolio.py`)
  * through the full refbook pipeline under BOTH regimes, pinned against the
  * reference's own verified per-sheet figures (the fixture's dated NOTE —
  * a direct `PipelineOrchestrator` + generator run, observed 2026-08-04,
  * identical under CRR and B31).
  *
  * Every substitution cell (C 07.00 cols 0050/0060/0090/0100, C 08.01 cols
  * 0040/0050/0070/0080, C 08.02 col 0080) is exactly 0.0 in all ten golden
  * scenario replays, so this is the ONLY gate on the outflow/inflow
  * machinery: the leg split, the guarantor RW (SA table + IRB parameter
  * substitution), the Art. 193 decline, the cross-template routing and the
  * same-class netting.
  */
class CrmSubstitutionSpec extends SparkSpec {

  private def near(actual: Option[Double], expected: Double, what: String): Unit =
    actual match {
      case Some(v) => assert(math.abs(v - expected) <= math.max(1e-6,
        1e-9 * math.abs(expected)), s"$what: got $v, want $expected")
      case None => fail(s"$what: cell is null, want $expected")
    }

  for (scenario <- ReportingScenarios.crmScenarios) {
    lazy val cube: Vector[RefCube.CRow] = {
      val ledger = RefBook.ledger(scenario.bundle(spark), scenario.cfg, spark)
      RefCube.build(ledger)
    }
    lazy val c07 = RefCorep.c07(scenario.cfg, cube)
    lazy val c0801 = RefCorep.c0801(scenario.cfg, cube)
    lazy val c0802 = RefCorep.c0802(scenario.cfg, cube)
    val tag = scenario.goldenDir

    test(s"$tag: C 08.01 corporate — outflows by protection type, same-class inflow") {
      val f = c0801("corporate")
      near(f.value("0010", "0020"), 38000000.0, "corporate 0020")
      near(f.value("0010", "0040"), -12300000.0, "corporate 0040") // S1+S3+S5 guarantees
      near(f.value("0010", "0050"), -8800000.0, "corporate 0050") // S2+S7 credit derivatives
      near(f.value("0010", "0070"), -21100000.0, "corporate 0070")
      near(f.value("0010", "0080"), 5400000.0, "corporate 0080") // S5 same-class inflow
      near(f.value("0010", "0090"), 22300000.0, "corporate 0090")
    }

    test(s"$tag: C 08.01 institution — shared-destination inflow (S1 + S7)") {
      val f = c0801("institution")
      near(f.value("0010", "0020"), 4000000.0, "institution 0020")
      near(f.value("0010", "0080"), 7500000.0, "institution 0080")
      near(f.value("0010", "0090"), 11500000.0, "institution 0090")
    }

    test(s"$tag: C 08.01 retail_other — inflow-only sheet (S2)") {
      val f = c0801("retail_other")
      near(f.value("0010", "0020"), 0.0, "retail_other 0020")
      near(f.value("0010", "0080"), 3300000.0, "retail_other 0080")
      near(f.value("0010", "0090"), 3300000.0, "retail_other 0090")
    }

    test(s"$tag: C 08.01 specialised_lending — S6 declined, S8 outflow only") {
      val f = c0801("specialised_lending")
      near(f.value("0010", "0020"), 28500000.0, "sl 0020")
      near(f.value("0010", "0050"), -7800000.0, "sl 0050") // S8 only; S6 declined
      near(f.value("0010", "0070"), -7800000.0, "sl 0070")
      near(f.value("0010", "0080"), 0.0, "sl 0080")
      near(f.value("0010", "0090"), 20700000.0, "sl 0090")
    }

    test(s"$tag: C 08.02 corporate Unassigned row carries the graded inflow") {
      val f = c0802("corporate")
      assert(f.rows.exists(_._1 == "Unassigned"),
        s"no Unassigned row: ${f.rows.map(_._1)}")
      near(f.value("Unassigned", "0080"), 5400000.0, "c0802 corporate Unassigned 0080")
      // the boe_b0752_8 tie-out surface: Σ C 08.02 col 0080 = C 08.01 r0070 col 0080
      val total = f.rows.map(_._1).flatMap(r => f.value(r, "0080")).sum
      near(Some(total), 5400000.0, "c0802 corporate Σ0080")
    }

    test(s"$tag: C 07.00 corporate — S4 native outflow + S8 cross-template inflow") {
      val f = c07("corporate")
      near(f.value("0010", "0010"), 8000000.0, "c07 corporate 0010")
      near(f.value("0010", "0060"), -2800000.0, "c07 corporate 0060") // S4 cd
      near(f.value("0010", "0090"), -2800000.0, "c07 corporate 0090")
      near(f.value("0010", "0100"), 7800000.0, "c07 corporate 0100") // S8 inflow
      near(f.value("0010", "0110"), 13000000.0, "c07 corporate 0110")
    }

    test(s"$tag: C 07.00 institution — S4's inflow") {
      val f = c07("institution")
      near(f.value("0010", "0010"), 1500000.0, "c07 institution 0010")
      near(f.value("0010", "0100"), 2800000.0, "c07 institution 0100")
      near(f.value("0010", "0110"), 4300000.0, "c07 institution 0110")
    }

    test(s"$tag: C 07.00 cgcb — S3's cross-template inflow-only sheet; S6 must NOT inflate it") {
      val f = c07("central_govt_central_bank")
      near(f.value("0010", "0100"), 4900000.0, "c07 cgcb 0100") // NOT 9.4m
      near(f.value("0010", "0110"), 4900000.0, "c07 cgcb 0110")
    }

    test(s"$tag: C 07.00 by-band inflow lands at the GUARANTOR's weight") {
      // S3's 4.9m arrives on the cgcb sheet banded 0% (domestic CGCB
      // guarantor); S8's 7.8m on the corporate sheet banded 20% (CQS 1
      // corporate guarantor) — the substituted Art. 235 weights, never the
      // borrowers' own.
      val cgcb = c07("central_govt_central_bank")
      val bandRow0 = cgcb.rows.find(_._2 == "0%").map(_._1)
      assert(bandRow0.isDefined, "cgcb sheet has no 0% band row")
      near(cgcb.value(bandRow0.get, "0100"), 4900000.0, "cgcb 0% band 0100")
      val corp = c07("corporate")
      val bandRow20 = corp.rows.find(_._2 == "20%").map(_._1)
      assert(bandRow20.isDefined, "corporate sheet has no 20% band row")
      near(corp.value(bandRow20.get, "0100"), 7800000.0, "corporate 20% band 0100")
    }

    test(s"$tag: slotting blend — three risk-weight tiers inside one category") {
      // S8: plain 6.5m @ 0.90 + __REM 4.2m @ 0.90 + __G_ 7.8m @ 0.20
      // = 11,190,000; S6 (declined): 10m @ 0.70 undiminished.
      def rwaOf(pred: RefCube.CRow => Boolean) =
        cube.filter(pred).map(_.m("rwa_final")).sum
      val s8 = rwaOf(r => r.s("slotting_category").contains("good"))
      assert(math.abs(s8 - 11190000.0) < 1.0, s"S8 category RWA: $s8")
      val s6 = rwaOf(r => r.s("slotting_category").contains("strong"))
      assert(math.abs(s6 - 7000000.0) < 1.0, s"S6 category RWA: $s6")
    }

    test(s"$tag: S7 parameter substitution reproduces the reference's guarantor RW") {
      // fixture NOTE: guarantor_rw 0.62018 (CRR) / 0.52007 (B31) on the
      // CSUB-LN-S7__G_ leg, driven by PD 0.0015 through the full IRB
      // formula with the institution-class correlation.
      val want = if (scenario.cfg.isB31) 0.52007 else 0.62018
      val leg = cube.filter(r =>
        r.s("post_crm_exposure_class_guaranteed").contains("institution") &&
          r.is("is_guarantee_beneficial") &&
          r.s("reporting_class").contains("institution") &&
          r.s("reporting_class_origin").contains("corporate") &&
          r.s("cp_country_code").contains("GB") && r.n == 1 &&
          math.abs(r.m("ead_final") - 5500000.0) < 1.0)
      assert(leg.nonEmpty, "S7 __G_ leg profile not found")
      val rw = leg.head.d("reporting_rw").getOrElse(Double.NaN)
      assert(math.abs(rw - want) < 5e-5, s"S7 guarantor rw: $rw, want ~$want")
    }
  }
}
