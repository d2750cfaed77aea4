package graft.acceptance

import graft.SparkSpec
import graft.refbook._

/** Reporting-golden acceptance replay: each scenario portfolio runs
  * [[RefBook.ledger]] → [[RefCube.build]] → the [[RefCorep]] /
  * [[RefPillar3]] renderers, and every resulting frame is compared
  * structure-exact + float-rtol against the reference's frozen goldens
  * (`src/test/resources/reporting_goldens/<scenario>/`, vendored
  * engine-independent NDJSON from `tests/expected_outputs/reporting/`).
  *
  * This is the template-geometry gate the reference backs with ~1,892
  * acceptance tests: a wrong column binding, a mis-keyed sheet, a zero
  * where the published template wants a null — any of these moves a cell
  * and turns a frame red here.
  */
class ReportingGoldenSpec extends SparkSpec {

  /** Build every frame one scenario run produces, keyed exactly as the
    * reference's `_flatten_bundle` keys them (`corep__<template>[__<key>]`,
    * `pillar3__<template>`). */
  private def buildFrames(cfg: RefRunConfig, cube: Vector[RefCube.CRow])
      : Map[String, RefFrame] = {
    val corep =
      RefCorep.c07(cfg, cube).map { case (k, f) => s"corep__c07_00__$k" -> f } ++
        RefCorep.c0801(cfg, cube).map { case (k, f) => s"corep__c08_01__$k" -> f } ++
        RefCorep.c0802(cfg, cube).map { case (k, f) => s"corep__c08_02__$k" -> f } ++
        RefCorep.c0803(cfg, cube).map { case (k, f) => s"corep__c08_03__$k" -> f } ++
        RefCorep.c0804(cfg, cube).map { case (k, f) => s"corep__c08_04__$k" -> f } ++
        RefCorep.c0805(cfg, cube).map { case (k, f) => s"corep__c08_05__$k" -> f } ++
        RefCorep.c0806(cfg, cube).map { case (k, f) => s"corep__c08_06__$k" -> f } ++
        Map("corep__c08_07" -> RefCorep.c0807(cfg, cube)) ++
        RefCorep.c0901(cfg, cube).map { case (k, f) => s"corep__c09_01__$k" -> f } ++
        RefCorep.c0902(cfg, cube).map { case (k, f) => s"corep__c09_02__$k" -> f } ++
        Map("corep__c_02_00" -> RefCorep.c0200(cfg, cube)) ++
        RefCorep.c3401(cfg, cube).map("corep__c34_01" -> _).toMap ++
        RefCorep.c3402(cfg, cube).map { case (k, f) => s"corep__c34_02__$k" -> f } ++
        RefCorep.c3408(cfg, cube).map("corep__c34_08" -> _).toMap ++
        (if (cfg.isB31) Map("corep__of_02_01" -> RefCorep.of0201(cfg, cube))
         else Map.empty)
    val pillar3 = Map(
      "pillar3__ov1" -> RefPillar3.ov1(cfg, cube),
      "pillar3__cr4" -> RefPillar3.cr4(cfg, cube),
      "pillar3__cr5" -> RefPillar3.cr5(cfg, cube),
      "pillar3__cr6a" -> RefPillar3.cr6a(cfg, cube),
      "pillar3__cr7" -> RefPillar3.cr7(cfg, cube),
      "pillar3__cr8" -> RefPillar3.cr8(cfg, cube)) ++
      RefPillar3.cr6(cfg, cube).map { case (k, f) => s"pillar3__cr6__$k" -> f } ++
      RefPillar3.cr7a(cfg, cube).map { case (k, f) => s"pillar3__cr7a__$k" -> f } ++
      RefPillar3.cr9(cfg, cube).map { case (k, f) => s"pillar3__cr9__$k" -> f } ++
      RefPillar3.ccr1(cfg, cube).map("pillar3__ccr1" -> _).toMap ++
      RefPillar3.ccr3(cfg, cube).map("pillar3__ccr3" -> _).toMap ++
      RefPillar3.ccr8(cfg, cube).map("pillar3__ccr8" -> _).toMap ++
      RefPillar3.cr10(cfg, cube).map { case (k, f) => s"pillar3__cr10__$k" -> f } ++
      (if (cfg.isB31) Map(
        "pillar3__cms1" -> RefPillar3.cms1(cfg, cube),
        "pillar3__cms2" -> RefPillar3.cms2(cfg, cube))
       else Map.empty)
    corep ++ pillar3
  }

  for (scenario <- ReportingScenarios.all) {
    lazy val golden = ReportingGoldens.load(scenario.goldenDir)
    lazy val built: Map[String, RefFrame] = {
      val ledger = RefBook.ledger(scenario.bundle(spark), scenario.cfg, spark)
      buildFrames(scenario.cfg, RefCube.build(ledger))
    }

    test(s"${scenario.goldenDir}: every golden frame is produced") {
      val missing = golden.frameOrder.filterNot(built.contains)
      assert(missing.isEmpty, s"frames not built: ${missing.mkString(", ")}")
    }

    for (frameName <- ReportingGoldens.load(scenario.goldenDir).frameOrder) {
      test(s"${scenario.goldenDir}: $frameName matches the golden") {
        val issues = ReportingGoldens.diff(frameName,
          golden.frames(frameName), built(frameName))
        assert(issues.isEmpty, issues.take(25).mkString("\n"))
      }
    }
  }
}
