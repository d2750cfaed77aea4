package graft.refbook

import graft.SparkSpec
import graft.acceptance.ReportingScenarios

/** 100 TB plan discipline for the refbook pipeline: the sealed ledger is
  * ONE Catalyst plan whose dimension joins (counterparties, ratings,
  * facility attributes, collateral, model grants) all broadcast — the
  * exposures side is the only at-scale frame, so a sort-merge join here
  * would put a full shuffle of the book behind every template run — and
  * the reporting cube is ONE bounded aggregation over it (the template
  * estate assembles driver-side from its collected profiles).
  */
class RefBookPlanSpec extends SparkSpec {

  test("the rich-scenario ledger broadcasts every dimension join") {
    val scenario = ReportingScenarios.all.find(_.goldenDir == "crr").get
    val ledger = RefBook.ledger(scenario.bundle(spark), scenario.cfg, spark)
    val plan = ledger.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "dimension joins must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      s"no exposure-grain shuffle join is acceptable in the ledger plan:\n" +
        plan.linesIterator.filter(_.contains("SortMergeJoin")).mkString("\n"))
  }

  test("the guaranteed-book ledger broadcasts the guarantor joins too") {
    // the CRM substitution path adds four joins (guarantor counterparty /
    // CQS / PD dims and the pseudo-exposure SA-weight frame) — every one
    // is bounded by the counterparty dim, so every one must broadcast;
    // a sort-merge here would shuffle the whole book per guarantee
    val scenario = ReportingScenarios.crmScenarios.head
    val ledger = RefBook.ledger(scenario.bundle(spark), scenario.cfg, spark)
    val plan = ledger.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "guarantor dimension joins must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      s"no exposure-grain shuffle join is acceptable in the guaranteed ledger plan:\n" +
        plan.linesIterator.filter(_.contains("SortMergeJoin")).mkString("\n"))
  }

  test("the obligor index pass is bounded: broadcast pid join, two hash aggregations") {
    // RefCube.buildObligorIndex: the collected profile→pid map broadcasts
    // back onto the ledger (null-safe on every key), then obligor →
    // signature and signature → count are both hash aggregations; only
    // (signature, count) rows reach the driver
    val scenario = ReportingScenarios.all.find(_.goldenDir == "irb_classes_crr").get
    val ledger = RefBook.ledger(scenario.bundle(spark), scenario.cfg, spark)
    val cube = RefCube.build(ledger)
    assert(cube.nonEmpty && cube.head.oindex.count(cube.indices.toSet) > 0,
      "the obligor index must resolve a non-zero whole-book count")
  }

  test("the reporting cube is one hash aggregation over the ledger") {
    val scenario = ReportingScenarios.all.find(_.goldenDir == "sa_classes_crr").get
    val ledger = RefBook.ledger(scenario.bundle(spark), scenario.cfg, spark)
    val sealedKeys = RefCube.keyCols.filter(ledger.columns.contains)
    val agg = ledger.groupBy(sealedKeys.map(org.apache.spark.sql.functions.col): _*)
      .count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), "the cube must hash-aggregate")
  }
}
