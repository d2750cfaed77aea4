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
