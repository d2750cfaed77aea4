package graft.analysis

import graft.SparkSpec
import graft.contracts.Validation
import graft.reporting.{CellSpec, TemplateGenerator}
import org.apache.spark.sql.functions._

class AnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("enum validation counts violations per column in one pass") {
    val df = Seq(("senior", "GBP"), ("junior", "GBP"), ("mezz", "XXX"))
      .toDF("seniority", "currency")
    val (counts, errors) = Validation.enumViolations(df, "loans", Map(
      "seniority" -> Seq("senior", "junior"),
      "currency" -> Seq("GBP", "USD", "EUR")))
    assert(counts == Map("seniority" -> 1L, "currency" -> 1L))
    assert(errors.map(_.code).distinct == Seq("DQ002"))
    assert(errors.map(_.column).toSet == Set("seniority", "currency"))
  }

  test("reconciliation buckets the five-way taxonomy") {
    val ours = Seq(("a", 100.0), ("b", 100.0), ("c", 100.0), ("d", 100.0))
      .toDF("k", "rwa")
    val theirs = Seq(("a", 100.0), ("b", 100.004), ("c", 150.0), ("e", 7.0))
      .toDF("k", "rwa")
    val recon = Reconciliation.compareMulti(ours, theirs, Seq("k"),
      Seq(Reconciliation.NumericComponent("rwa", absTol = 0.005)))
    val buckets = recon.select("k", "row_bucket").as[(String, String)].collect().toMap
    assert(buckets == Map(
      "a" -> "exact_match", "b" -> "within_tolerance", "c" -> "break",
      "d" -> "missing_right", "e" -> "missing_left"))
    val summary = Reconciliation.summary(recon, "abs_delta_rwa")
      .select("row_bucket", "n").as[(String, Long)].collect().toMap
    assert(summary("break") == 1 && summary("exact_match") == 1)
    val worklist = Reconciliation.breakWorklist(recon, Seq("k"), "abs_delta_rwa")
    assert(worklist.select("k").as[String].collect().toSeq == Seq("c"))
  }

  test("template generation: one pass, long format, lineage drilldown") {
    val ledger = Seq(
      ("retail", "SA", 100.0), ("retail", "IRB", 50.0),
      ("corporate", "SA", 200.0), ("corporate", "IRB", 25.0))
      .toDF("exposure_class", "approach", "rwa")
    val cells = Seq(
      CellSpec("C_07_00_R0010", col("approach") === "SA", col("rwa")),
      CellSpec("C_07_00_R0020",
        col("approach") === "IRB" && col("exposure_class") === "retail", col("rwa")),
      CellSpec("C_07_00_R0030", lit(true), col("rwa")))
    val out = TemplateGenerator.generate(ledger, cells)
      .as[(String, Double)].collect().toMap
    assert(out == Map(
      "C_07_00_R0010" -> 300.0, "C_07_00_R0020" -> 50.0, "C_07_00_R0030" -> 375.0))
    assert(TemplateGenerator.drilldown(ledger, cells(1)).count() == 1)
  }
}
