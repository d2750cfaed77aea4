package graft.analysis

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Comparison module semantics (reference `analysis/comparison.py`):
  * coalesced full-outer keys, presence flags, zero-guarded pct, scaffold
  * completeness, share-of-delta, materiality worklist. */
class ComparisonSpec extends SparkSpec {

  private def frames = {
    val s = spark; import s.implicits._
    val base = Seq(("corporate", 100.0), ("retail", 50.0), ("gone", 10.0))
      .toDF("cls", "rwa")
    val cand = Seq(("corporate", 130.0), ("retail", 50.0), ("new", 5.0))
      .toDF("cls", "rwa")
    (base, cand)
  }

  test("compareRuns: presence flags, deltas, zero-guarded pct") {
    val (base, cand) = frames
    val r = Comparison.compareRuns(base, cand, Seq("cls"), Seq("rwa"))
      .collect().map(x => x.getAs[String]("cls") -> x).toMap
    assert(r("corporate").getAs[Double]("delta_rwa") == 30.0)
    assert(r("corporate").getAs[Double]("pct_rwa") == 0.3)
    assert(r("retail").getAs[Double]("delta_rwa") == 0.0)
    // only-in-base: candidate contributes 0, pct defined off base
    assert(r("gone").getAs[Boolean]("in_base") && !r("gone").getAs[Boolean]("in_cand"))
    assert(r("gone").getAs[Double]("delta_rwa") == -10.0)
    // only-in-candidate: base 0 → pct suppressed (zero guard)
    assert(!r("new").getAs[Boolean]("in_base") && r("new").getAs[Boolean]("in_cand"))
    assert(r("new").isNullAt(r("new").fieldIndex("pct_rwa")))
  }

  test("scaffoldSummary: complete grid, zero fill, share of total delta") {
    val s = spark; import s.implicits._
    val (base, cand) = frames
    val recon = Comparison.compareRuns(base, cand, Seq("cls"), Seq("rwa"))
    val grid = Seq("corporate", "retail", "gone", "new", "empty_cell").toDF("cls")
    val out = Comparison.scaffoldSummary(recon, grid, Seq("cls"), Seq("rwa"))
      .collect().map(x => x.getAs[String]("cls") -> x).toMap
    assert(out.size == 5)
    val empty = out("empty_cell")
    assert(empty.getAs[Double]("rwa_base") == 0.0 &&
      empty.getAs[Double]("delta_rwa") == 0.0 &&
      !empty.getAs[Boolean]("in_base"))
    // total delta = 30 - 10 + 5 = 25; corporate share = 30/25 = 1.2
    assert(out("corporate").getAs[Double]("total_delta_rwa") == 25.0)
    assert(out("corporate").getAs[Double]("share_of_delta_rwa") == 1.2)
    assert(empty.getAs[Double]("share_of_delta_rwa") == 0.0)
  }

  test("impactWorklist ranks by |delta| with deterministic tiebreak") {
    val (base, cand) = frames
    val recon = Comparison.compareRuns(base, cand, Seq("cls"), Seq("rwa"))
    val wl = Comparison.impactWorklist(recon, Seq("cls"), "rwa", limit = 2)
      .orderBy(col("rank")).collect()
    assert(wl.length == 2)
    assert(wl(0).getAs[String]("cls") == "corporate") // |30|
    assert(wl(1).getAs[String]("cls") == "gone")      // |-10|
  }

  test("attributor registry: registered pairing decomposes completely, unknown pairing degrades to neutral") {
    val led = graft.engine.DomainPipeline.ledger(spark, "/root/testdata/sf0.001")
    // the registered CRR->B31 waterfall: drivers re-sum to the delta
    // (residual is pure per-row cent-rounding, zero on this book)
    val rows = Attribution.attributorFor(("crr", "b31"))(led).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val residual = r.getDouble(r.fieldIndex("driver_residual"))
      assert(math.abs(residual) <= 0.01 * led.count(),
        s"incomplete decomposition: residual $residual")
    }
    // any unregistered pairing falls back to the neutral delta-only form
    val neutral = Attribution.attributorFor(("crr", "amended"))(led)
    assert(neutral.columns.toSeq == Seq("exposure_class", "delta_rwa"))
    // and the neutral total ties to the waterfall total
    val totW = rows.map(_.getDouble(1)).sum
    val totN = neutral.collect().map(_.getDouble(1)).sum
    assert(math.abs(totW - totN) < 0.01, s"$totW != $totN")
  }
}
