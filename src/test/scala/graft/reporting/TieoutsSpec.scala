package graft.reporting

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property spec for the cross-artifact tie-out layer (reference
  * `tests/unit/reporting/test_tieouts.py`): on RANDOM ledger-shaped
  * books — not just the harness fixtures — every comparable tie must
  * hold (the three reshapes aggregate the same sealed frame), the
  * non-comparable pairs must be present as records (so nobody "closes
  * the gap" with a naive equality), and a deliberately drifted artifact
  * must produce a 'fail' row rather than pass silently.
  */
case class TieLed(exposure_reference: String, exposure_class: String,
  approach: String, ead_pre_crm: Double, coll_covered: Double,
  guar_covered: Double, unsecured: Double, rwa: Double)

class TieoutsSpec extends SparkSpec {
  import spark.implicits._

  private val classes = Seq("corporate", "retail", "institution", "sme_corporate")
  private type Led = TieLed
  private val Led = TieLed

  /** Random conservation-true ledger: unsecured is the cent-rounded
    * remainder, so coll + guar + unsecured == ead within 1 cent/row. */
  private def bookGen(n: Int): Gen[Seq[Led]] = Gen.sequence[Seq[Led], Led](
    (1 to n).map { i =>
      for {
        cls <- Gen.oneOf(classes)
        app <- Gen.oneOf("SA", "IRB")
        ead <- Gen.choose(0.0, 5e6)
        covShare <- Gen.choose(0.0, 1.0)
        collShare <- Gen.choose(0.0, 1.0)
        rw <- Gen.oneOf(0.2, 0.5, 0.75, 1.0, 1.5)
      } yield {
        val q = (x: Double) => math.floor(x * 100 + 0.5) / 100
        val eadQ = q(ead)
        val cov = q(eadQ * covShare)
        val coll = q(cov * collShare)
        val guar = q(cov - coll)
        val unsec = q(eadQ - coll - guar)
        Led(s"E$i", cls, app, eadQ, coll, guar, unsec, q(eadQ * rw))
      }
    })

  private def summarise(led: org.apache.spark.sql.DataFrame) = {
    import graft.queries.Q._
    led.groupBy(col("exposure_class"), col("approach")).agg(
      dsum(col("ead_pre_crm"), 2).as("total_ead"),
      dsum(col("coll_covered"), 2).as("collateral_covered"),
      dsum(col("guar_covered"), 2).as("guarantee_covered"),
      dsum(col("unsecured"), 2).as("unsecured_ead"),
      dsum(col("rwa"), 2).as("total_rwa"))
  }

  test("every comparable tie passes on random conservation-true books") {
    for (seed <- Seq(11L, 23L, 37L)) {
      val book = bookGen(200).apply(Gen.Parameters.default, Seed(seed)).get
      val led = book.toDF()
      val ties = Tieouts.fromLedger(led, summarise(led)).collect()
      val comparable = ties.filter(_.getAs[Boolean]("comparable"))
      assert(comparable.nonEmpty)
      val failed = comparable.filter(_.getAs[String]("status") != "pass")
      assert(failed.isEmpty,
        s"seed $seed broke ties: ${failed.map(_.getAs[String]("tie_id")).mkString(",")}")
    }
  }

  test("non-comparable pairs are recorded with their regulatory reason") {
    val book = bookGen(50).apply(Gen.Parameters.default, Seed(5L)).get
    val led = book.toDF()
    val nc = Tieouts.fromLedger(led, summarise(led))
      .filter(!col("comparable")).collect()
    assert(nc.map(_.getAs[String]("tie_id")).toSet ===
      Tieouts.nonComparable.map(_._1).toSet)
    assert(nc.forall(r => r.getAs[String]("basis_note") != null &&
      r.getAs[String]("status") == null))
  }

  test("a drifted summary aggregation is caught as a 'fail' row, not silence") {
    val book = bookGen(100).apply(Gen.Parameters.default, Seed(7L)).get
    val led = book.toDF()
    // Drift: the summary silently drops one class — the regression class
    // of bug this layer exists to catch (reference tieouts.py:24-28).
    val drifted = summarise(led.filter(col("exposure_class") =!= "retail"))
    val ties = Tieouts.fromLedger(led, drifted).collect()
    val failing = ties.filter(r => r.getAs[Boolean]("comparable") &&
      r.getAs[String]("status") == "fail")
    assert(failing.map(_.getAs[String]("tie_id"))
      .contains("rwea_total_summary_vs_ov1"))
  }
}
