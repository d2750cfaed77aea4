package graft.queries

import graft.SparkSpec
import graft.engine.DomainPipeline
import org.apache.spark.sql.functions._

/** The Pillar-3/COREP IRB disclosure tail: the structural identities the
  * sheets must satisfy beyond the oracle hash (parent-band additivity,
  * the CR8 flow identity, CR7 substitution monotonicity, the C 08.01
  * validation estate), plus the ledger-memo concurrency contract the
  * REST server depends on.
  */
class Pillar3Spec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("CR6: parent PD bands equal the sum of their sub-bands (EAD and RWEA)") {
    val rows = Pillar3.q120Pillar3Cr6.build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        (Option(r.get(9)).map(_.asInstanceOf[Double]).getOrElse(0.0),
          Option(r.get(13)).map(_.asInstanceOf[Double]).getOrElse(0.0)))
      .toMap
    // reference templates.py:493-496 — refs 1/7/10/13 are parents of the
    // sub-bands that follow them
    val parents = Map(1 -> Seq(2, 3), 7 -> Seq(8, 9), 10 -> Seq(11, 12),
      13 -> Seq(14, 15, 16))
    for {
      fw <- Seq("CRR", "BASEL_3_1")
      cls <- Seq("corporate", "institution")
      (p, subs) <- parents
    } {
      val (pe, pr) = rows((fw, cls, p))
      val se = subs.map(sb => rows((fw, cls, sb))._1).sum
      val sr = subs.map(sb => rows((fw, cls, sb))._2).sum
      assert(math.abs(pe - se) < 0.02, s"$fw/$cls band $p EAD $pe != $se")
      assert(math.abs(pr - sr) < 0.02, s"$fw/$cls band $p RWEA $pr != $sr")
    }
    // the Total row (18) pools every leaf band exactly once: leaves are
    // the scale minus the parent refs and the total itself
    val leaves = (2 to 17).toSeq.diff(Seq(7, 10, 13))
    val (te, _) = rows(("CRR", "corporate", 18))
    val le = leaves.flatMap(b => rows.get(("CRR", "corporate", b)).map(_._1)).sum
    assert(math.abs(te - le) < 0.05, s"total $te != leaf sum $le")
  }

  test("CR8: the flow identity opening + drivers = closing holds to the cent") {
    val rows = Pillar3.q122Cr8Flow.build(spark, sfDir).collect()
      .map(r => r.getString(1) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    val opening = rows("opening_rwea").get
    val closing = rows("closing_rwea").get
    val drivers = Seq("asset_quality", "methodology", "other")
      .map(d => rows(d).get).sum
    assert(rows("model_updates").isEmpty, "model_updates must stay null")
    assert(math.abs(opening + drivers - closing) < 0.01,
      s"flow identity broken: $opening + $drivers != $closing")
  }

  test("CR7: substitution only ever reduces RWEA (pre >= actual, effect >= 0)") {
    val rows = Pillar3.q123Cr7CrmEffects.build(spark, sfDir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val pre = r.getDouble(3); val actual = r.getDouble(4)
      val effect = r.getDouble(5)
      assert(pre >= actual - 0.01,
        s"${r.getString(0)}/${r.getString(1)}: pre $pre < actual $actual")
      assert(effect >= -0.01, s"negative effect $effect")
    }
  }

  test("C 08.01: every published-style validation passes on the sealed ledger") {
    val v = Corep08.q121CorepC08.build(spark, sfDir)
      .filter(col("section") === "validation").collect()
    assert(v.length == 11)
    assert(v.forall(_.getString(6) == "pass"),
      v.filter(_.getString(6) != "pass").mkString("; "))
  }

  test("q94 catalogue rules carry id + severity and all pass") {
    val v = Domain.q94CorepTemplate.build(spark, sfDir)
      .filter(col("section") === "validation").collect()
    assert(v.length == 82)
    val sev = v.map(_.getString(2)).toSet
    assert(sev == Set("ERROR", "WARNING"))
    assert(v.forall(_.getString(7) == "pass"),
      v.filter(_.getString(7) != "pass").map(_.getString(1)).mkString(", "))
  }

  test("ledger memo: concurrent same-key consumers share ONE build") {
    import java.util.concurrent.{CountDownLatch, Executors}
    DomainPipeline.releaseLedger(spark, sfDir)
    val pool = Executors.newFixedThreadPool(4)
    val gate = new CountDownLatch(1)
    try {
      val futs = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[AnyRef] {
          def call(): AnyRef = { gate.await(); DomainPipeline.ledger(spark, sfDir) }
        })
      }
      gate.countDown()
      val frames = futs.map(_.get())
      assert(frames.forall(_ eq frames.head),
        "concurrent ledger() calls must return the identical memoised frame")
    } finally pool.shutdown()
  }
}
