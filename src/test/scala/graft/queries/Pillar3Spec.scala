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

  test("C 08.03: parent masterscale rows equal the sum of their leaves " +
      "(EBA v09753-v09756)") {
    // The q144 explode aggregates parent rows INDEPENDENTLY of their
    // leaves (one groupBy over leaf+parent memberships), so this tie-out
    // is a genuine cross-cell rule, not true by construction.
    val rows = Corep08.q144CorepC0803.build(spark, sfDir).collect()
      .map { r =>
        def dbl(i: Int) = Option(r.get(i)).map(_.asInstanceOf[Double]).getOrElse(0.0)
        r.getInt(0) -> (r.getBoolean(2), r.getLong(3), r.getLong(4),
          dbl(5), dbl(6), dbl(8), dbl(12), dbl(14))
      }.toMap
    val parents = Map(1 -> Seq(2, 3), 7 -> Seq(8, 9), 10 -> Seq(11, 12),
      13 -> Seq(14, 15, 16))
    for ((p, subs) <- parents; if rows.contains(p)) {
      val (isParent, pn, pob, pon, poff, pead, prwea, pel) = rows(p)
      assert(isParent, s"row $p should be flagged is_parent")
      val present = subs.filter(rows.contains)
      assert(present.nonEmpty, s"populated parent $p has no populated child")
      def sumOf(f: ((Boolean, Long, Long, Double, Double, Double, Double,
        Double)) => Double) = present.map(sb => f(rows(sb))).sum
      assert(pn == present.map(sb => rows(sb)._2).sum,
        s"parent $p n_exposures not additive")
      // distinct obligors can only dedup across children, never grow
      assert(pob <= present.map(sb => rows(sb)._3).sum,
        s"parent $p n_obligors exceeds child sum")
      for ((label, pv, sv) <- Seq(
          ("gross_on_bs", pon, sumOf(_._4)),
          ("gross_off_bs", poff, sumOf(_._5)),
          ("ead", pead, sumOf(_._6)),
          ("rwea", prwea, sumOf(_._7)),
          ("expected_loss", pel, sumOf(_._8))))
        assert(math.abs(pv - sv) < 0.02, s"parent $p $label $pv != $sv")
    }
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
    assert(v.length == 29)
    // the BoE slice carries its published ids + severities
    assert(v.exists(r => r.getString(1).startsWith("boe_b0380@")))
    assert(v.filter(_.getString(1).startsWith("boe_")).forall(
      _.getString(2) == "ERROR"))
    assert(v.forall(_.getString(7) == "pass"),
      v.filter(_.getString(7) != "pass").mkString("; "))
  }

  test("q94 catalogue rules carry id + severity and all pass") {
    val v = Domain.q94CorepTemplate.build(spark, sfDir)
      .filter(col("section") === "validation").collect()
    assert(v.length == 94)
    val sev = v.map(_.getString(2)).toSet
    assert(sev == Set("ERROR", "WARNING"))
    assert(v.forall(_.getString(7) == "pass"),
      v.filter(_.getString(7) != "pass").map(_.getString(1)).mkString(", "))
  }

  test("CR10: maturity totals pool their category rows; fixed weights match Table 1") {
    val rows = Pillar3.q131Cr10Slotting.build(spark, sfDir).collect()
    assert(rows.length == 12)
    def v(r: org.apache.spark.sql.Row, i: Int): Double =
      Option(r.get(i)).map(_.asInstanceOf[Double]).getOrElse(0.0)
    for (band <- Seq("lt_2_5", "ge_2_5")) {
      val cats = rows.filter(r =>
        r.getString(2) == band && r.getString(1) != "TOTAL")
      val tot = rows.find(r =>
        r.getString(2) == band && r.getString(1) == "TOTAL").get
      for ((col, label) <- Seq(7 -> "exposure_value", 8 -> "rwea", 9 -> "el")) {
        val sum = cats.map(v(_, col)).sum
        assert(math.abs(v(tot, col) - sum) < 0.05, s"$band $label: $sum")
      }
    }
    // the fixed col-c weight is the Art. 153(5) Table 1 value ×100
    val expect = graft.engine.Slotting.table1.flatMap {
      case (cat, s, l) => Seq((cat, "lt_2_5") -> s * 100, (cat, "ge_2_5") -> l * 100)
    }.toMap
    rows.filter(_.getString(1) != "TOTAL").foreach { r =>
      assert(math.abs(r.getDouble(3) -
        expect((r.getString(1), r.getString(2)))) < 0.5)
    }
  }

  test("C 08.06: published grid geometry, leg totals, CR10 cell-for-cell tie") {
    val rows = Corep08.q172CorepC0806.build(spark, sfDir).collect()
    def v(r: org.apache.spark.sql.Row, i: Int): Double =
      Option(r.get(i)).map(_.asInstanceOf[Double]).getOrElse(0.0)
    // the full published 12-row CRR grid renders (5 categories × 2
    // maturity legs + the two leg totals 0110/0120)
    assert(rows.map(_.getString(0)).toSeq ==
      (1 to 12).map(i => f"${i * 10}%04d"))
    // v09782/v09783: each maturity-leg total row pools its category rows
    val byRef = rows.map(r => r.getString(0) -> r).toMap
    for ((tot, cats) <- Seq(
        "0110" -> Seq("0010", "0030", "0050", "0070", "0090"),
        "0120" -> Seq("0020", "0040", "0060", "0080", "0100"));
        c <- Seq(4, 7, 11)) { // orig_exposure, exposure_value, rwea
      val sum = cats.map(ref => v(byRef(ref), c)).sum
      assert(math.abs(v(byRef(tot), c) - sum) < 0.05,
        s"$tot col $c: ${v(byRef(tot), c)} != $sum")
    }
    // row risk weights are the Art. 153(5) Table 1 values; totals null
    val expect = graft.engine.Slotting.table1.flatMap {
      case (cat, s, l) => Seq((cat, true) -> s, (cat, false) -> l)
    }.toMap
    rows.filter(_.getString(1) != "total").foreach { r =>
      assert(r.getDouble(10) == expect((r.getString(1), r.getBoolean(2))))
    }
    assert(byRef("0110").isNullAt(10) && byRef("0120").isNullAt(10))
    // cross-template: C 08.06 and CR10 are two renderings of ONE
    // slotting result set — exposure value and RWEA tie cell-for-cell
    val cr10 = Pillar3.q131Cr10Slotting.build(spark, sfDir).collect()
      .filter(_.getString(1) != "TOTAL")
      .map(r => (r.getString(1), r.getString(2) == "lt_2_5") ->
        (v(r, 7), v(r, 8))).toMap
    rows.filter(_.getString(1) != "total").foreach { r =>
      val (ev, rwea) = cr10((r.getString(1), r.getBoolean(2)))
      assert(v(r, 7) == ev, s"${r.getString(0)} EV ${v(r, 7)} != CR10 $ev")
      assert(v(r, 11) == rwea, s"${r.getString(0)} RWEA ${v(r, 11)} != CR10 $rwea")
    }
  }

  test("CMS1/CMS2: column partition identity and cross-sheet total tie-out") {
    val cms1 = Pillar3.q132Cms1.build(spark, sfDir).collect()
      .map(r => r.getString(1) -> r).toMap
    def d(r: org.apache.spark.sql.Row, i: Int): Double =
      Option(r.get(i)).map(_.asInstanceOf[Double]).getOrElse(0.0)
    // c = a + b on every bound row
    for (rt <- Seq("credit_risk", "ccr", "total")) {
      val r = cms1(rt)
      assert(math.abs(d(r, 4) - (d(r, 2) + d(r, 3))) < 0.01, s"$rt c != a+b")
    }
    // out-of-scope rows stay all-null (null is not the same claim as 0.0)
    for (rt <- Seq("cva", "securitisation", "market_risk", "operational_risk",
      "residual"))
      assert((2 to 5).forall(cms1(rt).isNullAt), s"$rt must be all-null")
    // CMS2's class rows pool to CMS1's credit row on every shared column
    val cms2 = Pillar3.q133Cms2.build(spark, sfDir).collect()
    val cms2Tot = cms2.find(_.getString(0) == "TOTAL").get
    val credit = cms1("credit_risk")
    assert(math.abs(d(cms2Tot, 2) - d(credit, 2)) < 0.01, "modelled tie-out")
    assert(math.abs(d(cms2Tot, 5) - d(credit, 5)) < 0.01, "sa-equiv tie-out")
    val classSum = cms2.filter(_.getString(0) != "TOTAL").map(d(_, 4)).sum
    assert(math.abs(d(cms2Tot, 4) - classSum) < 0.05, "CMS2 total != classes")
  }

  test("CCR1/CCR3/CCR8: the three sheets agree on the netting-set book") {
    def d(r: org.apache.spark.sql.Row, i: Int): Double =
      Option(r.get(i)).map(_.asInstanceOf[Double]).getOrElse(0.0)
    val ccr1 = Ccr.q134Ccr1.build(spark, sfDir).collect()
      .map(r => r.getString(1) -> r).toMap
    assert((2 to 3).forall(i => ccr1("imm").isNullAt(2)), "IMM placeholder null")
    assert(d(ccr1("total"), 2) == d(ccr1("sa_ccr"), 2))
    // CCR3 bands partition the SA-CCR EAD: band sum = total = CCR1 col a
    val ccr3 = Ccr.q135Ccr3.build(spark, sfDir).collect()
    val bandSum = ccr3.filter(r => r.getInt(0) != 11).map(d(_, 3)).sum
    val ccr3Tot = ccr3.find(_.getInt(0) == 11).get
    assert(math.abs(d(ccr3Tot, 3) - bandSum) < 0.05, "CCR3 bands != total")
    assert(math.abs(d(ccr3Tot, 3) - d(ccr1("sa_ccr"), 2)) < 0.01,
      "CCR3 total != CCR1 EAD")
    // CCR8: qccp + non_qccp = total_ccp, and the CCP RWEA complement is
    // exactly what CCR1's default-risk column excluded
    val ccr8 = Ccr.q136Ccr8.build(spark, sfDir).collect()
      .map(r => r.getString(1) -> r).toMap
    for (i <- Seq(2, 3))
      assert(math.abs(d(ccr8("total_ccp"), i) -
        (d(ccr8("qccp"), i) + d(ccr8("non_qccp"), i))) < 0.01)
    // C 34: the COREP rendering agrees with the Pillar-3 sheets on the
    // same book — C 34.01 EAD = CCR1 col a, the C 34.02 netting-set rows
    // partition it, and C 34.08's trade rows mirror CCR8's EAD column
    val c34 = Ccr.q141CorepC34.build(spark, sfDir).collect()
    def c34Row(t: String, ref: String) =
      c34.find(r => r.getString(0) == t && r.getString(1) == ref).get
    val ead3401 = d(c34Row("C34_01", "0010"), 3)
    assert(math.abs(ead3401 - d(ccr1("sa_ccr"), 2)) < 0.01, "C34.01 != CCR1")
    val setSum = c34.filter(_.getString(0) == "C34_02").map(d(_, 3)).sum
    assert(math.abs(setSum - ead3401) < 0.05, "C34.02 sets != C34.01")
    assert(math.abs(d(c34Row("C34_08", "0010"), 3) - d(ccr8("qccp"), 3)) < 0.01)
    assert(math.abs(d(c34Row("C34_08", "0020"), 3) -
      d(ccr8("non_qccp"), 3)) < 0.01)
    assert(c34Row("C34_04", "0010").isNullAt(3), "C34.04 EAD must be null")
    assert(d(c34Row("C34_04", "0010"), 4) > 0, "C34.04 CVA RWEA > 0")
  }

  test("OF 02.01 / CR6-A / CR7-A: floor, scope and conservation identities") {
    val of = Pillar3.q138Of0201.build(spark, sfDir).collect().head
    assert(math.abs(of.getDouble(2) -
      (of.getDouble(0) + of.getDouble(1))) < 0.01, "0030 != 0010 + 0020")
    val floorBasis = math.floor(of.getDouble(3) * 0.725 * 100 + 0.5) / 100
    assert(of.getDouble(5) == math.max(of.getDouble(2), floorBasis))
    assert(of.getBoolean(7) == (of.getDouble(2) < floorBasis))
    val cr6a = Pillar3.q137Cr6aScope.build(spark, sfDir).collect()
    cr6a.filter(r => r.getDouble(3) > 0).foreach { r =>
      assert(math.abs(r.getDouble(4) + r.getDouble(5) - 100.0) < 1e-4,
        s"${r.getString(1)}: pct_irb + pct_sa != 100")
    }
    val tot = cr6a.find(_.getString(1) == "TOTAL").get
    val classSum = cr6a.filter(_.getString(1) != "TOTAL").map(_.getDouble(3)).sum
    assert(math.abs(tot.getDouble(3) - classSum) < 0.05)
    val cr7a = Pillar3.q139Cr7aCrmExtent.build(spark, sfDir).collect()
    cr7a.foreach { r =>
      // waterfall conservation: secured + unsecured = EAD, and the typed
      // splits re-sum to the secured total
      assert(math.abs(r.getDouble(3) + r.getDouble(4) - r.getDouble(2)) < 0.02,
        s"${r.getString(0)}: secured+unsecured != EAD")
      assert(math.abs(
        r.getDouble(5) + r.getDouble(6) + r.getDouble(7) + r.getDouble(8) -
          r.getDouble(4)) < 0.02,
        s"${r.getString(0)}: typed splits != secured")
    }
  }

  test("C 02.00: footing, OV1 tie and the zero-vs-null fill discipline") {
    val c02 = Corep08.q140CorepC02.build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    def v(ref: String, i: Int): Double = c02(ref).getDouble(i)
    for (i <- Seq(2, 3)) {
      // Art. 92 footing: 0010 = 0050 + settlement + CVA, 0050 = 0060 + 0220
      assert(math.abs(v("0010", i) - (v("0050", i) + v("0430", i) +
        v("0590", i))) < 0.01, s"col $i: 0010 footing")
      assert(math.abs(v("0050", i) - (v("0060", i) + v("0220", i))) < 0.01,
        s"col $i: 0050 != 0060 + 0220")
      // the F-IRB-only rulebook: 0240 mirrors 0220, A-IRB block zero
      assert(v("0240", i) == v("0220", i))
      assert(v("0300", i) == 0.0)
      // class rows re-sum to the flat approach totals within leg rounding
      val saClasses = Seq("0070", "0080", "0090", "0100", "0110", "0120",
        "0130", "0140", "0150", "0160", "0170", "0180", "0190", "0200",
        "0210", "0211").map(v(_, i)).sum
      val irbClasses = Seq("0250", "0260").map(v(_, i)).sum
      assert(math.abs(irbClasses - v("0220", i)) < 1.0,
        s"col $i: IRB classes $irbClasses != 0220 ${v("0220", i)}")
      assert(saClasses <= v("0060", i) + 0.01, s"col $i: SA classes overshoot")
    }
    // null-fill rows (out of scope) vs zero-fill rows (computed zero)
    for (ref <- Seq("0440", "0460", "0640", "0680"); i <- Seq(2, 3))
      assert(c02(ref).isNullAt(i), s"$ref col $i must be null")
    assert(v("0210", 2) == 0.0)
    // 0010 ties to the OV1 Total row — same components, same arithmetic
    val ov1Tot = Pillar3.q130Ov1Overview.build(spark, sfDir).collect()
      .find(_.getInt(0) == 29).get
    assert(math.abs(v("0010", 2) - ov1Tot.getDouble(2)) < 0.01, "OV1 tie crr")
    assert(math.abs(v("0010", 3) - ov1Tot.getDouble(3)) < 0.01, "OV1 tie b31")
    // own-funds requirement is 8% of TREA (Art. 92(1))
    assert(math.abs(v("0040", 2) - v("0010", 2) * 0.08) < 0.01)
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
