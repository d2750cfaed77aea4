package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Pins the reference CRM semantics for the two other-funded-protection
  * calculators (reference `tests/unit/crm/test_life_insurance.py`,
  * `tests/unit/crm/test_p1_239_third_party_deposit.py`): the Art. 232(3)
  * insurer-RW band map, the Art. 233(3) per-policy cut-then-sum FX
  * reduction, multi-level pro-rata pledges, the EAD cap, and the
  * third-party-deposit split + F-IRB deferral.
  */
class OtherFundedProtectionSpec extends SparkSpec {
  import spark.implicits._

  private def expo3: DataFrame = Seq(
    ("E1", 1000.0, "GBP"), ("E2", 2000.0, "GBP"), ("E3", 500.0, "GBP"))
    .toDF("exposure_reference", "ead", "currency")

  private def liCol(rows: Seq[(String, Double, Option[Double], Option[String])]): DataFrame =
    rows.map { case (b, v, rw, ccy) => (b, "life_insurance", v, rw, ccy) }
      .toDF("beneficiary_reference", "collateral_type", "market_value",
        "insurer_risk_weight", "currency")

  private def liRow(df: DataFrame, ref: String): Row =
    df.filter(col("exposure_reference") === ref)
      .select("life_ins_collateral_value", "life_ins_secured_rw").head()

  test("Art. 232(3) insurer-RW band map incl. null->100%->70% default") {
    val in = Seq(Some(0.20), Some(0.30), Some(0.50), Some(0.65), Some(1.00),
      Some(1.35), Some(1.50), None).toDF("rw")
    val got = in.select(OtherFundedProtection.mapInsurerRw(col("rw")).as("m"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(0.20, 0.35, 0.35, 0.70, 0.70, 0.70, 1.50, 0.70))
  }

  test("value allocated to the pledged exposure; mapped RW; others zero") {
    val out = OtherFundedProtection.lifeInsuranceColumns(
      expo3, liCol(Seq(("E1", 400.0, Some(0.50), Some("GBP")))))
    val r1 = liRow(out, "E1")
    assert(r1.getDouble(0) === 400.0 && r1.getDouble(1) === 0.35)
    assert(liRow(out, "E2").getDouble(0) === 0.0)
  }

  test("surrender value capped at EAD") {
    val out = OtherFundedProtection.lifeInsuranceColumns(
      expo3, liCol(Seq(("E3", 999.0, Some(0.20), Some("GBP")))))
    assert(liRow(out, "E3").getDouble(0) === 500.0)
  }

  test("multiple policies: value-weighted average mapped RW") {
    val out = OtherFundedProtection.lifeInsuranceColumns(
      expo3, liCol(Seq(
        ("E2", 600.0, Some(0.20), Some("GBP")),
        ("E2", 400.0, Some(1.00), Some("GBP")))))
    val r = liRow(out, "E2")
    // (600*0.20 + 400*0.70) / 1000 = 0.40
    assert(r.getDouble(0) === 1000.0 && math.abs(r.getDouble(1) - 0.40) < 1e-12)
  }

  test("Art. 233(3): currency mismatch takes the 8% cut; null ccy conservative") {
    val mism = OtherFundedProtection.lifeInsuranceColumns(
      expo3, liCol(Seq(("E1", 400.0, Some(0.50), Some("USD")))))
    assert(math.abs(liRow(mism, "E1").getDouble(0) - 368.0) < 1e-9)
    val nul = OtherFundedProtection.lifeInsuranceColumns(
      expo3, liCol(Seq(("E1", 400.0, Some(0.50), None))))
    assert(math.abs(liRow(nul, "E1").getDouble(0) - 368.0) < 1e-9)
  }

  test("Art. 233(3): mixed-currency pool cuts ONLY the mismatched share (cut-then-sum)") {
    val out = OtherFundedProtection.lifeInsuranceColumns(
      expo3, liCol(Seq(
        ("E1", 100.0, Some(0.20), Some("GBP")),
        ("E1", 900.0, Some(0.20), Some("USD")))))
    val r = liRow(out, "E1")
    // 100 + 900*0.92 = 928, NOT 1000 or 920
    assert(math.abs(r.getDouble(0) - 928.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 0.20) < 1e-12)
  }

  test("absent currency column: no FX dimension, no cut") {
    val coll = Seq(("E1", "life_insurance", 400.0, Some(0.50)))
      .toDF("beneficiary_reference", "collateral_type", "market_value",
        "insurer_risk_weight")
    val out = OtherFundedProtection.lifeInsuranceColumns(expo3, coll)
    assert(liRow(out, "E1").getDouble(0) === 400.0)
  }

  private def expoFac: DataFrame = Seq(
    ("E1", "C1", "F1", 600.0, "GBP"), ("E2", "C1", "F1", 400.0, "GBP"))
    .toDF("exposure_reference", "counterparty_reference",
      "parent_facility_reference", "ead", "currency")

  test("facility- and counterparty-level pledges allocate pro-rata by EAD") {
    for (key <- Seq("F1", "C1")) {
      val out = OtherFundedProtection.lifeInsuranceColumns(
        expoFac, liCol(Seq((key, 1000.0, Some(0.20), Some("GBP")))))
      assert(math.abs(liRow(out, "E1").getDouble(0) - 600.0) < 1e-9)
      assert(math.abs(liRow(out, "E2").getDouble(0) - 400.0) < 1e-9)
    }
  }

  test("a direct pledge benefits only its own exposure, not facility siblings") {
    val out = OtherFundedProtection.lifeInsuranceColumns(
      expoFac, liCol(Seq(("E1", 500.0, Some(0.20), Some("GBP")))))
    assert(liRow(out, "E1").getDouble(0) === 500.0)
    assert(liRow(out, "E2").getDouble(0) === 0.0)
  }

  test("facility pledge with FX mismatch cuts each pro-rata share") {
    val out = OtherFundedProtection.lifeInsuranceColumns(
      expoFac, liCol(Seq(("F1", 1000.0, Some(0.20), Some("USD")))))
    assert(math.abs(liRow(out, "E1").getDouble(0) - 552.0) < 1e-9)
    assert(math.abs(liRow(out, "E2").getDouble(0) - 368.0) < 1e-9)
  }

  // ---- third-party deposits -------------------------------------------

  private val instRw: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    cqs => when(cqs === 1, 0.2).when(cqs === 2, 0.3).when(cqs === 3, 0.5)
      .otherwise(1.0)

  private def tpdColl(rows: Seq[(String, String, Option[String], String, Int, Double)]): DataFrame =
    rows.toDF("beneficiary_reference", "collateral_type",
      "held_by_counterparty_reference", "issuer_type", "issuer_cqs", "market_value")

  test("split: held-by third party leaves the ordinary channel; own-bank stays") {
    val coll = tpdColl(Seq(
      ("E1", "cash", Some("BANK_H"), "institution", 2, 100.0),
      ("E1", "cash", None, "institution", 2, 50.0),
      ("E1", "bond", Some("BANK_H"), "institution", 2, 25.0)))
    val (ordinary, tpd) = OtherFundedProtection.splitThirdPartyDeposits(coll)
    assert(ordinary.count() === 2) // own-bank cash + the bond
    assert(tpd.get.count() === 1)
  }

  test("institution-held deposit: holder RW substitution, capped at EAD") {
    val expo = Seq(("E1", 1000.0, "SA", 1.0))
      .toDF("exposure_reference", "ead", "approach", "own_rw")
    val (_, tpd) = OtherFundedProtection.splitThirdPartyDeposits(tpdColl(Seq(
      ("E1", "cash", Some("BANK_H"), "institution", 2, 1500.0))))
    val out = OtherFundedProtection.thirdPartyDepositColumns(expo, tpd, instRw)
    val r = out.select("third_party_deposit_value", "third_party_deposit_secured_rw",
      "tpd_firb_deferred", "tpd_non_institution_holder").head()
    assert(r.getDouble(0) === 1000.0) // capped at EAD
    assert(r.getDouble(1) === 0.3)    // CQS2 holder
    assert(!r.getBoolean(2) && !r.getBoolean(3))
  }

  test("F-IRB: substitution deferred — no benefit, CRM017 censused") {
    val expo = Seq(("E1", 1000.0, "FIRB", 0.45))
      .toDF("exposure_reference", "ead", "approach", "own_rw")
    val (_, tpd) = OtherFundedProtection.splitThirdPartyDeposits(tpdColl(Seq(
      ("E1", "cash", Some("BANK_H"), "institution", 2, 600.0))))
    val out = OtherFundedProtection.thirdPartyDepositColumns(expo, tpd, instRw)
    val r = out.select("third_party_deposit_value", "tpd_firb_deferred").head()
    assert(r.getDouble(0) === 0.0 && r.getBoolean(1))
  }

  test("non-institution holder: out of Art. 232(2) scope — no benefit, censused") {
    val expo = Seq(("E1", 1000.0, "SA", 1.0))
      .toDF("exposure_reference", "ead", "approach", "own_rw")
    val (_, tpd) = OtherFundedProtection.splitThirdPartyDeposits(tpdColl(Seq(
      ("E1", "cash", Some("CORP_H"), "corporate", 2, 600.0))))
    val out = OtherFundedProtection.thirdPartyDepositColumns(expo, tpd, instRw)
    val r = out.select("third_party_deposit_value", "third_party_deposit_secured_rw",
      "tpd_non_institution_holder").head()
    assert(r.getDouble(0) === 0.0 && r.getDouble(1) === 0.0 && r.getBoolean(2))
  }

  test("mixed holders on one exposure: only the institution share benefits") {
    val expo = Seq(("E1", 1000.0, "SA", 1.0))
      .toDF("exposure_reference", "ead", "approach", "own_rw")
    val (_, tpd) = OtherFundedProtection.splitThirdPartyDeposits(tpdColl(Seq(
      ("E1", "cash", Some("BANK_H"), "bank", 1, 300.0),
      ("E1", "deposit", Some("CORP_H"), "corporate", 2, 400.0))))
    val out = OtherFundedProtection.thirdPartyDepositColumns(expo, tpd, instRw)
    val r = out.select("third_party_deposit_value", "third_party_deposit_secured_rw",
      "tpd_non_institution_holder").head()
    assert(r.getDouble(0) === 300.0 && r.getDouble(1) === 0.2 && r.getBoolean(2))
  }
}
