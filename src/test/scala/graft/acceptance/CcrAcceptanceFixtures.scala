package graft.acceptance

/** The reference's CCR golden-scenario family, translated programmatically
  * by `tools/gen_ccr_acceptance_fixtures.py` — regenerate with that
  * script, never edit by hand.
  *
  * INPUTS are the published trade/netting-set constants of each golden
  * fixture module (reference `tests/fixtures/ccr/golden_ccr_*.py`); day
  * counts are derived with the reference's conventions (calendar days for
  * the supervisory duration, Mon-Fri business days for maturity factors).
  * EXPECTED values are the engine-independent records
  * `tests/expected_outputs/ccr/CCR-*.json`.
  */
final case class CcrTrade(
    scenario: String, tradeId: String, nettingSet: String, assetClass: String,
    notional: Option[Double], absLeg1Base: Option[Double],
    absLeg2Base: Option[Double], leg1IsBase: Option[Boolean],
    leg2IsBase: Option[Boolean], marketPrice: Option[Double],
    units: Option[Double], isIndex: Option[Boolean],
    creditQuality: Option[String], commodityType: Option[String],
    optionType: Option[String], optionStrike: Option[Double],
    optionUnderlying: Option[Double], isLong: Boolean,
    daysToMaturity: Int, bdToMaturity: Int, daysStartToMaturity: Int,
    mtm: Double, referenceEntity: Option[String],
    hedgingSet: Option[String])

final case class CcrNettingSet(
    scenario: String, nettingSet: String, margined: Boolean, th: Double,
    mta: Double, nica: Double, mporDaysInput: Int, remarginFreqDays: Int,
    nTrades: Int, hasIlliquid: Boolean, disputeCountQtr: Int, cNet: Double)

final case class CcrExpected(
    scenario: String, addonAggregate: Option[Double],
    pfeMultiplier: Option[Double], pfeAddon: Option[Double],
    eadFinal: Double, approach: String, riskWeight: Double,
    rwaFinal: Double, rcMargined: Option[Double], pd: Option[Double],
    lgd: Option[Double], irbMaturityM: Option[Double])

object CcrAcceptanceFixtures {
  val trades: Seq[CcrTrade] = Seq(
    CcrTrade("CCR-A1", "T_001", "NS_001", "interest_rate", Some(100000000.0), None, None, None, None, None, None, None, None, None, None, None, None, true, 3652, 2608, 3652, 0.0, None, None),
    CcrTrade("CCR-A2", "T_FX_001", "NS_FX_001", "fx", None, Some(80000000.0), Some(80000000.0), Some(false), Some(true), None, None, None, None, None, None, None, None, true, 365, 261, 365, 0.0, None, Some("USD/GBP")),
    CcrTrade("CCR-A3", "T_CR_001", "NS_CR_001", "credit", Some(100000000.0), None, None, None, None, None, None, Some(false), Some("IG"), None, None, None, None, true, 1826, 1304, 1826, 0.0, Some("ACME_LEI_5493001A"), None),
    CcrTrade("CCR-A4", "T_CR_002", "NS_CR_002", "credit", Some(100000000.0), None, None, None, None, None, None, Some(true), Some("IG"), None, None, None, None, true, 1826, 1304, 1826, 0.0, Some("ITRAXX_EUROPE_S40_LEI_5493001I"), None),
    CcrTrade("CCR-A5", "T_EQ_001", "NS_EQ_001", "equity", None, None, None, None, None, Some(50.0), Some(1000000.0), Some(false), None, None, None, None, None, true, 365, 261, 365, 0.0, Some("GB00B16GWD56"), None),
    CcrTrade("CCR-A6", "T_EQ_OPT_001", "NS_EQ_OPT_001", "equity", None, None, None, None, None, Some(100.0), Some(500000.0), Some(true), None, None, Some("call"), Some(110.0), Some(100.0), true, 365, 261, 365, 0.0, Some("UKX_INDEX"), None),
    CcrTrade("CCR-A7", "T_CO_OIL_001", "NS_CO_001", "commodity", None, None, None, None, None, Some(50.0), Some(20000.0), None, None, Some("OIL_GAS"), None, None, None, true, 730, 522, 730, 0.0, None, None),
    CcrTrade("CCR-A8", "T_CO_ELEC_001", "NS_CO_002", "commodity", None, None, None, None, None, Some(25.0), Some(40000.0), None, None, Some("ELECTRICITY"), None, None, None, true, 365, 261, 365, 0.0, None, None),
    CcrTrade("CCR-A9", "T_CO_OIL_002", "NS_CO_003", "commodity", None, None, None, None, None, Some(50.0), Some(20000.0), None, None, Some("OIL_GAS"), None, None, None, true, 730, 522, 730, 0.0, None, None),
    CcrTrade("CCR-A9", "T_CO_MET_001", "NS_CO_003", "commodity", None, None, None, None, None, Some(8000.0), Some(250.0), None, None, Some("METALS"), None, None, None, true, 730, 522, 730, 0.0, None, None),
    CcrTrade("CCR-A9", "T_CO_ELEC_002", "NS_CO_003", "commodity", None, None, None, None, None, Some(25.0), Some(40000.0), None, None, Some("ELECTRICITY"), None, None, None, true, 730, 522, 730, 0.0, None, None),
    CcrTrade("CCR-A10", "T_MIX_IR_001", "NS_MIX_001", "interest_rate", Some(100000000.0), None, None, None, None, None, None, None, None, None, None, None, None, true, 3652, 2608, 3652, 0.0, None, None),
    CcrTrade("CCR-A10", "T_MIX_FX_001", "NS_MIX_001", "fx", None, Some(80000000.0), Some(80000000.0), Some(false), Some(true), None, None, None, None, None, None, None, None, true, 365, 261, 365, 0.0, None, Some("USD/GBP")),
    CcrTrade("CCR-A10", "T_MIX_CR_001", "NS_MIX_001", "credit", Some(100000000.0), None, None, None, None, None, None, Some(false), Some("IG"), None, None, None, None, true, 1826, 1304, 1826, 0.0, Some("ACME_LEI_5493001A"), None),
    CcrTrade("CCR-A10", "T_MIX_EQ_001", "NS_MIX_001", "equity", None, None, None, None, None, Some(50.0), Some(1000000.0), Some(false), None, None, None, None, None, true, 365, 261, 365, 0.0, Some("GB00B16GWD56"), None),
    CcrTrade("CCR-A10", "T_MIX_CO_001", "NS_MIX_001", "commodity", None, None, None, None, None, Some(50.0), Some(20000.0), None, None, Some("OIL_GAS"), None, None, None, true, 730, 522, 730, 0.0, None, None),
    CcrTrade("CCR-A13", "T_MGN_001", "NS_MGN_001", "interest_rate", Some(100000000.0), None, None, None, None, None, None, None, None, None, None, None, None, true, 3652, 2608, 3652, -4000000.0, None, None),
    CcrTrade("CCR-A14", "T_MGN_002", "NS_MGN_002", "interest_rate", Some(100000000.0), None, None, None, None, None, None, None, None, None, None, None, None, true, 3652, 2608, 3652, -4000000.0, None, None),
    CcrTrade("CCR-IRB-1", "T_IRB_001", "NS_IRB_001", "interest_rate", Some(100000000.0), None, None, None, None, None, None, None, None, None, None, None, None, true, 1826, 1304, 1826, 0.0, None, None),
  )

  val nettingSets: Seq[CcrNettingSet] = Seq(
    CcrNettingSet("CCR-A1", "NS_001", false, 0.0, 0.0, 0.0, 0, 0, 1, false, 0, 0.0),
    CcrNettingSet("CCR-A2", "NS_FX_001", false, 0.0, 0.0, 0.0, 0, 0, 1, false, 0, 0.0),
    CcrNettingSet("CCR-A3", "NS_CR_001", false, 0.0, 0.0, 0.0, 0, 0, 1, false, 0, 0.0),
    CcrNettingSet("CCR-A4", "NS_CR_002", false, 0.0, 0.0, 0.0, 0, 0, 1, false, 0, 0.0),
    CcrNettingSet("CCR-A5", "NS_EQ_001", false, 0.0, 0.0, 0.0, 0, 0, 1, false, 0, 0.0),
    CcrNettingSet("CCR-A6", "NS_EQ_OPT_001", false, 0.0, 0.0, 0.0, 0, 0, 1, false, 0, 0.0),
    CcrNettingSet("CCR-A7", "NS_CO_001", false, 0.0, 0.0, 0.0, 0, 0, 1, false, 0, 0.0),
    CcrNettingSet("CCR-A8", "NS_CO_002", false, 0.0, 0.0, 0.0, 0, 0, 1, false, 0, 0.0),
    CcrNettingSet("CCR-A9", "NS_CO_003", false, 0.0, 0.0, 0.0, 0, 0, 3, false, 0, 0.0),
    CcrNettingSet("CCR-A10", "NS_MIX_001", false, 0.0, 0.0, 0.0, 0, 0, 5, false, 0, 0.0),
    CcrNettingSet("CCR-A13", "NS_MGN_001", true, 2000000.0, 500000.0, 250000.0, 10, 1, 1, false, 0, 0.0),
    CcrNettingSet("CCR-A14", "NS_MGN_002", true, 2000000.0, 500000.0, 250000.0, 10, 126, 1, false, 0, 0.0),
    CcrNettingSet("CCR-IRB-1", "NS_IRB_001", false, 0.0, 0.0, 0.0, 0, 0, 1, false, 0, 0.0),
  )

  val expected: Seq[CcrExpected] = Seq(
    CcrExpected("CCR-A1", Some(3914298.228), Some(1.0), Some(3914298.228), 5480017.519, "standardised", 0.5, 2740008.759, None, None, None, None),
    CcrExpected("CCR-A2", Some(3200000.0), Some(1.0), Some(3200000.0), 4480000.0, "standardised", 0.5, 2240000.0, None, None, None, None),
    CcrExpected("CCR-A3", Some(2016405.972), Some(1.0), Some(2016405.972), 2822968.36, "standardised", 0.5, 1411484.18, None, None, None, None),
    CcrExpected("CCR-A4", Some(1665726.672), Some(1.0), Some(1665726.672), 2332017.341, "standardised", 0.5, 1166008.67, None, None, None, None),
    CcrExpected("CCR-A5", Some(16000000.0), Some(1.0), Some(16000000.0), 22400000.0, "standardised", 0.5, 11200000.0, None, None, None, None),
    CcrExpected("CCR-A6", Some(5979017.546862791), Some(1.0), Some(5979017.546862791), 8370624.565607907, "standardised", 0.5, 4185312.2828039536, None, None, None, None),
    CcrExpected("CCR-A7", Some(180000.0), Some(1.0), Some(180000.0), 252000.0, "standardised", 0.5, 126000.0, None, None, None, None),
    CcrExpected("CCR-A8", Some(400000.0), Some(1.0), Some(400000.0), 560000.0, "standardised", 0.5, 280000.0, None, None, None, None),
    CcrExpected("CCR-A9", Some(567450.441), Some(1.0), Some(567450.441), 794430.617, "standardised", 0.5, 397215.308, None, None, None, None),
    CcrExpected("CCR-A10", Some(25310704.199375845), Some(1.0), Some(25310704.199375845), 35434985.87912618, "standardised", 0.5, 17717492.93956309, None, None, None, None),
    CcrExpected("CCR-A13", Some(1174289.4683183974), Some(0.20816907251400474), Some(244450.7494828046), 3492231.049275926, "standardised", 0.5, 1746115.524637963, Some(2250000.0), None, None, None),
    CcrExpected("CCR-A14", Some(4314615.011554657), Some(0.633196584008729), Some(2731999.486630257), 6974799.28128236, "standardised", 0.5, 3487399.64064118, Some(2250000.0), None, None, None),
    CcrExpected("CCR-IRB-1", None, None, None, 3068443.8698989097, "foundation_irb", 1.45929215, 4477756.045762, None, Some(0.015), Some(0.45), Some(5.0)),
  )
}
