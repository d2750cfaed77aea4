#!/usr/bin/env python3
"""Translate the reference's CCR golden-scenario family into Scala fixture
literals for the SA-CCR acceptance replay.

Programmatic translation (never a copied file):

- Scenario INPUTS are the published trade/netting-set constants of each
  golden fixture module (reference `tests/fixtures/ccr/golden_ccr_*.py` —
  each row below cites its module). Day counts are DERIVED here with the
  reference's own conventions: calendar days from the reporting date
  (2026-01-15) for the supervisory duration and IR buckets, numpy
  busday_count (Mon-Fri) for the business-day maturity-factor basis
  (reference `engine/ccr/maturity_factor.py:69-135` +
  `adjusted_notional.py:89-99`), calendar days / 365 for the option T
  (`supervisory_delta.py` option branch).
- Scenario EXPECTED outputs are read from the engine-independent records
  `tests/expected_outputs/ccr/CCR-*.json`.

Regenerate with:

    python3 tools/gen_ccr_acceptance_fixtures.py
"""
import json
from datetime import date

import numpy as np

REF = "/root/reference/tests/expected_outputs/ccr"
REPORTING = date(2026, 1, 15)


def days(to):
    return (to - REPORTING).days


def bdays(to):
    return int(np.busday_count(REPORTING.isoformat(), to.isoformat()))


D2027 = date(2027, 1, 15)
D2028 = date(2028, 1, 15)
D2031 = date(2031, 1, 15)
D2036 = date(2036, 1, 15)

# One row per trade:
# (scenario, trade_id, netting_set, asset_class, notional,
#  abs_leg1_base, abs_leg2_base, leg1_is_base, leg2_is_base,
#  market_price, units, is_index, credit_quality, commodity_type,
#  option_type, strike, underlying, is_long, maturity_date, mtm)
# Citations: golden_ccr_a1.py (IR 10y 100m), golden_ccr_a2.py (FX fwd USD
# 100m/GBP 80m @0.80), golden_ccr_a3/a4.py (credit SN/IDX IG 100m 5y),
# golden_ccr_a5.py (equity SN 50x1m), golden_ccr_a6.py (equity IDX call
# K=110 P=100 100x500k), golden_ccr_a7/a8/a9.py (commodity),
# golden_ccr_a10.py (mixed clone set), golden_ccr_a13/a14.py (margined IR,
# MtM -4m), golden_ccr_irb1.py (IR 5y 100m, F-IRB counterparty).
def T(ac, notional=None, l1=None, l2=None, l1b=None, l2b=None, mp=None,
      un=None, idx=None, cq=None, ct=None, ot=None, k=None, u=None,
      lng=True, mat=None, mtm=0.0, re=None, hs=None):
    return (ac, notional, l1, l2, l1b, l2b, mp, un, idx, cq, ct, ot, k, u,
            lng, mat, mtm, re, hs)


IR_10Y = T("interest_rate", notional=100e6, mat=D2036)
IR_5Y = T("interest_rate", notional=100e6, mat=D2031)
FX_FWD = T("fx", l1=80e6, l2=80e6, l1b=False, l2b=True, mat=D2027, hs="USD/GBP")
CR_SN = T("credit", notional=100e6, idx=False, cq="IG", mat=D2031, re="ACME_LEI_5493001A")
CR_IDX = T("credit", notional=100e6, idx=True, cq="IG", mat=D2031, re="ITRAXX_EUROPE_S40_LEI_5493001I")
EQ_SN = T("equity", mp=50.0, un=1_000_000.0, idx=False, mat=D2027, re="GB00B16GWD56")
EQ_OPT = T("equity", mp=100.0, un=500_000.0, idx=True, ot="call", k=110.0,
           u=100.0, mat=D2027, re="UKX_INDEX")
CO_OIL = T("commodity", mp=50.0, un=20_000.0, ct="OIL_GAS", mat=D2028)
CO_MET = T("commodity", mp=8_000.0, un=250.0, ct="METALS", mat=D2028)
CO_ELEC1 = T("commodity", mp=25.0, un=40_000.0, ct="ELECTRICITY", mat=D2027)
CO_ELEC2 = T("commodity", mp=25.0, un=40_000.0, ct="ELECTRICITY", mat=D2028)


def with_mtm(t, mtm):
    return t[:16] + (mtm,) + t[17:]


TRADES = [
    ("CCR-A1", "T_001", "NS_001") + IR_10Y,
    ("CCR-A2", "T_FX_001", "NS_FX_001") + FX_FWD,
    ("CCR-A3", "T_CR_001", "NS_CR_001") + CR_SN,
    ("CCR-A4", "T_CR_002", "NS_CR_002") + CR_IDX,
    ("CCR-A5", "T_EQ_001", "NS_EQ_001") + EQ_SN,
    ("CCR-A6", "T_EQ_OPT_001", "NS_EQ_OPT_001") + EQ_OPT,
    ("CCR-A7", "T_CO_OIL_001", "NS_CO_001") + CO_OIL,
    ("CCR-A8", "T_CO_ELEC_001", "NS_CO_002") + CO_ELEC1,
    ("CCR-A9", "T_CO_OIL_002", "NS_CO_003") + CO_OIL,
    ("CCR-A9", "T_CO_MET_001", "NS_CO_003") + CO_MET,
    ("CCR-A9", "T_CO_ELEC_002", "NS_CO_003") + CO_ELEC2,
    ("CCR-A10", "T_MIX_IR_001", "NS_MIX_001") + IR_10Y,
    ("CCR-A10", "T_MIX_FX_001", "NS_MIX_001") + FX_FWD,
    ("CCR-A10", "T_MIX_CR_001", "NS_MIX_001") + CR_SN,
    ("CCR-A10", "T_MIX_EQ_001", "NS_MIX_001") + EQ_SN,
    ("CCR-A10", "T_MIX_CO_001", "NS_MIX_001") + CO_OIL,
    ("CCR-A13", "T_MGN_001", "NS_MGN_001") + with_mtm(IR_10Y, -4_000_000.0),
    ("CCR-A14", "T_MGN_002", "NS_MGN_002") + with_mtm(IR_10Y, -4_000_000.0),
    ("CCR-IRB-1", "T_IRB_001", "NS_IRB_001") + IR_5Y,
]

# (scenario, netting_set, margined, th, mta, nica, mpor_input,
#  remargin_freq_days, n_trades, has_illiquid, disputes, c_net)
# Margin constants: golden_ccr_a13.py / golden_ccr_a14.py (TH=2m MTA=0.5m
# NICA=0.25m MPOR=10; freq 1 vs 126).
NETTING_SETS = [
    ("CCR-A1", "NS_001", False, 0, 0, 0, 0, 0, 1, False, 0, 0.0),
    ("CCR-A2", "NS_FX_001", False, 0, 0, 0, 0, 0, 1, False, 0, 0.0),
    ("CCR-A3", "NS_CR_001", False, 0, 0, 0, 0, 0, 1, False, 0, 0.0),
    ("CCR-A4", "NS_CR_002", False, 0, 0, 0, 0, 0, 1, False, 0, 0.0),
    ("CCR-A5", "NS_EQ_001", False, 0, 0, 0, 0, 0, 1, False, 0, 0.0),
    ("CCR-A6", "NS_EQ_OPT_001", False, 0, 0, 0, 0, 0, 1, False, 0, 0.0),
    ("CCR-A7", "NS_CO_001", False, 0, 0, 0, 0, 0, 1, False, 0, 0.0),
    ("CCR-A8", "NS_CO_002", False, 0, 0, 0, 0, 0, 1, False, 0, 0.0),
    ("CCR-A9", "NS_CO_003", False, 0, 0, 0, 0, 0, 3, False, 0, 0.0),
    ("CCR-A10", "NS_MIX_001", False, 0, 0, 0, 0, 0, 5, False, 0, 0.0),
    ("CCR-A13", "NS_MGN_001", True, 2_000_000.0, 500_000.0, 250_000.0, 10, 1,
     1, False, 0, 0.0),
    ("CCR-A14", "NS_MGN_002", True, 2_000_000.0, 500_000.0, 250_000.0, 10, 126,
     1, False, 0, 0.0),
    ("CCR-IRB-1", "NS_IRB_001", False, 0, 0, 0, 0, 0, 1, False, 0, 0.0),
]


def sv(x):
    return f'"{x}"'


def dv(x):
    return repr(float(x))


def opt_d(x):
    return f"Some({dv(x)})" if x is not None else "None"


def opt_s(x):
    return f"Some({sv(x)})" if x is not None else "None"


def opt_b(x):
    return "Some(true)" if x else ("None" if x is None else "Some(false)")


def bl(x):
    return "true" if x else "false"


def trade_rows():
    for (scen, tid, ns, ac, notional, l1, l2, l1b, l2b, mp, un, idx, cq, ct,
         ot, k, u, lng, mat, mtm, re, hs) in TRADES:
        yield (
            f"    CcrTrade({sv(scen)}, {sv(tid)}, {sv(ns)}, {sv(ac)}, "
            f"{opt_d(notional)}, {opt_d(l1)}, {opt_d(l2)}, "
            f"{opt_b(l1b)}, {opt_b(l2b)}, {opt_d(mp)}, {opt_d(un)}, "
            f"{opt_b(idx)}, {opt_s(cq)}, {opt_s(ct)}, {opt_s(ot)}, "
            f"{opt_d(k)}, {opt_d(u)}, {bl(lng)}, {days(mat)}, "
            f"{bdays(mat)}, {days(mat)}, {dv(mtm)}, {opt_s(re)}, "
            f"{opt_s(hs)}),")


def ns_rows():
    for (scen, ns, m, th, mta, nica, mpor, freq, n, ill, disp, c) in NETTING_SETS:
        yield (
            f"    CcrNettingSet({sv(scen)}, {sv(ns)}, {bl(m)}, {dv(th)}, "
            f"{dv(mta)}, {dv(nica)}, {mpor}, {freq}, {n}, {bl(ill)}, "
            f"{disp}, {dv(c)}),")


def expected_rows():
    for (scen, _, _, _, _, _, _, _, _, _, _, _) in NETTING_SETS:
        rec = json.load(open(f"{REF}/{scen}.json"))
        yield (
            f"    CcrExpected({sv(scen)}, "
            f"{opt_d(rec.get('addon_aggregate'))}, "
            f"{opt_d(rec.get('pfe_multiplier'))}, "
            f"{opt_d(rec.get('pfe_addon'))}, {dv(rec['ead_final'])}, "
            f"{sv(rec['approach_applied'])}, {dv(rec['risk_weight'])}, "
            f"{dv(rec['rwa_final'])}, {opt_d(rec.get('rc_margined'))}, "
            f"{opt_d(rec.get('pd'))}, {opt_d(rec.get('lgd'))}, "
            f"{opt_d(rec.get('irb_maturity_m'))}),")


HEADER = '''package graft.acceptance

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
'''


def main():
    out = [HEADER]
    out.append("  val trades: Seq[CcrTrade] = Seq(\n")
    out.extend(r + "\n" for r in trade_rows())
    out.append("  )\n\n  val nettingSets: Seq[CcrNettingSet] = Seq(\n")
    out.extend(r + "\n" for r in ns_rows())
    out.append("  )\n\n  val expected: Seq[CcrExpected] = Seq(\n")
    out.extend(r + "\n" for r in expected_rows())
    out.append("  )\n}\n")
    path = "src/test/scala/graft/acceptance/CcrAcceptanceFixtures.scala"
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {path}: {len(TRADES)} trades, {len(NETTING_SETS)} netting "
          f"sets")


if __name__ == "__main__":
    main()
