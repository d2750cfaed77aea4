#!/usr/bin/env python3
"""Translate the reference's engine-independent expected-output scenarios
(tests/expected_outputs/{crr,basel31}/expected_rwa_*.json) into Scala
fixture literals for AcceptanceSpec.

Programmatic translation (never a copied file): reads the published JSON,
selects the replayed groups, derives the kernel-input fields the repo's
calculators expect, and emits src/test/scala/graft/acceptance/
AcceptanceFixtures.scala. Regenerate with:

    python3 tools/gen_acceptance_fixtures.py
"""
import json
import re

CRR = json.load(open("/root/reference/tests/expected_outputs/crr/expected_rwa_crr.json"))
B31 = json.load(open("/root/reference/tests/expected_outputs/basel31/expected_rwa_b31.json"))

# The reference converts the EUR-denominated CRR Art. 501/153(4) thresholds
# into the GBP book currency at eur_gbp_rate = 0.8732
# (reference src/rwa_calc/engine/irb/formulas.py:685).
EUR_GBP = 0.8732

GROUPS = {"CRR-B", "CRR-E", "CRR-F", "B31-B"}

CLASS_MAP = {
    "CORPORATE": "corporate",
    "CORPORATE_SME": "corporate_sme",
    "RETAIL_SME": "retail_sme",
    "SPECIALISED_LENDING": "specialised_lending",
    "SPECIALISED_LENDING_HVCRE": "specialised_lending",  # UK CRR: no HVCRE table
}


def opt(v, f=lambda x: x):
    return f"Some({f(v)})" if v is not None else "None"


def q(s):
    return '"' + str(s) + '"'


def d(x):
    return repr(float(x))


def rows():
    for src, fw in ((CRR, "CRR"), (B31, "BASEL_3_1")):
        for s in src["scenarios"]:
            if s["scenario_group"] not in GROUPS:
                continue
            notes = s.get("calculation_notes", "")
            group_kind = s["scenario_group"].split("-")[1]
            # turnover: CRR file records millions, B31 file records units
            turn = s.get("turnover")
            if turn is not None and turn > 1e5:
                turn = turn / 1e6
            size_m = None
            if turn is not None:
                size_m = turn / EUR_GBP if fw == "CRR" else turn
            # FIRB where the scenario LGD is the supervisory value; a
            # blended (collateral-adjusted) LGD replays through the A-IRB
            # own-estimate path (CRR A-IRB is unfloored) so the formula is
            # exercised with the scenario's LGD*.
            lgd = s.get("lgd")
            supervisory = {0.75, 0.45 if fw == "CRR" else 0.40}
            approach = None
            seniority = None
            if group_kind == "B":
                approach = "FIRB" if lgd in supervisory else "AIRB"
                seniority = "subordinated" if lgd == 0.75 else "senior"
            # slotting: category + maturity band parsed from the notes
            slot_cat = None
            slot_lt25 = None
            if group_kind == "E":
                m = re.search(r"(Strong|Good|Satisfactory|Weak)", notes)
                slot_cat = m.group(1).lower()
                slot_lt25 = "<2.5yr" in notes
            infra = "Infrastructure" in notes
            # group E* for lending-group SF scenarios (notes carry it)
            ge = re.search(r"E\* = £([0-9.]+)m", notes)
            group_estar = float(ge.group(1)) * 1e6 if ge else None
            yield (
                s["scenario_id"], s["scenario_group"], fw,
                opt(approach, q), CLASS_MAP[s["exposure_class"]],
                d(s["ead"]), opt(s.get("pd"), d), opt(lgd, d),
                opt(s.get("maturity"), d), opt(seniority, q),
                opt(size_m, d), opt(slot_cat, q),
                opt(slot_lt25, lambda b: "true" if b else "false"),
                "true" if infra else "false", opt(group_estar, d),
                d(s["risk_weight"]), d(s["supporting_factor"]),
                d(s["rwa_after_sf"]))


HEADER = '''package graft.acceptance

/** Engine-independent acceptance scenarios, translated programmatically
  * from the reference's published expected outputs
  * (`tests/expected_outputs/crr/expected_rwa_crr.json`,
  * `tests/expected_outputs/basel31/expected_rwa_b31.json`) by
  * `tools/gen_acceptance_fixtures.py`. Regenerate with that script —
  * never edit by hand.
  *
  * Covered groups: CRR-B / B31-B (Foundation & Advanced IRB formula),
  * CRR-E (specialised-lending slotting, Art. 153(5) Table 1), CRR-F
  * (SME / infrastructure supporting factors, Art. 501/501a).
  */
final case class AcceptanceScenario(
    id: String, group: String, framework: String, approach: Option[String],
    exposureClass: String, ead: Double, pd: Option[Double],
    lgd: Option[Double], maturity: Option[Double], seniority: Option[String],
    smeSizeMetricM: Option[Double], slotCategory: Option[String],
    slotMaturityLt25: Option[Boolean], infrastructure: Boolean,
    groupEstar: Option[Double], rwExpected: Double, sfExpected: Double,
    rwaExpected: Double)

object AcceptanceFixtures {
  val scenarios: Seq[AcceptanceScenario] = Seq(
'''

lines = []
for r in rows():
    (sid, grp, fw, app, cls, ead, pd, lgd, mat, sen, size, cat, lt25,
     infra, ge, rw, sf, rwa) = r
    lines.append(
        f'    AcceptanceScenario("{sid}", "{grp}", "{fw}", {app}, "{cls}",\n'
        f'      {ead}, {pd}, {lgd}, {mat}, {sen},\n'
        f'      {size}, {cat}, {lt25}, {infra}, {ge},\n'
        f'      {rw}, {sf}, {rwa})')

out = HEADER + ",\n".join(lines) + ")\n}\n"
path = "/root/repo/src/test/scala/graft/acceptance/AcceptanceFixtures.scala"
with open(path, "w") as f:
    f.write(out)
print(f"wrote {path}: {len(lines)} scenarios")
