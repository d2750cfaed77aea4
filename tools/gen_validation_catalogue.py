#!/usr/bin/env python3
"""Generate src/main/scala/graft/rulebook/ValidationCatalogueData.scala.

Transforms the reference's two published supervisory rule catalogues
(reference `reporting/validations/rules/crr-eba-v3.0-credit-risk.json`,
1,011 records, and `basel31-boe-v4.0.0-credit-risk.json`, 820 records —
machine-readings of the EBA's and the PRA/BoE's PUBLISHED validation-rule
workbooks) into a compact tab-separated representation embedded as chunked
string constants (the JVM caps one string constant at 64 KiB).

The representation keeps only the fields the Scala engine consumes:
  catalogue  id  severity  live  tables(;)  rows_scope  rows(;)
  cols_scope  cols(;)  sheets_scope  sheets(;)  arithmetic  missing  formula
  prereqs(;)  scopes
Formula text is normalised to a single line (the grammar is whitespace-
insensitive). Everything else (narratives, change history, error-message
templates) is dropped — this is a data TRANSLATION, not a file copy.

Fidelity notes (round 15, the known-breaks replay):
- `live` is the reference's `is_currently_enforced` (reference
  `validations/rules.py::is_currently_enforced`): live OR reactivated_on,
  excluding deleted — 741 EBA rules, not the 588 that `status == live`
  alone yields (153 were deactivated then reactivated).
- BoE arithmetic is recovered from the RAW expression's `i=`-style
  interval operators (`rules.py::_boe_arithmetic`): 654 interval, the
  rest point. A point rule compares EXACTLY — boe_b0752's float-dust
  break only reproduces under point comparison.
- BoE missing policy is the XBRL `dv:` default-value token in the raw
  expression (`rules.py::_parse_boe_rule`): dv present → treat-as-zero,
  absent → do-not-run.
- `prereqs` carries the EBA prerequisite table conjunction; `scopes`
  carries the BoE per-table scope(...) groups as
  `table~rows_scope~rows~cols_scope~cols~sheets_scope~sheets` joined by
  `^` (EBA rules leave it empty — their single scope is fields 5-10).
  The legacy fields 5-10 keep their previous values so q159's domain
  catalogue estate is unchanged by this regeneration.

Usage: python3 tools/gen_validation_catalogue.py
"""
import json
import os
import re

BASE = "/root/reference/src/rwa_calc/reporting/validations/rules/"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/scala/graft/rulebook/ValidationCatalogueData.scala")

ARITH = {"Interval": "I", "interval": "I", "Point": "P", "Mixed": "M"}
MISSING = {"treat as zero/empty string": "Z", "do not run rule": "X"}

BOE_INTERVAL = re.compile(r"(?<![A-Za-z0-9_])i\s*(?:=|>=|<=|>|<)")
BOE_SCOPE_GROUP = re.compile(r"\{([^{}]*)\}")
BOE_SCOPE_KEY = re.compile(r"\b([a-z]+)\s*:\s*([^,}]*)")


def norm(s):
    if s is None:
        return ""
    return " ".join(str(s).split()).replace("\t", " ")


def enforced(r):
    st = tuple(r["status"])
    if "deleted" in st:
        return False
    return st == ("live",) or r.get("reactivated_on") is not None


def crr_lines():
    d = json.load(open(BASE + "crr-eba-v3.0-credit-risk.json"))
    for r in d["rules"]:
        live = "1" if enforced(r) else "0"
        prereqs = [t.strip() for t in re.split(r"\s+and\s+",
                   r.get("prerequisites") or "", flags=re.I) if t.strip()]
        yield "\t".join([
            "crr", r["id"], r["severity"], live,
            ";".join(r["tables"] or []),
            r["rows_scope"], ";".join(r["rows"] or []),
            r["columns_scope"], ";".join(r["columns"] or []),
            r["sheets_scope"], ";".join(r["sheets"] or []),
            ARITH.get(norm(r.get("arithmetic_approach")), "-"),
            MISSING.get(norm(r.get("if_value_missing")), "-"),
            norm(r["formula"]),
            ";".join(prereqs),
            "",  # EBA: the single scope is fields 5-10
        ])


def boe_scopes(scope):
    """scope({t: T, r:..., c:..., z:...}, ...) -> per-table groups."""
    if not scope:
        return ""
    groups = []
    for group in BOE_SCOPE_GROUP.findall(scope):
        keys = {k: v.strip() for k, v in BOE_SCOPE_KEY.findall(group)}
        t = keys.get("t")
        if not t:
            continue
        def axis(v):
            ids = [x.strip() for x in (v or "").split(";") if x.strip()]
            return ("list", ";".join(ids)) if ids else ("none", "")
        rs, rv = axis(keys.get("r"))
        cs, cv = axis(keys.get("c"))
        ss, sv = axis(keys.get("z"))
        groups.append("~".join([t, rs, rv, cs, cv, ss, sv]))
    return "^".join(groups)


def b31_lines():
    d = json.load(open(BASE + "basel31-boe-v4.0.0-credit-risk.json"))
    for r in d["rules"]:
        live = "1" if enforced(r) else "0"
        raw = r.get("expression_raw") or ""
        # where/precondition would need constructs the engine refuses by
        # name — mark via missing="W" (none carry one in this extract).
        blocked = r.get("where") or r.get("precondition") or r.get("precondition_raw")
        yield "\t".join([
            "b31", r["id"], r["severity"], live,
            ";".join(r["tables"] or []),
            "none", "", "none", "", "none", "",
            "I" if BOE_INTERVAL.search(raw) else "P",
            "W" if blocked else ("Z" if "dv:" in raw else "X"),
            norm(r.get("expression")),
            "",
            boe_scopes(r.get("scope")),
        ])


def main():
    lines = list(crr_lines()) + list(b31_lines())
    chunks, cur, cur_len = [], [], 0
    for ln in lines:
        n = len(ln.encode("utf-8")) + 1
        if cur_len + n > 58000:
            chunks.append("\n".join(cur))
            cur, cur_len = [], 0
        cur.append(ln)
        cur_len += n
    if cur:
        chunks.append("\n".join(cur))

    defs = []
    for i, ch in enumerate(chunks):
        assert '"""' not in ch and "\\" not in ch
        defs.append('  private val c%d: String = """%s"""' % (i, ch))
    body = "\n\n".join(defs)
    names = ", ".join("c%d" % i for i in range(len(chunks)))
    scala = f'''package graft.rulebook

/** GENERATED by tools/gen_validation_catalogue.py — do not edit by hand.
  *
  * The reference's two published supervisory validation-rule catalogues
  * (reference `reporting/validations/rules/crr-eba-v3.0-credit-risk.json`
  * — the EBA v3.0(3.0.1) credit-risk extract, 1,011 records — and
  * `basel31-boe-v4.0.0-credit-risk.json` — the PRA/BoE Banking taxonomy
  * extract, 820 records) translated to a compact tab-separated encoding:
  * one record per line, fields
  * catalogue, id, severity, live, tables, rows_scope, rows, cols_scope,
  * cols, sheets_scope, sheets, arithmetic(I/P/M/-), missing(Z/X/W/-),
  * formula. Chunked because the JVM caps a string constant at 64 KiB.
  */
object ValidationCatalogueData {{
{body}

  /** All records, one line each. */
  def lines: Iterator[String] =
    Seq({names}).iterator.flatMap(_.linesIterator).filter(_.nonEmpty)
}}
'''
    with open(OUT, "w") as f:
        f.write(scala)
    print(f"wrote {OUT}: {len(lines)} records, {len(chunks)} chunks")


if __name__ == "__main__":
    main()
