#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [q1,q2,...]

The optional third argument is the same comma-separated query-name filter
graft.Verify takes: only those oracle entries are compared (the
adversarial-fixture flow dumps 4 queries, so an unfiltered run would print
4 pass / 148 spurious exec-error fails).

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views of the sfDir
tables, and compares:

  1. column names (sorted),
  2. RESULT TYPES — the arrow type family of each oracle column against the
     Spark parquet schema. An integer column on one side and a decimal or
     floating column on the other is a FAILURE even when every value compares
     equal: the driver's hasher canonicalises a DuckDB HUGEINT/decimal as a
     float ("5.0") while Spark's int64 renders "5", so a value-level == check
     stays green where the driver hashes red (this exact class kept
     q78_sequence_packing red for five rounds — the oracle's window
     sum(BIGINT) is HUGEINT and one derived column escaped its CAST).
     A float-vs-decimal pair is only a WARN: both sides render as floats in
     the driver, so those hash green (six estate queries rely on this).
  3. row count, and values (columns sorted by name, rows sorted, exact match
     for non-floats, bit-exact preferred / 1e-9-relative fallback reported
     for floats).
"""
import json, math, sys
import pandas as pd
import duckdb
import pyarrow.dataset as pads
import pyarrow.types as pt

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def type_family(t):
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return "decimal"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_date(t):
        return "date"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return "list"
    if pt.is_struct(t):
        return "struct"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_null(t):
        # An all-NULL column (arrow null type) carries no type signal —
        # the driver hashes NULLs identically whatever the declared type,
        # so this must not hard-fail against any Spark family.
        return "null"
    return str(t)

# Families whose cross-pairing the driver's hasher tolerates (both fetch as
# Python floats). Everything else cross-family is a hard failure.
_SOFT_PAIRS = {frozenset(("float", "decimal"))}

def type_check(name, spark_schema, oracle_schema):
    """Returns (hard_mismatches, soft_mismatches) as lists of strings."""
    hard, soft = [], []
    ora = {f.name: f.type for f in oracle_schema}
    spk = {f.name: f.type for f in spark_schema}
    for col in sorted(set(ora) & set(spk)):
        fo, fs = type_family(ora[col]), type_family(spk[col])
        if fo == fs:
            continue
        msg = f"{col}: spark {spk[col]} ({fs}) vs oracle {ora[col]} ({fo})"
        if "null" in (fo, fs) or frozenset((fo, fs)) in _SOFT_PAIRS:
            soft.append(msg)
        else:
            hard.append(msg)
    return hard, soft

def cmp_cell(a, b):
    if a is None or b is None:
        return a is None and b is None, a == b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, False
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        exact = fa == fb
        close = exact or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return close, exact
    return a == b, a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3 and sys.argv[3].strip():
        only = {q.strip() for q in sys.argv[3].split(",") if q.strip()}
        unknown = only - set(oracle)
        if unknown:
            print(f"WARN: filter names not in oracle_sql.json: {sorted(unknown)}")
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pads.dataset(f"{out_dir}/{name}", format="parquet")
            # BOTH sides go arrow -> pandas so NULL gets ONE representation
            # per dtype (a null bool is None via arrow but NaN via duckdb's
            # fetchdf — an asymmetry that false-failed 7 green queries and
            # cascaded into row-sort misalignment).
            got = spark_tbl.to_table().to_pandas()
            exp_rel = con.execute(sql)
            exp_arrow = exp_rel.fetch_arrow_table()
            exp = exp_arrow.to_pandas()
            # The driver's hasher canonicalises DECIMAL as float; arrow's
            # to_pandas instead yields object columns of Decimal with None
            # for NULL — coerce decimal columns (either side) to float64 on
            # BOTH sides so NULL is NaN everywhere and values compare as the
            # driver sees them.
            dec_cols = (
                {f.name for f in exp_arrow.schema if pt.is_decimal(f.type)} |
                {f.name for f in spark_tbl.schema if pt.is_decimal(f.type)})
            for c in dec_cols:
                if c in got.columns:
                    got[c] = pd.to_numeric(got[c], errors="coerce")
                if c in exp.columns:
                    exp[c] = pd.to_numeric(exp[c], errors="coerce")
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}")
            n_fail += 1
            continue
        hard, soft = type_check(name, spark_tbl.schema, exp_arrow.schema)
        if hard:
            print(f"FAIL {name}: result-type mismatch (driver-hash-red even if "
                  f"values match): {hard}")
            n_fail += 1
            continue
        g = got[gc].values.tolist()
        x = exp[ec].values.tolist()
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(x)}")
            n_fail += 1
            continue
        key = lambda r: [str(v) for v in r]
        g.sort(key=key); x.sort(key=key)
        bad = []
        inexact = 0
        for i, (rg, rx) in enumerate(zip(g, x)):
            for j, (a, b) in enumerate(zip(rg, rx)):
                ok, exact = cmp_cell(a, b)
                if not ok:
                    bad.append((i, gc[j], a, b))
                elif not exact:
                    inexact += 1
        if bad:
            print(f"FAIL {name}: {len(bad)} cell diffs, e.g. {bad[:3]}")
            n_fail += 1
        else:
            tags = []
            if inexact:
                tags.append(f"WARN {inexact} cells close-not-bitexact")
            if soft:
                tags.append(f"WARN soft type pairs {soft}")
            tag = "" if not tags else "  [" + "; ".join(tags) + "]"
            print(f"PASS {name}: {len(g)} rows{tag}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
