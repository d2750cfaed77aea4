#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views of the sfDir
tables, and compares: schema (column names), row count, and values (columns
sorted by name, rows sorted, exact match for non-floats, bit-exact preferred
/ 1e-9-relative fallback reported for floats).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

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
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}")
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
            tag = "" if inexact == 0 else f"  [WARN {inexact} cells close-not-bitexact]"
            print(f"PASS {name}: {len(g)} rows{tag}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
