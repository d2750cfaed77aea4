#!/usr/bin/env python3
"""Adversarial documents fixture for cross-engine robustness checks.

Generates a documents.parquet with the degenerate shapes a regenerated
driver fixture could legally contain — null doc_id, null text, duplicate
doc_ids, non-ASCII text — and symlink-copies the remaining harness
tables from sf0.001 so graft.Verify + tools/selfcheck.py run end-to-end:

    python3 tools/gen_adversarial_fixture.py /tmp/advfix
    sbt "runMain graft.Verify /tmp/advfix /tmp/vradv <queries>"
    python3 tools/selfcheck.py /tmp/advfix /tmp/vradv

Round 11 provenance: this fixture caught four latent cross-engine
divergences (q78's '' sentinel lazily cast to BIGINT, missing NULLS
FIRST on the q174/q175 rank windows, q176's byte/char mix + null-
sentinel join fan-out, Dedup.exact null-dropping an all-null-id group)
that the clean generated fixtures could never trigger.
"""
import os, shutil, sys

import duckdb


def main(out_dir: str, sf_dir: str = "/root/testdata/sf0.001") -> None:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    con = duckdb.connect()
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu")
    rows = [
        (None, "srcA", base),                                # null id
        (1, "srcA", base),                                   # exact dup text
        (2, "srcB", base + " extra tail words here now ok fine yes"),
        (3, "srcB", "café naïve résumé " + base),            # non-ASCII
        (3, "srcC", "duplicate id row " + base),             # dup id
        (None, "srcC", None),                                # null id + text
    ]
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)", rows)
    con.execute(
        f"COPY documents TO '{out_dir}/documents.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out_dir}/{t}.parquet")
    print(f"adversarial fixture written to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/advfix")
