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
        (None, "srcA", base, "en"),                          # null id
        (1, "srcA", base, "en"),                             # exact dup text
        (2, "srcB", base + " extra tail words here now ok fine yes", "en"),
        (3, "srcB", "café naïve résumé " + base, None),      # non-ASCII, null lang
        (3, "srcC", "duplicate id row " + base, "de"),       # dup id
        (None, "srcC", None, None),                          # null id + text
        (4, None, "null source row " + base, "en"),          # null source
        # PAIRS of degenerate texts (round 18): two empty-text docs and a
        # second null-text doc. Spark's shingles() maps both null and ''
        # to [""], so an unfiltered LSH tier would pair them at jaccard
        # 1.0 while DuckDB's NULL propagation drops the pair — the q61
        # containment divergence needs >= 2 such docs to manifest.
        (5, "srcD", "", "en"),                               # empty text
        (6, "srcD", None, "de"),                             # 2nd null text
        (7, "srcD", "", None),                               # 2nd empty text
    ]
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, "
                "text VARCHAR, lang VARCHAR, n_chars BIGINT)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?, ?, length(coalesce(?, '')))",
        [(r[0], r[1], r[2], r[3], r[2]) for r in rows])
    con.execute(
        f"COPY documents TO '{out_dir}/documents.parquet' (FORMAT PARQUET)")
    # adversarial embeddings: null vec_id, null embedding, zero vector
    # (norm 0 -> ANSI divide-by-zero unless guarded), duplicate id, and
    # 16-dim vectors (shorter than the LSH band span). Round-11 catches:
    # Similarity.scorable hygiene, q71 label fan-out, try_element_at
    # banding, q119 null-code ranking.
    import random
    random.seed(7)
    erows = [(i, [round(random.uniform(-1, 1), 3) for _ in range(16)], i % 4)
             for i in range(40)]
    erows += [(None, [0.5] * 16, 1), (100, None, 2), (101, [0.0] * 16, 3),
              (5, [round(random.uniform(-1, 1), 3) for _ in range(16)], 0)]
    con.execute("CREATE TABLE embeddings"
                "(vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany("INSERT INTO embeddings VALUES (?,?,?)", erows)
    con.execute(
        f"COPY embeddings TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out_dir}/{t}.parquet")
    print(f"adversarial fixture written to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/advfix")
