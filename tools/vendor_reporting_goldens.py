#!/usr/bin/env python3
"""Vendor the reference's reporting golden frames as test resources.

The reference freezes its COREP / Pillar 3 template surface per scenario
portfolio as NDJSON frames + a manifest (engine-independent EXPECTED-OUTPUT
DATA, `tests/expected_outputs/reporting/<scenario>/`). The replay spec
(`graft.acceptance.ReportingGoldenSpec`) compares the Spark-built frames
against these. This tool copies the ndjson + manifest of the scenarios the
spec replays into `src/test/resources/reporting_goldens/<scenario>/` so the
spec needs no reference checkout at run time.

Regenerate with:

    python3 tools/vendor_reporting_goldens.py [scenario ...]
"""
import shutil
import sys
from pathlib import Path

REF = Path("/root/reference/tests/expected_outputs/reporting")
DST = Path(__file__).resolve().parent.parent / "src/test/resources/reporting_goldens"

DEFAULT_SCENARIOS = ["sa_classes_crr", "sa_classes_b31"]


def vendor(scenario: str) -> None:
    src = REF / scenario
    if not src.is_dir():
        raise SystemExit(f"unknown scenario: {scenario}")
    dst = DST / scenario
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    for f in sorted(src.iterdir()):
        if f.suffix in (".ndjson", ".json"):
            shutil.copyfile(f, dst / f.name)
            n += 1
    print(f"{scenario}: {n} files -> {dst}")


if __name__ == "__main__":
    for s in sys.argv[1:] or DEFAULT_SCENARIOS:
        vendor(s)
