#!/usr/bin/env python3
"""Vendor the reference's supervisory-validation known-breaks register.

`tests/expected_outputs/reporting/validation_known_breaks.json` is the
reference's CURATED liability register — the committed baseline its
supervisory-validation ratchet (tests/acceptance/reporting/
test_supervisory_validations.py) asserts against: every broken published
rule with a written reason, and every emitted-but-unchecked template.

Like the reporting goldens (tools/vendor_reporting_goldens.py), this is
engine-independent curated DATA, not code: the reasons are hand-written
triage records and the break set is the published rules' own verdict over
the reference's output. A translated copy would defeat its purpose — the
replay must match the reference's exact register, reason curation intact.

Usage: python3 tools/vendor_validation_register.py
"""
import shutil
import os

SRC = "/root/reference/tests/expected_outputs/reporting/validation_known_breaks.json"
DST = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/reporting_goldens/validation_known_breaks.json")

shutil.copyfile(SRC, DST)
print(f"vendored {os.path.getsize(DST)} bytes -> {DST}")
