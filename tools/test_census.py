#!/usr/bin/env python3
"""Regenerate SURVEY.md's test census from an sbt test log (round-15
verdict item: the suite/test counts must come from the artifact of
record, not hand-counting).

Usage: tools/test_census.py <sbt-test-log>

Parses the LAST ScalaTest run summary in the log:
    [info] Total number of tests run: N
    [info] Suites: completed M, aborted A
    [info] Tests: succeeded S, failed F, ...
and rewrites the line between the CENSUS markers in SURVEY.md:
    <!-- TEST_CENSUS --> ... <!-- /TEST_CENSUS -->
"""
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    log = Path(sys.argv[1]).read_text(errors="replace")
    runs = re.findall(
        r"Total number of tests run: (\d+)\s*\n"
        r".*?Suites: completed (\d+), aborted (\d+)\s*\n"
        r".*?Tests: succeeded (\d+), failed (\d+), canceled (\d+)",
        log,
    )
    if not runs:
        print("no ScalaTest run summary found in log", file=sys.stderr)
        return 1
    total, suites, aborted, ok, failed, canceled = (int(x) for x in runs[-1])
    census = (
        f"full suite {ok}/{total} green across {suites} suites"
        + (f" ({aborted} aborted)" if aborted else "")
        + (f", {failed} FAILED" if failed else "")
        + (f" ({canceled} env-gated tier canceled by design)" if canceled else "")
    )
    survey = REPO / "SURVEY.md"
    text = survey.read_text()
    pattern = re.compile(r"<!-- TEST_CENSUS -->.*?<!-- /TEST_CENSUS -->", re.S)
    if not pattern.search(text):
        print("SURVEY.md has no TEST_CENSUS markers", file=sys.stderr)
        return 1
    survey.write_text(
        pattern.sub(f"<!-- TEST_CENSUS -->{census}<!-- /TEST_CENSUS -->", text)
    )
    print(census)
    return 0


if __name__ == "__main__":
    sys.exit(main())
