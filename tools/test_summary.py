#!/usr/bin/env python3
"""Archive a per-round sbt test summary as TESTS_r{N}.json.

Parses the JUnit XML under target/test-reports (written by the most recent
`sbt test`) into suite/test/failure counts with the run timestamp and the
current git HEAD, so the round artifacts carry auditable test evidence
instead of an untracked directory's mtimes.

Usage: python3 tools/test_summary.py <round-number>  (run right after `sbt test`)
"""
import json
import re
import subprocess
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

def main():
    rnd = int(sys.argv[1])
    root = Path(__file__).resolve().parents[1]
    reports = sorted((root / "target" / "test-reports").glob("*.xml"))
    if not reports:
        sys.exit("no reports under target/test-reports — run `sbt test` first")
    suites = []
    totals = {"tests": 0, "failures": 0, "errors": 0, "skipped": 0}
    latest_ts = ""
    for xmlf in reports:
        s = ET.parse(xmlf).getroot()
        if s.tag != "testsuite":
            s = s.find("testsuite")
        rec = {
            "suite": s.get("name"),
            "tests": int(s.get("tests", 0)),
            "failures": int(s.get("failures", 0)),
            "errors": int(s.get("errors", 0)),
            "skipped": int(s.get("skipped", 0)),
            "time_s": round(float(s.get("time", 0)), 2),
        }
        suites.append(rec)
        for k in totals:
            totals[k] += rec[k]
        latest_ts = max(latest_ts, s.get("timestamp") or "")
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=root,
                          capture_output=True, text=True).stdout.strip()
    # the r10 process defect: git_head must be the commit the reports were
    # actually produced at — refuse to stamp if any tracked source is newer
    # than the newest report (tests were not re-run after a code change)
    newest_report = max(x.stat().st_mtime for x in reports)
    stale = [str(p.relative_to(root)) for p in
             list((root / "src").rglob("*.scala"))
             if p.stat().st_mtime > newest_report]
    if stale:
        sys.exit(f"reports are STALE: {len(stale)} source files changed after "
                 f"the last `sbt test` (e.g. {stale[0]}) — re-run `sbt test` "
                 "at this HEAD before stamping")
    dirty = subprocess.run(["git", "status", "--porcelain", "src"], cwd=root,
                           capture_output=True, text=True).stdout.strip()
    # the r12 verdict's README-drift rule: the README's headline counts must
    # match reality at stamp time, or the stamp refuses (same discipline as
    # the stale-reports guard above)
    readme = (root / "README.md").read_text()
    m = re.search(r"Current state: (\d+) contract queries", readme)
    n_queries = len(re.findall(r'^\s*"[a-z0-9_]+" -> \(\(', (
        root / "src/main/scala/graft/SparkEntry.scala").read_text(), re.M))
    if m and int(m.group(1)) != n_queries:
        sys.exit(f"README drift: 'Current state: {m.group(1)} contract queries' "
                 f"but SparkEntry registers {n_queries} — restamp README.md")
    m = re.search(r"sbt test\s+# (\d+) tests / (\d+) suites", readme)
    if m and (int(m.group(1)) != totals["tests"] or int(m.group(2)) != len(suites)):
        sys.exit(f"README drift: 'sbt test # {m.group(1)} tests / {m.group(2)} "
                 f"suites' but this run has {totals['tests']} tests / "
                 f"{len(suites)} suites — restamp README.md")
    out = {
        "round": rnd,
        "run_ts": latest_ts,
        "git_head": head,
        "worktree_dirty": bool(dirty),
        "n_suites": len(suites),
        **totals,
        "suites": suites,
    }
    path = root / f"TESTS_r{rnd:02d}.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"{path.name}: {len(suites)} suites / {totals['tests']} tests / "
          f"{totals['failures'] + totals['errors']} failures @ {latest_ts}")


if __name__ == "__main__":
    main()
