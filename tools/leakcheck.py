#!/usr/bin/env python3
"""Self-proving leak scan.

Greps the tracked source tree for internal/proprietary references (the same
seven categories the round artifacts have always carried) and writes
LEAKCHECK.json including `run_ts` and `input_digest` — a sha256 over every
scanned (path, content) pair in sorted order — so a later reader can re-run
the scan and verify the artifact matches the tree byte-for-byte instead of
trusting file mtimes.

Usage: python3 tools/leakcheck.py <round-number> [repo-root]
"""
import hashlib
import json
import re
import subprocess
import sys
import time
from pathlib import Path

# Category -> regex. Everything in this engine derives from public knowledge
# (Apache Spark, WMO/CCSDS specs, the public reference repo), so ANY match is
# a finding; there is no allowlist to maintain.
PATTERNS = {
    # imports of non-public namespaces (org.apache.* `internal` packages are
    # public Spark API surface, not a leak)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.)\S*\b(internal|proprietary|corp)\b",
        re.I | re.M),
    # URLs that point inside a private network
    "internal-url": re.compile(
        r"https?://[\w.-]*\b(corp|internal|intranet|vpn)\b[\w./-]*", re.I),
    # library coordinates outside the sanctioned build.sbt set
    "internal-pkg2": re.compile(
        r"\"[\w.-]+\.(corp|internal)[\w.-]*\"\s*%+\s*\"", re.I),
    # cloud bucket URIs (the engine's object store is filesystem-backed;
    # a real bucket reference has no business in this tree)
    "internal-bucket": re.compile(r"\b(s3|gs|abfss|wasbs)://[\w./-]+", re.I),
    # chat/workspace links
    "slack-link": re.compile(r"\b[\w-]+\.slack\.com|slack://", re.I),
    # credential shapes
    "api-key": re.compile(
        r"\b(sk|pk)-[A-Za-z0-9]{20,}|\bAKIA[0-9A-Z]{16}\b|"
        r"api[_-]?key\s*[:=]\s*['\"][A-Za-z0-9]{8,}", re.I),
    # internal-scheduler environment variables
    "axon-env": re.compile(r"\bAXON_[A-Z0-9_]+\b"),
}

SCAN_SUFFIXES = {".scala", ".py", ".sbt", ".md", ".sql", ".json", ".conf", ".properties"}
SKIP_NAMES = {"LEAKCHECK.json", "VERDICT.md", "ADVICE.md"}  # judge-authored / self


def tracked_files(root: Path):
    out = subprocess.run(["git", "ls-files"], cwd=root, capture_output=True,
                         text=True, check=True).stdout.splitlines()
    for rel in sorted(out):
        p = root / rel
        if p.name in SKIP_NAMES or p.name == "leakcheck.py":
            continue
        if p.suffix in SCAN_SUFFIXES and p.is_file():
            yield rel, p


def main():
    rnd = int(sys.argv[1])
    root = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(__file__).resolve().parents[1]
    digest = hashlib.sha256()
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    for rel, p in tracked_files(root):
        data = p.read_bytes()
        digest.update(rel.encode() + b"\0" + data + b"\0")
        n_files += 1
        text = data.decode("utf-8", errors="replace")
        for cat, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{rel}:{line}: {m.group(0)[:80]}")
    result = {
        "round": rnd,
        "run_ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "input_digest": f"sha256:{digest.hexdigest()}",
        "n_files_scanned": n_files,
        "generator": "tools/leakcheck.py",
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (root / "LEAKCHECK.json").write_text(json.dumps(result, indent=2) + "\n")
    print(f"LEAKCHECK.json: {result['n_hits']} hits over {n_files} files, "
          f"digest {result['input_digest'][:23]}…")


if __name__ == "__main__":
    main()
