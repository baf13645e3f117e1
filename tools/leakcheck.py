#!/usr/bin/env python3
"""Regenerate LEAKCHECK.json with provenance (VERDICT r5 next #9).

Scans the repo's source, build, and doc files for non-public strings
(internal package imports, URLs, bucket names, slack links, API keys,
internal env vars) and writes LEAKCHECK.json including a timestamp,
tool version, and the scanned commit — so each round's artifact
provably reflects a fresh run rather than a carried-over file.
"""
import json
import re
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

TOOL_VERSION = "1.0"
ROOT = Path(__file__).resolve().parent.parent

# Category -> regex. Public-knowledge allowlist: org.apache.*, scala.*,
# java.*, graft.*, github URLs of public projects cited in docs.
PATTERNS = {
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache|scala\b|scala\.|java\.|javax\.|graft\.|org\.scalatest|org\.scalacheck|org\.slf4j|pyarrow|pandas|duckdb|numpy)(?![\w.]*\.implicits\.)[a-z][\w.]*\.[A-Za-z_]", re.M),
    "internal-url": re.compile(
        r"https?://(?!github\.com|raw\.githubusercontent\.com|[\w.-]*apache\.org|duckdb\.org|arxiv\.org|docs\.oracle\.com|www\.scala-lang\.org|localhost|127\.0\.0\.1|en\.wikipedia\.org|repo1\.maven\.org|www\.w3\.org)[\w.-]+"),
    "internal-pkg2": re.compile(r"\b(?:com|net|io)\.(?!github\b)[a-z][\w]*\.internal\b"),
    "internal-bucket": re.compile(r"\b(?:s3|gs|s3a|s3n)://[\w][\w.-]*"),
    "slack-link": re.compile(r"\b[\w-]*\.slack\.com|slack://|#[a-z0-9-]*claude[a-z0-9-]*"),
    "api-key": re.compile(r"\b(?:sk-[A-Za-z0-9]{16,}|AKIA[A-Z0-9]{16}|ghp_[A-Za-z0-9]{20,})\b"),
    "axon-env": re.compile(r"\b[A-Z][A-Z0-9_]*(?:ANTHROPIC|AXON|INTERNAL_ONLY)[A-Z0-9_]*\b"),
}

SCAN_GLOBS = ["src/**/*.scala", "tools/**/*.py", "*.md", "*.sbt", "project/*.scala", "project/*.sbt"]


def main() -> int:
    hits = {k: [] for k in PATTERNS}
    self_path = Path(__file__).resolve()
    files = sorted({p for g in SCAN_GLOBS for p in ROOT.glob(g)
                    if p.is_file() and p.resolve() != self_path})
    for path in files:
        text = path.read_text(errors="replace")
        for cat, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{path.relative_to(ROOT)}:{line}: {m.group(0)[:80]}")
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                            capture_output=True, text=True).stdout.strip()
    out = {
        "round": int(sys.argv[1]) if len(sys.argv) > 1 else None,
        "generated_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "tool_version": TOOL_VERSION,
        "commit": commit,
        "files_scanned": len(files),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"LEAKCHECK.json: {out['n_hits']} hits over {len(files)} files")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
