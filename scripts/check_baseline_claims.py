"""Claim-to-artifact hygiene check for BASELINE.md (judge r3 ask #9).

Every `results/...` path cited in BASELINE.md must be a git-TRACKED file —
"verified by X" sentences that cite an artifact nobody committed are exactly
how round 3 shipped two false claims (the lottery-verification prose).  A
citation is exempt only when its line explicitly says the artifact does not
exist yet (markers: absent / queued / pending / never ran / wiped /
not yet).

Usage: python scripts/check_baseline_claims.py  (exit 1 on violations)
Also collected by pytest via tests/test_baseline_claims.py.
"""
from __future__ import annotations

import itertools
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXEMPT_MARKERS = ("absent", "queued", "pending", "never ran", "wiped",
                  "not yet", "missing")
CITE_RE = re.compile(r"results/[A-Za-z0-9_.{},*/-]+")


def _expand_braces(path: str) -> list[str]:
    m = re.search(r"\{([^}]*)\}", path)
    if not m:
        return [path]
    pre, post = path[: m.start()], path[m.end():]
    return [
        x
        for alt in m.group(1).split(",")
        for x in _expand_braces(pre + alt + post)
    ]


def check(baseline_path: str | None = None) -> list[str]:
    """Returns a list of violation strings (empty = clean)."""
    baseline_path = baseline_path or os.path.join(REPO, "BASELINE.md")
    tracked = set(
        subprocess.run(
            ["git", "ls-files"], cwd=REPO, capture_output=True, text=True
        ).stdout.splitlines()
    )
    violations = []
    with open(baseline_path) as fh:
        for lineno, line in enumerate(fh, 1):
            cites = CITE_RE.findall(line)
            if not cites:
                continue
            low = line.lower()
            if any(m in low for m in EXEMPT_MARKERS):
                continue
            for cite in cites:
                cite = cite.rstrip(".,;:")
                for path in _expand_braces(cite):
                    if path.endswith("*") or path.endswith("/"):
                        prefix = path.rstrip("*")
                        if not any(t.startswith(prefix) for t in tracked):
                            violations.append(
                                f"line {lineno}: no tracked file matches "
                                f"'{path}'")
                        continue
                    if path in tracked:
                        continue
                    # a cited directory counts if any tracked file is inside
                    if any(t.startswith(path + "/") for t in tracked):
                        continue
                    # citations of bare basenames inside tracked dirs are
                    # already covered; everything else is a violation
                    violations.append(
                        f"line {lineno}: cited artifact '{path}' is not "
                        f"committed (mark the line absent/queued/pending or "
                        f"git add -f it)")
    return violations


def main() -> int:
    violations = check()
    if violations:
        print("BASELINE.md claim-to-artifact violations:", file=sys.stderr)
        for v in violations:
            print(f"  {v}", file=sys.stderr)
        return 1
    print("BASELINE.md: every cited results/ artifact is committed (or "
          "explicitly marked not-yet-existing)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
