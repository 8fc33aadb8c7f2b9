"""Regenerate the registry-inventory counts in COVERAGE.md and README.md
from the live registry (``queries.load_all``) so the documented numbers can
never drift again (VERDICT r5 #8: COVERAGE said 145, README 176, actual
177). ``tests/test_oracle_parity.py::test_doc_counts_match_registry`` pins
the docs to the registry; run this after registering a query:

    python scripts/update_counts.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_spain_mobility_spark.queries import load_all

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The doc patterns the counts live in (whitespace-tolerant: both files
# hard-wrap). Kept in one module so the test and the updater can't skew.
COVERAGE_PAT = re.compile(
    r"Current registry: (\d+)\s+queries \((\d+) singles \+ (\d+) canonicalized\s+suite bundles\)"
)
README_PAT = re.compile(
    r"\*\*(\d+) registry queries — (\d+) singles \+ (\d+) suite\s+bundles"
)


def counts() -> tuple[int, int, int]:
    reg = load_all()
    total = len(reg)
    suites = sum(1 for n in reg if n.endswith("_suite"))
    return total, total - suites, suites


def _rewrite(path: str, pat: re.Pattern, repl_fn) -> bool:
    with open(path) as f:
        text = f.read()
    new, n = pat.subn(repl_fn, text)
    if n != 1:
        raise SystemExit(f"{path}: expected exactly 1 count marker, found {n}")
    if new != text:
        with open(path, "w") as f:
            f.write(new)
        return True
    return False


def main() -> None:
    total, singles, suites = counts()
    changed = _rewrite(
        os.path.join(REPO, "COVERAGE.md"),
        COVERAGE_PAT,
        lambda m: (
            f"Current registry: {total}\nqueries ({singles} singles + {suites} canonicalized\nsuite bundles)"
            if "\n" in m.group(0)
            else f"Current registry: {total} queries ({singles} singles + {suites} canonicalized suite bundles)"
        ),
    )
    changed |= _rewrite(
        os.path.join(REPO, "README.md"),
        README_PAT,
        lambda m: f"**{total} registry queries — {singles} singles + {suites} suite\nbundles",
    )
    print(f"registry: {total} ({singles} singles + {suites} suites); "
          + ("docs updated" if changed else "docs already current"))


if __name__ == "__main__":
    main()
