#!/usr/bin/env python
"""Doc-drift guard: the README's load-bearing counts must match the code
and committed artifacts at head (rounds 4 and 5 both shipped stale
numbers; this greps the claims so the drift class dies).

Checks (README.md):
- "`queries()` — N operator"      vs len(__spark_entry__.queries())
- "all but two as DuckDB oracles" vs len(queries) - len(oracle_sql())
- "the M-query headline set"      vs len(bench.HEADLINE)
- "# K tests"                     vs pytest --collect-only count
- "aggregate R x vs DuckDB"        vs BENCH_vs_duckdb.json aggregate_ratio

Usage: python tools/check_doc_counts.py  (exit 1 on any mismatch)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_NUMWORD = {2: "two", 3: "three", 4: "four"}


def main() -> int:
    import bench
    import __spark_entry__ as entry

    readme = open(os.path.join(ROOT, "README.md")).read()
    failures: list[str] = []

    def claim(pattern: str, expected, label: str) -> None:
        m = re.search(pattern, readme)
        if not m:
            failures.append(f"{label}: claim not found (pattern {pattern!r})")
            return
        got = m.group(1)
        # numeric claims compare as numbers ("0.90" in prose must match an
        # artifact value of 0.9); everything else compares as strings
        try:
            equal = float(got) == float(expected)
        except (TypeError, ValueError):
            equal = str(got) == str(expected)
        if not equal:
            failures.append(f"{label}: README says {got!r}, head measures {expected!r}")

    n_queries = len(entry.queries())
    n_rows_only = n_queries - len(entry.oracle_sql())
    claim(r"`queries\(\)` — (\d+) operator", n_queries, "registry size")
    claim(
        r"all but (\w+) as DuckDB oracles",
        _NUMWORD.get(n_rows_only, n_rows_only),
        "rows-only count",
    )
    claim(r"the (\d+)-query headline set", len(bench.HEADLINE), "headline size")

    collected = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, cwd=ROOT,
    )
    m = re.search(r"(\d+) tests collected", collected.stdout)
    if m:
        claim(r"# (\d+) tests", int(m.group(1)), "test count")
    else:
        failures.append("could not collect tests")

    bvd = os.path.join(ROOT, "BENCH_vs_duckdb.json")
    if os.path.exists(bvd):
        ratio = json.load(open(bvd))["aggregate_ratio"]
        n_paired = json.load(open(bvd))["n_queries"]
        claim(r"aggregate ([0-9.]+)x vs DuckDB", f"{ratio:g}", "aggregate ratio")
        claim(r"over all (\d+) paired queries", n_paired, "paired-query count")

    if failures:
        print("DOC DRIFT:", file=sys.stderr)
        for f in failures:
            print(f"  - {f}", file=sys.stderr)
        return 1
    print("doc counts match head")
    return 0


if __name__ == "__main__":
    sys.exit(main())
