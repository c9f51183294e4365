#!/usr/bin/env python
"""Merge per-query correctness JSONs: later files override earlier keys.

Used when an artifact is produced in two passes at the same effective head
(e.g. a full sweep at commit A plus a targeted re-run of the only queries
whose code changed between A and head B — every other query's code path is
byte-identical, so the merged file is the head-B result set without paying
the full multi-hour sweep twice). The provenance note belongs next to the
artifact (PERFORMANCE.md / README).

Usage: python tools/merge_correctness.py OUT.json pass1.json pass2.json [...]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out, *passes = sys.argv[1:]
    merged: dict = {}
    for p in passes:
        with open(p) as f:
            merged.update(json.load(f))
    rows_only = [k for k, v in merged.items() if v.get("rows_only")]
    fails = [
        k
        for k, v in merged.items()
        if not v.get("rows_only") and not v.get("hash_match")
    ]
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(
        f"{out}: {len(merged)} queries, "
        f"{len(merged) - len(fails) - len(rows_only)} hash-exact, "
        f"{len(rows_only)} rows-only, {len(fails)} FAILED"
    )
    for k in fails:
        print(f"  FAIL: {k} ({merged[k].get('err')})")
    return 0


if __name__ == "__main__":
    main()
