#!/usr/bin/env python
"""Dump the formatted physical plan of every bench headline query to
PLANS.md — a reviewable snapshot of scan pruning, pushed filters, join
strategies, and exchange counts without running anything.

Usage: python tools/dump_plans.py [--sf-dir /root/testdata/sf0.001] [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Plans are snapshotted under the ENGINE default shuffle partitioning, not
# the bench session's local-mode tuning (bench.py setdefaults
# SPARK_GRAFT_SHUFFLE=16 at import — pin the default before importing it).
os.environ.setdefault(
    "SPARK_GRAFT_SHUFFLE", os.environ.get("SPARK_GRAFT_CPUS", "32")
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="PLANS.md")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entry
    from datapipeline_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    qs = entry.queries()

    lines = [
        "# Physical plan snapshot",
        "",
        f"`executedPlan` of every bench headline query at `{args.sf_dir}`",
        "(regenerate: `python tools/dump_plans.py`). Shuffle count excludes",
        "BroadcastExchange; AQE may further coalesce at runtime.",
        "",
    ]
    for name in bench.HEADLINE:
        df = qs[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        shuffles = len(re.findall(r"(?<!Broadcast)Exchange", plan))
        broadcasts = plan.count("BroadcastExchange")
        lines += [
            f"## {name}",
            "",
            f"shuffle exchanges: {shuffles} · broadcast exchanges: {broadcasts}",
            "",
            "```",
            plan.rstrip(),
            "```",
            "",
        ]
    Path(args.out).write_text("\n".join(lines), encoding="utf-8")
    print(f"wrote {args.out}: {len(bench.HEADLINE)} plans")


if __name__ == "__main__":
    main()
