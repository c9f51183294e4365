"""Global physical-plan invariants over EVERY bench headline query.

test_plan_quality.py pins per-query shapes; this sweep pins the
scale-killers that must never appear anywhere:

- no CartesianProduct (an accidental cross join is O(n*m) at 100 TB);
- no range partitioning (a global sort cliff — the engine's posture is
  bucketed/two-phase ranking, TakeOrderedAndProject top-k, and hash
  exchanges; any rangepartitioning Exchange is an unreviewed regression);
- no row-at-a-time Python UDFs (BatchEvalPython); Python only ever enters
  through Arrow-batched nodes (mapInPandas / ArrowEvalPython).

Runs at sf0.001 and only compiles plans (no execution), so the whole sweep
is cheap. If a future query legitimately needs one of these shapes, add it
to the explicit allowlist with a comment saying why.
"""

from __future__ import annotations

import pytest

import bench
import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

ALLOW_RANGE_PARTITION: set[str] = set()  # none today; keep it that way
ALLOW_CARTESIAN: set[str] = set()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    qs = entry.queries()
    out = {}
    for name in bench.HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        out[name] = _plan(fn(spark, SF))
    return out


def test_headline_set_is_registered(plans):
    assert len(plans) >= 90  # every HEADLINE name resolved to a query


def test_no_cartesian_product(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p and n not in ALLOW_CARTESIAN]
    assert bad == []


def test_no_range_partitioning(plans):
    bad = [
        n
        for n, p in plans.items()
        if "rangepartitioning" in p.lower().replace(" ", "")
        and n not in ALLOW_RANGE_PARTITION
    ]
    assert bad == []


def test_no_row_at_a_time_python_udf(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert bad == []
