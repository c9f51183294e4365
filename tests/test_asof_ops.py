"""Unit tests for as-of join / sessionize / top-k (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from tests.conftest import rows


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


@pytest.fixture()
def left(spark):
    return spark.createDataFrame(
        [("a", _ts(0, 30), 1), ("a", _ts(1, 45), 2), ("a", _ts(5, 0), 3), ("b", _ts(2, 0), 4)],
        "g string, time timestamp, id int",
    )


@pytest.fixture()
def right(spark):
    return spark.createDataFrame(
        [("a", _ts(0, 0), 10.0), ("a", _ts(1, 0), 11.0), ("b", _ts(3, 0), 12.0)],
        "g string, time timestamp, x double",
    )


def test_asof_backward(spark, left, right):
    from datapipeline_spark.operators.asof import asof_join

    got = rows(
        asof_join(left, right, ["g"]).select("g", "id", "x_asof"), "g", "id"
    )
    # a@0:30→10, a@1:45→11, a@5:00→11 (stale but no tolerance), b@2:00→no match yet
    assert got == [("a", 1, 10.0), ("a", 2, 11.0), ("a", 3, 11.0), ("b", 4, None)]


def test_asof_exact_time_matches(spark, right):
    from datapipeline_spark.operators.asof import asof_join

    left = right.sparkSession.createDataFrame(
        [("a", _ts(1, 0), 1)], "g string, time timestamp, id int"
    )
    got = rows(asof_join(left, right, ["g"]).select("x_asof"))
    assert got == [(11.0,)]  # right row at the same instant is visible


def test_asof_tolerance(spark, left, right):
    from datapipeline_spark.operators.asof import asof_join

    got = rows(
        asof_join(left, right, ["g"], tolerance="2h").select("g", "id", "x_asof"),
        "g",
        "id",
    )
    # a@5:00 match at 1:00 is 4h old > 2h → null
    assert got == [("a", 1, 10.0), ("a", 2, 11.0), ("a", 3, None), ("b", 4, None)]


def test_sessionize(spark):
    from datapipeline_spark.operators.asof import sessionize

    df = spark.createDataFrame(
        [
            ("u", _ts(0, 0)),
            ("u", _ts(0, 30)),
            ("u", _ts(3, 0)),  # gap > 1h → new session
            ("u", _ts(3, 30)),
            ("v", _ts(0, 0)),
        ],
        "g string, time timestamp",
    )
    got = rows(sessionize(df, "1h", ["g"]).select("g", "time", "session_id"), "g", "time")
    assert [(g, s) for g, _, s in got] == [
        ("u", 0),
        ("u", 0),
        ("u", 1),
        ("u", 1),
        ("v", 0),
    ]


def test_top_k(spark):
    from datapipeline_spark.operators.asof import top_k

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 9.0), ("a", 3, 7.0), ("b", 4, 1.0)],
        "g string, id int, v double",
    )
    got = rows(
        top_k(df, 2, order_by=["v", "id"], partition_by=["g"]).select("g", "id", "rank"),
        "g",
        "rank",
    )
    assert got == [("a", 2, 1), ("a", 3, 2), ("b", 4, 1)]


def test_top_k_plan_uses_group_limit(spark):
    """Scale check: the physical plan must contain a WindowGroupLimit so only
    per-partition partial top-k rows reach the shuffle."""
    from datapipeline_spark.operators.asof import top_k

    df = spark.range(100).selectExpr("id % 7 g", "id", "cast(id as double) v")
    plan = top_k(df, 3, ["v"], ["g"])._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
