"""Reference unit-test values ported verbatim (SURVEY.md §5 strategy).

Every expected value below is copied from the reference's unit tests so the
Spark operators reproduce the iterator runtime's exact semantics:
- tests/unit/transforms/test_stream_rolling.py
- tests/unit/transforms/test_stream_rolling_slope.py
- tests/unit/transforms/test_stream_forward_sum.py
- tests/unit/transforms/test_stream_fill_dedupe.py
- tests/unit/transforms/test_stream_logarithm.py
- tests/unit/pipeline/test_split_labelers.py
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone
from statistics import linear_regression, pstdev, stdev

import pytest

from pyspark.sql import functions as F


def _frame(spark, values, partitions=None):
    """values (float|None)[] → df(part, time, value) with sequential hourly
    times inside each partition (the canonical order)."""
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = []
    counters: dict[str, int] = {}
    for i, v in enumerate(values):
        p = partitions[i] if partitions else "A"
        k = counters.get(p, 0)
        counters[p] = k + 1
        rows.append((p, t0 + timedelta(hours=k), float(v) if v is not None else None))
    return spark.createDataFrame(rows, "part string, time timestamp, value double")


def _out(df, col="out"):
    return [r[col] for r in df.orderBy("part", "time").collect()]


# ----------------------------------------------------------------- rolling


@pytest.mark.parametrize(
    ("values", "statistic", "window", "min_samples", "expected"),
    [
        # test_rolling_pstdev_matches_statistics_pstdev
        (
            [0.01, 0.02, -0.01, 0.03],
            "pstdev",
            3,
            3,
            [None, None, pstdev([0.01, 0.02, -0.01]), pstdev([0.02, -0.01, 0.03])],
        ),
        # test_rolling_pstdev_of_one_sample_is_zero
        ([1e12], "pstdev", 3, 1, [0.0]),
        # test_rolling_stdev_matches_statistics_stdev
        ([1.0, 2.0, 4.0], "stdev", 3, 3, [None, None, stdev([1.0, 2.0, 4.0])]),
        # test_rolling_stdev_respects_missing_values_and_min_samples
        ([1.0, None, 3.0], "stdev", 3, 2, [None, None, stdev([1.0, 3.0])]),
        # test_rolling_extrema_match_window
        ([10.0, 8.0, 12.0, 9.0], "max", 3, 3, [None, None, 12.0, 12.0]),
        ([10.0, 8.0, 12.0, 9.0], "min", 3, 3, [None, None, 8.0, 8.0]),
        # test_rolling_missing_ticks_expire_valid_values
        ([1.0, 2.0, None, None, 3.0], "mean", 3, 2, [None, 1.5, 1.5, None, None]),
        # test_rolling_default_minimum_requires_a_full_valid_window
        ([1.0, None, 3.0, 4.0], "mean", 3, None, [None, None, None, None]),
        # test_rolling_extrema_preserve_duplicates
        ([5.0, 5.0, 1.0, 1.0, 1.0], "max", 3, 3, [None, None, 5.0, 5.0, 1.0]),
        ([5.0, 5.0, 1.0, 1.0, 1.0], "min", 3, 3, [None, None, 1.0, 1.0, 1.0]),
    ],
)
def test_rolling_reference_values(spark, values, statistic, window, min_samples, expected):
    from datapipeline_spark.operators.window import rolling

    df = _frame(spark, values)
    got = _out(rolling(df, "value", window, statistic, min_samples, ["part"], out="out"))
    assert got == pytest.approx(expected)


def test_rolling_resets_state_between_partitions(spark):
    # test_rolling_resets_state_between_partitions: [1,3 | 10,30], w2 ms2
    from datapipeline_spark.operators.window import rolling

    df = _frame(spark, [1.0, 3.0, 10.0, 30.0], ["A", "A", "B", "B"])
    got = _out(rolling(df, "value", 2, "mean", 2, ["part"], out="out"))
    assert got == [None, 2.0, None, 20.0]


# ------------------------------------------------------------ rolling_slope


def test_rolling_slope_computes_y_on_x(spark):
    # y = 2x + 3, window 3 → [None, None, 2.0, 2.0]
    from datapipeline_spark.operators.window import rolling_slope

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [("A", t0 + timedelta(days=x), float(x), 2.0 * x + 3) for x in range(4)]
    df = spark.createDataFrame(rows, "part string, time timestamp, x double, y double")
    got = _out(rolling_slope(df, "x", "y", 3, ["part"], out="out"))
    assert got == pytest.approx([None, None, 2.0, 2.0])


def test_rolling_slope_resets_after_missing_x_or_y(spark):
    # any missing pair clears the window; NaN counts as missing
    from datapipeline_spark.operators.window import rolling_slope

    pts = [
        (1.0, 2.0),
        (2.0, 4.0),
        (None, 6.0),
        (4.0, 8.0),
        (5.0, float("nan")),
        (6.0, 12.0),
        (7.0, 14.0),
        (8.0, 16.0),
    ]
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [("A", t0 + timedelta(days=i), x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "part string, time timestamp, x double, y double")
    got = _out(rolling_slope(df, "x", "y", 3, ["part"], out="out"))
    assert got[:-1] == [None] * 7
    assert got[-1] == pytest.approx(2.0)


def test_rolling_slope_resets_between_partitions(spark):
    from datapipeline_spark.operators.window import rolling_slope

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("A", t0, 1.0, 2.0),
        ("A", t0 + timedelta(days=1), 2.0, 4.0),
        ("B", t0 + timedelta(days=2), 10.0, -30.0),
        ("B", t0 + timedelta(days=3), 20.0, -60.0),
    ]
    df = spark.createDataFrame(rows, "part string, time timestamp, x double, y double")
    got = _out(rolling_slope(df, "x", "y", 2, ["part"], out="out"))
    assert got == pytest.approx([None, 2.0, None, -3.0])


def test_rolling_slope_matches_linear_regression(spark):
    # test_rolling_slope_matches_reference_windows (seeded random, w=17)
    from random import Random

    from datapipeline_spark.operators.window import rolling_slope

    random = Random(42)
    points = [
        (x := random.uniform(-100.0, 100.0), 1.75 * x + random.uniform(-2.0, 2.0))
        for _ in range(200)
    ]
    window = 17
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [("A", t0 + timedelta(hours=i), x, y) for i, (x, y) in enumerate(points)]
    df = spark.createDataFrame(rows, "part string, time timestamp, x double, y double")
    got = _out(rolling_slope(df, "x", "y", window, ["part"], out="out"))
    for pos, slope in enumerate(got):
        if pos < window - 1:
            assert slope is None
            continue
        cur = points[pos - window + 1 : pos + 1]
        expected = linear_regression([p[0] for p in cur], [p[1] for p in cur]).slope
        assert slope == pytest.approx(expected, rel=1e-9, abs=1e-9)


# -------------------------------------------------------------- forward_sum


@pytest.mark.parametrize(
    ("values", "window", "expected"),
    [
        ([1.0, 2.0, 3.0, 4.0], 2, [5.0, 7.0, None, None]),
        ([1.0, 2.0, 3.0], 1, [2.0, 3.0, None]),
        ([1.0], 3, [None]),
        ([1.0, 2.0], 3, [None, None]),
        ([1.0, 2.0, 3.0], 3, [None, None, None]),
        # missing values only invalidate windows containing them
        ([1.0, 2.0, None, 4.0, 5.0], 2, [None, None, 9.0, None, None]),
        # NaN is missing
        ([1.0, 2.0, float("nan"), 4.0], 2, [None, None, None, None]),
    ],
)
def test_forward_sum_reference_values(spark, values, window, expected):
    from datapipeline_spark.operators.window import forward_sum

    df = _frame(spark, values)
    got = _out(forward_sum(df, "value", window, ["part"], out="out"))
    assert got == pytest.approx(expected)


def test_forward_sum_resets_between_partitions(spark):
    from datapipeline_spark.operators.window import forward_sum

    df = _frame(spark, [1.0, 2.0, 3.0, 10.0, 20.0, 30.0], ["A"] * 3 + ["B"] * 3)
    got = _out(forward_sum(df, "value", 2, ["part"], out="out"))
    assert got == pytest.approx([5.0, None, None, 50.0, None, None])


# ------------------------------------------------------- fill / forward_fill


def test_mean_fill_uses_running_average(spark):
    # [10, 12, None, 16, nan] w2 → idx2 = mean(10,12) = 11; idx4 = 16 (window
    # counts ticks; only the fresh valid value remains)
    from datapipeline_spark.operators.window import fill

    df = _frame(spark, [10.0, 12.0, None, 16.0, float("nan")])
    got = _out(fill(df, "value", 2, "mean", 1, ["part"], out="out"))
    assert got[2] == pytest.approx(11.0)
    assert got[4] == pytest.approx(16.0)


def test_median_fill_honours_window(spark):
    # [1, 100, 2, None, None] w2 → idx3 = median(100,2)=51; idx4 = 2
    from datapipeline_spark.operators.window import fill

    df = _frame(spark, [1.0, 100.0, 2.0, None, None])
    got = _out(fill(df, "value", 2, "median", 1, ["part"], out="out"))
    assert got[3] == pytest.approx(51.0)
    assert got[4] == pytest.approx(2.0)


def test_forward_fill_carries_last_valid_value(spark):
    from datapipeline_spark.operators.window import forward_fill

    df = _frame(spark, [None, 10.0, None, 12.0, float("nan")])
    got = _out(forward_fill(df, "value", ["part"], out="out"))
    assert got == [None, 10.0, 10.0, 12.0, 12.0]


def test_forward_fill_respects_partitions(spark):
    from datapipeline_spark.operators.window import forward_fill

    df = _frame(spark, [10.0, None, None, 20.0, None], ["A", "A", "B", "B", "B"])
    got = _out(forward_fill(df, "value", ["part"], out="out"))
    assert got == [10.0, 10.0, None, 20.0, 20.0]


# -------------------------------------------------------------- log / log1p


def test_log_values(spark):
    from datapipeline_spark.operators.record import log1p_op, log_op

    df = _frame(spark, [math.e**2, math.e, None])
    got = _out(log_op(df, "value", out="out"))
    assert got[0] == pytest.approx(2.0) and got[1] == pytest.approx(1.0)
    assert got[2] is None  # missing passes through

    tiny = 1e-20
    df2 = _frame(spark, [tiny, -tiny])
    got2 = _out(log1p_op(df2, "value", out="out"))
    assert got2[0] == math.log1p(tiny) and got2[0] != 0.0
    assert got2[1] == math.log1p(-tiny)


def test_log_domain_violation_raises_in_strict_mode(spark):
    from datapipeline_spark.operators.record import log_op

    df = _frame(spark, [0.0])
    with pytest.raises(Exception, match="log"):
        log_op(df, "value", out="out", strict=True).collect()


# ------------------------------------------------------------- hash labeler


def test_hash_split_ratio_mapping_order_does_not_change_labels(spark):
    # reference test_split_labelers.py: same seed + same cumulative layout
    # must label identically regardless of dict insertion order
    from datapipeline_spark.dataset.split import hash_split_label

    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    a = df.select(hash_split_label("k", {"train": 0.7, "val": 0.2, "test": 0.1}, seed=7).alias("l"))
    b = df.select(hash_split_label("k", {"train": 0.7, "val": 0.2, "test": 0.1}, seed=7).alias("l"))
    assert [r.l for r in a.collect()] == [r.l for r in b.collect()]


def test_hash_split_is_seed_sensitive_and_ratio_respecting(spark):
    from datapipeline_spark.dataset.split import hash_split_label

    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    l7 = [r.l for r in df.select(hash_split_label("k", {"a": 0.5, "b": 0.5}, seed=7).alias("l")).collect()]
    l8 = [r.l for r in df.select(hash_split_label("k", {"a": 0.5, "b": 0.5}, seed=8).alias("l")).collect()]
    assert l7 != l8
    frac = sum(1 for x in l7 if x == "a") / len(l7)
    assert 0.45 < frac < 0.55
