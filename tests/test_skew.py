"""Salted aggregation/join must be result-identical to the plain operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows


@pytest.fixture()
def skewed(spark):
    # key "hot" holds 90% of rows
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain(spark, skewed):
    from datapipeline_spark.operators.skew import salted_agg

    got = rows(
        salted_agg(
            skewed,
            ["k"],
            {
                "total": ("sum", "v"),
                "n": ("count", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
                "mean": ("avg", "v"),
            },
            salt=8,
        ),
        "k",
    )
    plain = rows(
        skewed.groupBy("k").agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("v").alias("mean"),
        ),
        "k",
    )
    assert [g[:5] for g in got] == [p[:5] for p in plain]
    assert [g[5] for g in got] == pytest.approx([p[5] for p in plain])


def test_salted_join_matches_plain(spark, skewed):
    from datapipeline_spark.operators.skew import salted_join

    dim = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(7)],
        "k string, w double",
    )
    got = rows(salted_join(skewed, dim, ["k"], salt=4).select("k", "v", "w"), "k", "v")
    plain = rows(skewed.join(dim, "k").select("k", "v", "w"), "k", "v")
    assert got == plain


def test_salted_agg_rejects_non_decomposable(spark, skewed):
    from datapipeline_spark.operators.skew import salted_agg

    with pytest.raises(ValueError, match="sum|count"):
        salted_agg(skewed, ["k"], {"m": ("median", "v")})
