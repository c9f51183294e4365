"""Empty-input degradation: every operator family must return an EMPTY
result (or a well-defined neutral value) on empty tables — never raise.
At corpus scale a filter chain routinely empties a partition-stage input
(a day with no events, a shard with no matches), and an iterative
operator that indexes into a driver-side collect()[0] or divides by a
zero count would fail the whole job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empties(spark):
    return {
        "docs": spark.createDataFrame([], "doc_id long, text string"),
        "edges": spark.createDataFrame([], "src long, dst long"),
        "vals": spark.createDataFrame([], "g string, s int, y long"),
        "pairs": spark.createDataFrame([], "id_a long, id_b long"),
    }


def test_graph_family_empty(spark, empties):
    from datapipeline_spark.operators.graph import (
        bfs_distances,
        kcore_nodes,
        label_propagation,
        pagerank,
        sssp_distances,
        triangle_counts,
    )

    e = empties["edges"]
    assert pagerank(e, iterations=2).count() == 0
    assert triangle_counts(e).count() == 0
    assert kcore_nodes(e, k=2, checkpoint=False).count() == 0
    assert label_propagation(e, rounds=2, checkpoint=False).count() == 0
    src = spark.createDataFrame([], "node long")
    assert bfs_distances(e, src, max_hops=2, checkpoint=False).count() == 0
    we = spark.createDataFrame([], "src long, dst long, w long")
    assert sssp_distances(we, src, rounds=2, checkpoint=False).count() == 0


def test_stats_family_empty(spark, empties):
    from datapipeline_spark.operators.stats import spearman_corr, welch_ttest

    v = empties["vals"]
    assert welch_ttest(v, "y", "s", ["g"]).count() == 0
    assert spearman_corr(v, "y", "s", ["g"]).count() == 0


def test_dedup_family_empty(spark, empties):
    from datapipeline_spark.dedup import ppjoin_pairs
    from datapipeline_spark.dedup.cluster import connected_components

    assert ppjoin_pairs(empties["docs"], threshold=0.5).count() == 0
    assert (
        connected_components(empties["pairs"], src="id_a", dst="id_b").count()
        == 0
    )


def test_profiling_and_basket_empty(spark, empties):
    from datapipeline_spark.operators.basket import frequent_pairs
    from datapipeline_spark.operators.skewprof import skew_profile

    v = empties["vals"]
    assert skew_profile(v, ["g", "s"]).count() == 0
    assert frequent_pairs(v, "g", "s", min_item_support=2).count() == 0


def test_bloom_empty_is_all_zero_bitmap(spark, empties):
    """An empty build side yields the all-zero bitmap — and the filter
    against it keeps NO probe rows (no false positives from emptiness)."""
    from datapipeline_spark.operators.bloom import bloom_build, bloom_filter_keys

    words = bloom_build(empties["vals"], "y")
    assert all(w == 0 for w in words)
    probe = spark.createDataFrame([(1,), (2,)], "y long")
    assert bloom_filter_keys(probe, "y", words).count() == 0
