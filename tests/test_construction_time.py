"""Query-CONSTRUCTION wall-time regression canary.

Construction cost is invisible to the correctness harness (it compares
results, not build time) and easy to regress silently: operators/bloom.py
once spent 22 s per invocation expanding a 4096-long bitmap into Py4J
``lit`` calls, and an F.expr rewrite of the LSH signature cost ~7 s of SQL
parsing — both only detectable as wall time between ``fn(spark, sf)`` being
called and the DataFrame coming back. This test calls every registry entry
at sf0.001 and fails on any construction slower than its budget.

Budgets: 8 s default. Isolated constructions run in well under 1 s, but a
FULL-REGISTRY sweep accumulates 250+ analyzed plans in one driver and the
later constructions measurably slow (up to ~5 s observed for plans that
build in 0.5 s isolated) — the default is sized above that sweep noise and
still an order of magnitude below the 20 s regressions this guards
against. Queries that INTENTIONALLY run Spark work at construction (eager
localCheckpoints, driver-side iterative training like BPE) carry their own
documented budget below instead of being exempt — a regression in their
build path should still fail.
"""

from __future__ import annotations

import time

SF = "/root/testdata/sf0.001"

DEFAULT_BUDGET_S = 8.0

# eager-construction queries: Spark jobs run inside fn() by design
# (disclosed in PERFORMANCE.md); budgets sized ~2-3x their observed
# sf0.001 sweep construction so drift fails loudly without flapping
EAGER_BUDGET_S = {
    "bpe_merges": 45.0,  # iterative merge training: one job per merge round
    "source_cover_greedy": 30.0,  # max-coverage greedy: one job per pick
    "pagerank_parts": 20.0,  # eager checkpoint per iteration
    "near_dup_clusters": 45.0,  # pointer-jumping CC rounds (~17 s in-sweep)
    "entity_resolution_pipeline": 30.0,  # CC rounds over match pairs
    "dedup_representatives": 45.0,
    "embedding_near_dup": 60.0,  # CC rounds over cosine pairs (2 actions/round)
    "kcore_parts": 20.0,
    "communities_parts": 20.0,
    "sssp_parts": 20.0,
    "bfs_parts": 20.0,
    "ivf_knn": 40.0,  # centroid fit collects at construction
    "ivf_knn_fixed": 40.0,
    "minhash_lsh_pairs": 15.0,
    "pretraining_pipeline": 15.0,
    "bloom_prefilter_revenue": 12.0,  # bitmap build aggregation + collect
    "holt_forecast_users": 12.0,
    "conformal_holt_users": 12.0,
}


def test_every_registry_query_constructs_within_budget(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    # JVM/session warm-up so the first measured query doesn't pay it
    spark.range(10).count()
    next(iter(qs.values()))(spark, SF)

    def _budget(name: str) -> float:
        # streaming queries build file-source listings + schema plumbing at
        # construction — consistently heavier than batch plan building
        default = 15.0 if name.startswith("streaming_") else DEFAULT_BUDGET_S
        return EAGER_BUDGET_S.get(name, default)

    def _measure(name: str) -> float:
        t0 = time.time()
        qs[name](spark, SF)
        return time.time() - t0

    suspects: list[str] = []
    for name in qs:
        if _measure(name) > _budget(name):
            suspects.append(name)
    # a full-suite session (450+ tests, hundreds of analyzed plans) can
    # transiently slow a construction 3-5x; a REGRESSION reproduces, a
    # GC/driver blip does not — re-measure suspects (min of 2) before failing
    over = []
    for name in suspects:
        took = min(_measure(name), _measure(name))
        if took > _budget(name):
            over.append(f"{name}: {took:.2f}s > {_budget(name):.1f}s")
    assert not over, "construction-time regressions:\n" + "\n".join(over)
