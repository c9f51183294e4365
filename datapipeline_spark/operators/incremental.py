"""Incremental join-view maintenance — delta propagation for append-only
relations.

When a materialized inner-join view V = A ⋈ B receives appends ΔA and ΔB,
the exact multiset delta is the textbook differential-dataflow / DBSP
decomposition:

    ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

so the refresh touches ``|Δ|``-proportional work instead of re-joining
100 TB of base data. The batch analogue of the streaming incremental
rollup in streaming/ops.py, for JOIN views (the streaming side covers
aggregation views).

Scale posture: deltas are small by definition — both delta-sided joins
broadcast the delta, so the only scan of the base relations is
broadcast-probed with no shuffle; ΔA ⋈ ΔB is broadcast ⋈ broadcast.
Multiset-exact (append-only semantics: no retractions — the CDC fold in
operators/cdc.py is the keyed upsert path), order-independent, and
differentially testable: ΔV must equal (A∪ΔA) ⋈ (B∪ΔB) EXCEPT ALL A ⋈ B.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_join_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Exact multiset delta of the inner-join view A ⋈ B under appends
    ΔA, ΔB. Delta sides are broadcast (appends are batch-sized, bases are
    corpus-sized); the three legs union by name."""
    on = list(on)
    legs = [
        F.broadcast(delta_a).join(base_b, on),
        base_a.join(F.broadcast(delta_b), on),
        F.broadcast(delta_a).join(F.broadcast(delta_b), on),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
