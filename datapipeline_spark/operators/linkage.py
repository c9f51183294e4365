"""Probabilistic record linkage scoring (Fellegi & Sunter 1969).

Completes the entity-resolution story next to the blocked fuzzy join
(queries_data.fuzzy_match_customers): blocking bounds WHICH pairs are
compared; this module scores each candidate pair by summing per-field
log-likelihood-ratio weights and classifies against decision thresholds —
the standard probabilistic-linkage decision rule (match / possible /
non-match).

Beyond-reference (the reference has no record-linkage surface; its dedupe
is consecutive-identical only, transforms/stream/dedupe.py:6-15).

Determinism contract: the per-field weights log2(m/u) (agreement) and
log2((1-m)/(1-u)) (disagreement) are computed ONCE in Python and embedded
as integer micro-units — the per-pair score is a sum of integer literals
selected by boolean field comparators, bit-identical in any engine and
independent of partitioning/join order. No floats cross an aggregation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: integer micro-units per 1.0 of log2 weight
WEIGHT_SCALE = 1_000_000


def weight_pair(m: float, u: float) -> tuple[int, int]:
    """(agree, disagree) integer micro-log2 weights for one field — plain
    arithmetic, safe to call at module-import time (no SparkContext);
    FieldComparison delegates here so the oracle builders and the Spark
    path share one constant source."""
    return (
        round(math.log2(m / u) * WEIGHT_SCALE),
        round(math.log2((1.0 - m) / (1.0 - u)) * WEIGHT_SCALE),
    )


@dataclass(frozen=True)
class FieldComparison:
    """One field comparator: `agreement` is a boolean Column over the joined
    pair; m = P(agree | match), u = P(agree | non-match) — the standard EM
    targets, here declared (on curated data they come from an EM fit)."""

    name: str
    agreement: Column
    m: float
    u: float

    @property
    def agree_weight(self) -> int:
        return weight_pair(self.m, self.u)[0]

    @property
    def disagree_weight(self) -> int:
        return weight_pair(self.m, self.u)[1]


def fellegi_sunter_score(
    pairs: DataFrame,
    comparisons: Sequence[FieldComparison],
    upper: float = 3.0,
    lower: float = 0.0,
    out: str = "match_weight",
    decision: str = "decision",
) -> DataFrame:
    """Score candidate pairs and classify.

    `pairs` is a blocked candidate-pair frame (NEVER all-pairs — blocking
    is the caller's scale contract, same as fuzzy_match). Adds
    ``out`` = Σ field weights (integer micro-log2-units) and
    ``decision`` ∈ {'match', 'possible', 'non_match'} by the two-threshold
    Fellegi-Sunter rule (thresholds in log2 units). A NULL-evaluating
    agreement counts as disagreement (missing data carries the
    disagreement evidence, the conservative convention).
    """
    total: Column = F.lit(0).cast("long")
    for c in comparisons:
        total = total + F.when(c.agreement, F.lit(c.agree_weight)).otherwise(
            F.lit(c.disagree_weight)
        ).cast("long")
    up = round(upper * WEIGHT_SCALE)
    lo = round(lower * WEIGHT_SCALE)
    scored = pairs.withColumn(out, total)
    return scored.withColumn(
        decision,
        F.when(F.col(out) >= up, F.lit("match"))
        .when(F.col(out) >= lo, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )
