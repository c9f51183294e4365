"""Golden-record survivorship: merge matched records into one per entity.

The master-data-management step downstream of record linkage
(operators/linkage.py produces the match scores; this consumes the
resolved entity id): for each field, survive the value from the
highest-priority record that has one — "latest non-null wins" under a
caller-supplied total order (recency, source trust rank, …). The
reference engine's nearest concept is collapse-last
(transforms/stream/collapse.py), which keeps one whole ROW; survivorship
is per-FIELD, so the golden record can combine fields from different
source rows.

One map-side-combinable aggregation: every field is a ``max_by(field,
order-key-if-field-non-null)`` over the entity group — null fields drop
out because aggregate max ignores null ordering keys (pinned by pytest in
both engines). No window, no self-join; the shuffle is one exchange on
the entity key at any scale.

The order columns must give a TOTAL order within each entity (ties would
make the survivor engine-dependent); callers append a unique id, same
contract as the repo's window queries.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def golden_record(
    df: DataFrame,
    entity_cols: Sequence[str],
    order_cols: Sequence[str],
    fields: Sequence[str],
    count_col: str = "n_records",
) -> DataFrame:
    """One row per entity: for each field, the value from the ordered-last
    record where that field is non-null (null iff the field is null in
    every record of the entity). ``count_col`` carries the merged record
    count for lineage."""
    key = F.struct(*[F.col(c) for c in order_cols])
    aggs = [
        F.max_by(F.col(f), F.when(F.col(f).isNotNull(), key)).alias(f)
        for f in fields
    ] + [F.count(F.lit(1)).cast("long").alias(count_col)]
    return df.groupBy(*entity_cols).agg(*aggs)
