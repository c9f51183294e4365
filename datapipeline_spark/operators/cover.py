"""Greedy maximum-coverage selection — submodular data curation.

Pick k groups (corpus sources, shards, suppliers) whose united item sets
(vocabulary, users, parts) cover as much as possible: the classic
(1 − 1/e)-approximate greedy for submodular maximization
(Nemhauser-Wolsey-Fisher 1978). The data-curation use: "which k sources
buy the most vocabulary/deduplicated content for the training mix" —
complementary to apportion (how much budget per source) and
token_budget_mixture (which docs fill it).

Iterative by nature (each pick changes every remaining group's marginal
gain), so like BPE and k-means it runs as a driver loop of small jobs
over the DISTINCT (group, item) projection: per round one anti-join of
the item table against the covered set + one map-side-combined count +
a 1-row argmax collect (deterministic tie-break: gain desc, group asc).
The covered set is localCheckpoint-ed each round — lineage stays one
level deep, and at 100 TB the loop state is a distributed item table,
never driver memory. Rounds are k (single digits); everything heavy is
the k anti-join+count passes, each one exchange.

Because each round's argmax is a total-order pick, the whole run is
deterministic and — for fixed small k — SQL-expressible as an unrolled
chain of MATERIALIZED CTEs (the kcore/bfs oracle pattern), which is how
the registry entry is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def greedy_max_coverage(
    spark: SparkSession,
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int,
) -> DataFrame:
    """Select up to ``k`` groups greedily by marginal item coverage.

    Returns a DataFrame (rank, group, gain, cum_covered): the pick order,
    each pick's NEW items, and the running union size. Stops early when
    no remaining group adds items."""
    t = (
        df.select(F.col(group_col).alias("grp"), F.col(item_col).alias("item"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    covered: DataFrame | None = None
    chosen: list[tuple[int, str, int, int]] = []
    taken: list[str] = []
    cum = 0
    for rank in range(1, int(k) + 1):
        rem = t.filter(~F.col("grp").isin(taken)) if taken else t
        if covered is not None:
            rem = rem.join(covered, "item", "left_anti")
        top = (
            rem.groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("grp"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["gain"] == 0:
            break
        g, gain = top[0]["grp"], int(top[0]["gain"])
        cum += gain
        chosen.append((rank, g, gain, cum))
        taken.append(g)
        new_items = t.filter(F.col("grp") == g).select("item")
        covered = (
            new_items
            if covered is None
            else covered.unionByName(new_items).distinct()
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        chosen, "rank int, grp string, gain long, cum_covered long"
    )
