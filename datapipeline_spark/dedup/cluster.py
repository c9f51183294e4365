"""Near-duplicate clustering: connected components over a similarity-pair
graph, and representative selection.

At training-data scale the dedup pipeline is: shingle → MinHash/LSH →
candidate pairs → exact-similarity filter → **connected components** →
keep one representative per component. The reference has no graph stage (its
dedup is consecutive-identical only, transforms/stream/dedupe.py:6-15);
this is the 100 TB-posture extension.

Algorithm: alternating min-label propagation over the undirected edge list
(the standard join-based CC on Spark; cf. the large-star/small-star
formulation of Kiveris et al., "Connected Components in MapReduce and
Beyond"). Each round is one join + one groupBy-min; rounds needed =
O(component diameter). Near-dup components are shallow (cliques or short
chains from transitive similarity), so 3-6 rounds converge in practice;
`localCheckpoint` truncates the growing lineage each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    checkpoint: bool = True,
) -> DataFrame:
    """(id, component) for every vertex in `pairs`; component = min vertex id
    reachable. Raises if not converged within `max_iterations`."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    if checkpoint:
        # the loop runs 2 actions per round — without materializing the edge
        # list here, the (often expensive: LSH / O(n²) cosine) pair
        # generation upstream would be recomputed every round
        edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iterations):
        # each vertex proposes its label to every neighbor; take the min of
        # own label and all proposals
        proposals = (
            edges.join(labels, edges.a == labels.id)
            .select(F.col("b").alias("id"), "component")
        )
        new_labels = (
            labels.select("id", "component")
            .union(proposals)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping: adopt the label of one's label. Neighbor
        # propagation alone needs O(diameter) rounds (path graphs are the
        # worst case); the jump halves the remaining distance every round,
        # so convergence is O(log diameter) joins total.
        jump = new_labels.select(
            F.col("id").alias("jid"), F.col("component").alias("jcomp")
        )
        new_labels = (
            new_labels.join(jump, new_labels.component == jump.jid, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("jcomp", "component")
                ).alias("component"),
            )
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def dedup_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one document per near-dup component (the min id) plus every
    unpaired document — the standard corpus-dedup reduction."""
    comp = connected_components(pairs, src, dst)
    keep_clustered = comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    unpaired = docs.select(id_col).join(
        comp.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    keepers = keep_clustered.union(unpaired)
    return docs.join(keepers, id_col, "leftsemi")
