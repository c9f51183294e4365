"""Exact integer Gram/covariance matrix over quantized embedding columns.

The distributed linear-algebra primitive under PCA, whitening, and
embedding-drift diagnostics: for a d-dim integer vector column, compute
every upper-triangle pair's product-sum ``S_ij``, the per-dim sums
``S_i``, and the exact covariance NUMERATOR ``n·S_ij − S_i·S_j`` — all in
DECIMAL(38) integer arithmetic, so the d(d+1)/2-cell matrix is
bit-identical across engines and partition layouts (a float covariance
over 100 TB is accumulation-order-dependent; an integer one is not).
Feed int8-quantized embeddings (the embedding_quantize projection) —
quantize-then-aggregate is the standard trick for order-independent
second moments. Eigen-decomposition of the resulting d×d matrix is a
driver-side numpy call on 2080 numbers, outside the engine.

Plan: one map stage flattens each row's upper-triangle outer product
(d(d+1)/2 structs via nested ``transform`` over ``sequence`` — pure
Tungsten), one explode, one map-side-combined groupBy on (i, j): the
shuffle carries at most d(d+1)/2 cells per task regardless of row count.
The per-dim sums ride the SAME aggregation as the j==i diagonal plus a
64-cell side aggregate. The reference has no linear algebra at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def int_gram_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Upper-triangle (i ≤ j, 0-based) exact integer second moments of an
    ``array<int>`` column: returns (i, j, n, s_ij, s_i, s_j, cov_num)
    with ``cov_num = n·s_ij − s_i·s_j`` (DECIMAL(38) exact; divide by
    n·(n−1) downstream for the sample covariance)."""
    d = int(dim)
    pairs = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: F.transform(
                    F.sequence(i, F.lit(d - 1)),
                    lambda j: F.struct(
                        i.alias("i"),
                        j.alias("j"),
                        (
                            F.element_at(F.col(vec_col), i + 1).cast("long")
                            * F.element_at(F.col(vec_col), j + 1).cast("long")
                        ).alias("prod"),
                        F.element_at(F.col(vec_col), i + 1)
                        .cast("long")
                        .alias("qi"),
                        F.element_at(F.col(vec_col), j + 1)
                        .cast("long")
                        .alias("qj"),
                    ),
                ),
            )
        )
    ).alias("p")
    cells = (
        df.select(pairs)
        .groupBy(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("p.prod").cast("decimal(38,0)").alias("__sij__"),
            F.sum("p.qi").cast("decimal(38,0)").alias("__si__"),
            F.sum("p.qj").cast("decimal(38,0)").alias("__sj__"),
        )
    )
    return cells.select(
        "i",
        "j",
        "n",
        F.col("__sij__").cast("long").alias("s_ij"),
        F.col("__si__").cast("long").alias("s_i"),
        F.col("__sj__").cast("long").alias("s_j"),
        F.expr("CAST(n * __sij__ - __si__ * __sj__ AS DECIMAL(38,0))")
        .cast("long")
        .alias("cov_num"),
    )
