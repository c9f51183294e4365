"""Similarity search over embedding columns (array<float>).

- `brute_force_knn`: exact cosine top-k — broadcast the (small) query set
  against the corpus; one narrow map + per-partition top-k via window rank.
  The baseline and the verifier for approximate paths.
- `lsh_knn`: random-hyperplane (sign) LSH — banding over sign bits buckets
  the corpus so each query only scans its buckets. The 100 TB path: bucket
  assignment is a map; the join is an equi-join on (band, bucket).
- All float math is done in DOUBLE with sequential `aggregate` folds so
  results are deterministic and engine-comparable.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic order)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / F.nullif(norm_expr(a) * norm_expr(b), F.lit(0.0))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, rank, score).

    The query side is broadcast — corpus never shuffles; ranking is a window
    over query_id (top-k per query via row_number, ties broken by rounded
    score then neighbor id for cross-engine determinism).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score", F.round(cosine_similarity_expr(F.col("q_vec"), F.col("c_vec")), round_digits)
        )
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def random_hyperplane_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 16,
    seed: int = 42,
    out: str = "rh_sig",
) -> DataFrame:
    """Sign-LSH signature: bit p = [v · h_p > 0] with h_p a deterministic
    pseudo-random ±1 hyperplane. Pure map stage."""
    rng = random.Random(seed)
    hyper = [[1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)] for _ in range(planes)]
    sig = F.lit(0).cast("long")
    v = _to_double(F.col(vec_col))
    for p, plane in enumerate(hyper):
        arr = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(F.zip_with(v, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        sig = sig + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out, sig)


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 16,
    bands: int = 4,
    k: int = 3,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Approximate top-k: candidates share at least one LSH band with the
    query, then exact cosine re-rank.

    Scale shape (the `lsh_similar_pairs` discipline): the bucket join
    carries (id, band, bucket) rows ONLY — vectors never ride through
    candidate generation or the distinct (deduping array<double> pairs was
    the old plan's dominant cost), and rejoin by id afterwards. Corpus
    buckets larger than `max_bucket` are dropped (degenerate-region guard;
    without it a band holds ~n/2^(planes/bands) of the corpus and the join
    approaches a quarter-cartesian as n grows). Size `planes` so
    n / 2^(planes/bands) stays under `max_bucket`: planes ≈
    bands · log2(n / max_bucket) — 16/4 suits ~10⁴–10⁵ vectors; a 100 TB
    corpus wants more planes (deeper buckets), not a bigger cap."""
    bits = planes // bands

    def banded_ids(df: DataFrame, role: str) -> DataFrame:
        s = random_hyperplane_signature(df, vec_col, dim, planes, seed)
        return s.select(
            F.col(id_col).alias(f"{role}_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            (
                                F.shiftright(F.col("rh_sig"), b * bits)
                                .bitwiseAND(F.lit((1 << bits) - 1))
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(f"{role}_id", "bb.band", "bb.bucket")

    from datapipeline_spark.tables import spread

    # the signature projection is compute-bound (planes × dim HOF folds per
    # row) and the corpus arrives as few file splits — spread it wide; then
    # lazily checkpoint the (id, band, bucket) rows so the bucket-size
    # count and the candidate join share ONE signature computation
    c_banded = banded_ids(spread(corpus), "neighbor").localCheckpoint(eager=False)
    ok = (
        c_banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= max_bucket)
        .select("band", "bucket")
    )
    cand = (
        c_banded.join(ok, ["band", "bucket"])
        .join(banded_ids(queries, "query"), ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "score", F.round(cosine_similarity_expr(F.col("q_vec"), F.col("c_vec")), 4)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def fit_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[float]]:
    """Coarse quantizer for IVF: distributed k-means (Lloyd's via
    pyspark.ml, k-means|| init). Centroid count is tiny (~sqrt(n) in
    practice), so the model itself always fits on the driver."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(_to_double(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _centroid_dists(vec_col: str, centroids: list[list[float]]) -> Column:
    """Array of squared L2 distances to each centroid — one JVM expression
    (centroids ride along inside the plan, i.e. broadcast-by-literal)."""
    v = _to_double(F.col(vec_col))
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(x) for x in c]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out: str = "centroid_id",
) -> DataFrame:
    """Nearest-centroid assignment (IVF inverted-list key). Pure map stage:
    at 100 TB this is the partitioning column for the vector table."""
    dists = _centroid_dists(vec_col, centroids)
    return df.withColumn(
        out, (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 3,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: each query probes its `nprobe` nearest
    inverted lists and exact-cosine re-ranks only those candidates.

    Scale shape: corpus assignment is a map stage (then ideally persisted
    partitioned by centroid_id via write_table); the probe join is an
    equi-join on centroid_id with the tiny exploded query side broadcast —
    the corpus never shuffles. `nprobe = n_centroids` degenerates to exact
    brute force (useful as a correctness gate)."""
    if centroids is None:
        centroids = fit_ivf_centroids(corpus, vec_col, n_centroids, seed=seed)
    assigned = ivf_assign(corpus, centroids, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("neighbor_vec"),
        "centroid_id",
    )
    # nprobe nearest centroids per query: sort (dist, cid) structs, slice
    dists = _centroid_dists(vec_col, centroids)
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(
            F.slice(
                F.array_sort(
                    F.zip_with(
                        dists,
                        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                        lambda d, i: F.struct(d.alias("dist"), i.alias("cid")),
                    )
                ),
                1,
                nprobe,
            )
        ).alias("probe"),
    ).select("query_id", "query_vec", F.col("probe.cid").alias("centroid_id"))

    cand = assigned.join(F.broadcast(probes), "centroid_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "score",
        F.round(cosine_similarity_expr(F.col("query_vec"), F.col("neighbor_vec")), 4),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def lsh_similar_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    dim: int = 64,
    planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket: int = 1000,
    round_digits: int = 4,
) -> DataFrame:
    """Sign-LSH-blocked cosine pairs — the 100 TB form of the pair surface.

    Candidate generation is a self-equi-join on (band, bucket) over the
    banded hyperplane signature (a pure map stage), with buckets larger
    than `max_bucket` dropped (degenerate-region guard, mirroring the
    MinHash path); only the candidate (id_a < id_b) pairs are exact-cosine
    scored. The vectors never ride through the bucket join — candidates are
    distinct id pairs, and the embeddings join back by id afterwards, so
    the shuffle mass of the blocking stage is (id, band, bucket) rows only.

    Deterministic end-to-end: the hyperplanes are seed-derived literals, so
    the candidate set — and hence the result — has an exact SQL oracle
    (recall vs the brute-force all-pairs form is the only approximation).
    """
    bits = planes // bands
    sig = random_hyperplane_signature(df, vec_col, dim, planes, seed)
    banded = sig.select(
        F.col(id_col).alias("bid"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(F.col("rh_sig"), b * bits)
                            .bitwiseAND(F.lit((1 << bits) - 1))
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("bid", "bb.band", "bb.bucket")
    ok = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= max_bucket)
        .select("band", "bucket")
    )
    small = banded.join(ok, ["band", "bucket"])
    cand = (
        small.select("band", "bucket", F.col("bid").alias("id_a"))
        .join(small.select("band", "bucket", F.col("bid").alias("id_b")), ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    return (
        cand.join(vecs.withColumnsRenamed({"vid": "id_a", "v": "va"}), "id_a")
        .join(vecs.withColumnsRenamed({"vid": "id_b", "v": "vb"}), "id_b")
        .withColumn(
            "cosine",
            F.round(cosine_similarity_expr(F.col("va"), F.col("vb")), round_digits),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_similar_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    round_digits: int = 4,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup surface).

    Brute-force O(n²) formulation — a test-fixture verifier for bounded
    corpora only (it measures `lsh_similar_pairs` recall in the unit
    tests); the registered / production surface is `lsh_similar_pairs`.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_similarity_expr(F.col("va"), F.col("vb")), round_digits))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
