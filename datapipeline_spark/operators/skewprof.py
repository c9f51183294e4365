"""Shuffle-skew profiler — the "would this key survive a 1000-executor
shuffle?" advisor.

For each candidate shuffle/join key: exact key-frequency order statistics
(p50/p95/p99/max), the hot-key mass fraction, and a suggested salt factor
for the salted-join machinery in ``operators/skew.py``. This is the
diagnostic that decides BETWEEN the plain and salted paths — the repo's
scale playbook (PERFORMANCE.md) applied as an operator.

Exactness without a global sort: the frequency table (one row per key) is
reduced to its frequency-of-frequency profile — ``fof(f) = #keys seen f
times`` — which is bounded by the number of DISTINCT frequencies (≤ a few
thousand even at 100 TB: frequencies concentrate). Order statistics are
then exact cumulative-threshold lookups over that tiny table (the same
monotone-prefix trick as equidepth_price_bands), never a percentile sort
over keys. All integers; ppm by integer division — engine-exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def skew_profile(
    df: DataFrame, keys: Sequence[str], target_partitions: int = 32
) -> DataFrame:
    """One exact skew-profile row per candidate key: row/key counts,
    p50/p95/p99/max key frequencies, hottest-key row share in ppm, and the
    salt factor that would level the hottest key across
    ``target_partitions`` (= ceil(max_freq / (n_rows / P))). A
    ``suggested_salt`` of 1 means the plain shuffle is fine.

    ALL candidate keys share one tagged-union plan (the ind_profile
    treatment): every row explodes to (key_name, key_value) pairs IN-ROW,
    one (key, value) aggregate counts frequencies for every candidate at
    once, and the per-key frequency-of-frequency tables ride
    key-partitioned windows. One scan + two full-data exchanges total,
    independent of the candidate count — the old per-key loop scanned and
    shuffled once per key. Values are profiled under a string cast so all
    candidates share one column: injective for the numeric/string/date
    key types shuffle keys are made of (only frequencies surface
    downstream); binary keys could collide under string rendering — cast
    or hash them to a comparable form first."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("key"),
                        F.col(k).cast("string").alias("v"),
                    )
                    for k in keys
                ]
            )
        ).alias("p")
    ).select("p.key", "p.v")
    freq = pairs.groupBy("key", "v").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    fof = freq.groupBy("key", "f").agg(
        F.count(F.lit(1)).cast("long").alias("nk")
    )
    # tiny per-key table (distinct frequency values); the window is over
    # fof, never over keys
    w = (
        Window.partitionBy("key")
        .orderBy("f")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = fof.withColumn("ck", F.sum("nk").over(w))
    tot = fof.groupBy("key").agg(
        F.sum(F.col("f") * F.col("nk")).cast("long").alias("n_rows"),
        F.sum("nk").cast("long").alias("n_keys"),
        F.max("f").cast("long").alias("max_freq"),
    )
    j = cum.join(F.broadcast(tot), "key")

    # p-th order statistic of key frequencies = min f with cum ≥ ceil(p% · n_keys)
    def ostat(p: int):
        thresh = F.expr(f"(n_keys * {p} + 99) DIV 100")
        return F.min(F.when(F.col("ck") >= thresh, F.col("f"))).cast("long")

    return (
        j.groupBy("key", "n_rows", "n_keys", "max_freq")
        .agg(
            ostat(50).alias("p50_freq"),
            ostat(95).alias("p95_freq"),
            ostat(99).alias("p99_freq"),
        )
        .select(
            "key",
            "n_rows",
            "n_keys",
            F.expr("n_rows DIV n_keys").alias("avg_freq"),
            "p50_freq",
            "p95_freq",
            "p99_freq",
            "max_freq",
            F.expr("(max_freq * 1000000) DIV n_rows").alias("hot_key_ppm"),
            # a partition receives ~n_rows/P rows when balanced; the hottest
            # key needs ceil(max_freq / (n_rows/P)) salts to spread to that
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"(max_freq * {target_partitions} + n_rows - 1) DIV n_rows"
                ),
            ).alias("suggested_salt"),
        )
    )
