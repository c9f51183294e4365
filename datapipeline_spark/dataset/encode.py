"""Leakage-proof K-fold target encoding — the ML-feature staple.

Mean-target encoding of a categorical column, computed OUT-OF-FOLD: the
encoding a row in fold f sees is the target mean over every OTHER fold,
so a model trained on the encoded feature never reads its own label (the
leakage trap the folded scaler in ``dataset/scaler.py`` guards against,
applied to categorical features; the reference has no encoding surface —
its nearest analogue is the ScalerAccumulator, SURVEY §2.6).

The subtraction trick makes this one aggregate, not K: per (category,
fold) sums/counts in a single groupBy, per-category totals as a second
tiny aggregate broadcast back, and oof_mean(cat, f) =
(total_sum(cat) − fold_sum(cat, f)) / (total_cnt(cat) − fold_cnt(cat, f)).
Shuffle mass is one (cat, fold)-keyed exchange over the input; the
encoding map itself is |categories| × K rows — broadcast-joinable back
onto the row stream at any scale. Targets must be exact integers (the
repo's scaled-integer convention); means are integer DIV micro-exact, and
a fold that holds ALL of a category's rows encodes NULL (no out-of-fold
evidence), never a division by zero (ANSI-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    fold_col: str,
) -> DataFrame:
    """Out-of-fold encoding map: one row per (category, fold) present in
    ``df``, with the row/target-sum counts of the COMPLEMENT folds and
    ``enc`` = oof target sum DIV oof row count (NULL when the complement
    is empty). ``target_col`` must be integral — exact bigint arithmetic
    end to end."""
    per_fold = df.groupBy(
        F.col(cat_col).alias("cat"), F.col(fold_col).alias("fold")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("f_cnt"),
        F.sum(F.col(target_col).cast("long")).cast("long").alias("f_sum"),
    )
    totals = per_fold.groupBy("cat").agg(
        F.sum("f_cnt").cast("long").alias("t_cnt"),
        F.sum("f_sum").cast("long").alias("t_sum"),
    )
    oof_cnt = F.col("t_cnt") - F.col("f_cnt")
    oof_sum = F.col("t_sum") - F.col("f_sum")
    return (
        per_fold.join(F.broadcast(totals), "cat")
        .select(
            "cat",
            "fold",
            oof_cnt.alias("oof_cnt"),
            oof_sum.alias("oof_sum"),
            F.when(oof_cnt > 0, F.expr("(t_sum - f_sum) DIV (t_cnt - f_cnt)"))
            .otherwise(F.lit(None))
            .cast("long")
            .alias("enc"),
        )
    )
