"""Inclusion-dependency discovery — foreign-key-candidate profiling.

For each candidate (dependent column ⊆ referenced column): how many of
the dependent's distinct values appear in the referenced column? The
containment profile behind FK detection, join-path inference, and schema
reverse-engineering (the IND half of the Papenbrock profiling family;
``operators/fd.py`` covers the FD half — the reference's profiling stops
at per-column stats, see operators/profile.py parity note).

Scale posture: ALL candidates share ONE single-exchange plan (round-7
opt; the previous form was a per-candidate tagged union — 2 scans per
candidate and a (candidate, value-string) exchange). Every table is
scanned ONCE, its participating columns exploded in-row to
(column-bit, value) pairs; one value-keyed aggregate ORs the bits of
every column containing that value (map-side combinable — shuffle mass
is distinct values, never rows, and each shared column ships once no
matter how many candidates reference it); ONE global conditional-sum
aggregate then closes every candidate from the mask stream:
n_distinct(a→b) = Σ [mask has bit a], n_contained = Σ [mask has both
bits]. No joins, no per-candidate duplication, and values shuffle
as BIGINT whenever every participating column is integral (the string
cast is the generic fallback — per-column injective, so counts are
unchanged; cross-column collisions only merge mask rows, never flip a
per-column bit). Containment strength in ppm by integer division —
engine-exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (label_dependent, df_dependent, col_dependent,
#  label_referenced, df_referenced, col_referenced)
IndCandidate = tuple[str, DataFrame, str, str, DataFrame, str]

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

#: memoized (aggregate Columns, unpivot Column) per candidate signature —
#: see the construction note in ind_profile
_CAND_EXPRS: dict[tuple, tuple[list, object]] = {}


def ind_profile(candidates: Sequence[IndCandidate]) -> DataFrame:
    """Profile every candidate inclusion dependency. Returns one row per
    candidate: distinct non-null dependent values, how many are contained
    in the referenced column, exact-inclusion flag, and contained-fraction
    in ppm (integer division; NULL dependents are ignored, per SQL FK
    semantics where NULL trivially satisfies the constraint).

    At most 62 distinct participating (table, column) sides per call —
    each gets one bit of a BIGINT presence mask (a profiling run wider
    than that should be split; candidate count itself is unbounded)."""
    # one bit per distinct participating column; same DataFrame object +
    # same column name ⇒ same bit (o_custkey as cand-2 dependent and
    # cand-5 referenced ships through the exchange once)
    col_ids: dict[tuple[int, str], int] = {}
    col_specs: list[tuple[DataFrame, str]] = []
    cand_rows: list[tuple[int, str, str, int, int]] = []
    for i, (dep_label, dep_df, dep_col, ref_label, ref_df, ref_col) in enumerate(
        candidates
    ):
        bits = []
        for df_, c_ in ((dep_df, dep_col), (ref_df, ref_col)):
            key = (id(df_), c_)
            if key not in col_ids:
                col_ids[key] = len(col_specs)
                col_specs.append((df_, c_))
            bits.append(1 << col_ids[key])
        cand_rows.append(
            (i, f"{dep_label}.{dep_col}", f"{ref_label}.{ref_col}", bits[0], bits[1])
        )
    if len(col_specs) > 62:
        raise ValueError(
            f"ind_profile: {len(col_specs)} distinct columns exceed the 62-bit "
            "presence mask; split the candidate list"
        )

    def _dtype(df_: DataFrame, c_: str):
        for fld in df_.schema.fields:
            if fld.name == c_:
                return fld.dataType
        return None

    all_integral = all(
        isinstance(_dtype(df_, c_), _INTEGRAL) for df_, c_ in col_specs
    )
    # BIGINT keys shuffle ~half the bytes of their string rendering and
    # group with integer equality — identical counts (CAST AS STRING is
    # injective on integral types and both sides cast the same way, so
    # string-equality == numeric-equality). Mixed/other types keep the
    # generic string cast — the exact cross-type equality the oracle uses.
    ktype = "BIGINT" if all_integral else "STRING"

    # one scan per DataFrame: its participating columns explode IN-ROW to
    # (bit, value) pairs via inline() — selectExpr strings instead of
    # per-column F.lit/F.col chains (each Column op is a Py4J round trip;
    # the bloom-bitmap construction fix generalized). Column names are
    # user-supplied and interpolated inside backticks, so embedded
    # backticks are doubled (the quoted-identifier escape — round-7
    # ADVICE); dotted names stay literal this way too.
    by_df: dict[int, tuple[DataFrame, list[tuple[int, str]]]] = {}
    for idx, (df_, c_) in enumerate(col_specs):
        ent = by_df.setdefault(id(df_), (df_, []))
        ent[1].append((idx, c_))
    streams = []
    for df_, specs in by_df.values():
        entries = ", ".join(
            "named_struct('bit', CAST({b} AS BIGINT), 'k', CAST(`{c}` AS {t}))".format(
                b=1 << cid, c=c_.replace("`", "``"), t=ktype
            )
            for cid, c_ in specs
        )
        streams.append(
            df_.selectExpr(f"inline(array({entries}))").where("k IS NOT NULL")
        )
    tagged = streams[0]
    for s in streams[1:]:
        tagged = tagged.unionByName(s)

    masks = tagged.groupBy("k").agg(F.bit_or("bit").alias("mask"))

    # ONE global conditional-sum aggregate closes every candidate at once:
    # n_distinct(a→b) = Σ over distinct values of [mask has bit a],
    # n_contained = Σ of [mask has bits a AND b]. The partial aggregate
    # reduces each task to a single 2·n_cand-column row, so only one row
    # per task crosses the final exchange — no mask-frequency detour, no
    # label join (each extra tiny aggregate/join is a whole AQE stage job).
    # Both Column sets are pure functions of the candidate signature, so
    # they are memoized across plan constructions (the LSH parsed-Column
    # treatment: Columns wrap immutable expression trees, nothing
    # data-dependent is cached, and rebuild-per-run callers skip ~30
    # Py4J-built expressions per rebuild).
    sig = tuple(cand_rows)
    memo = _CAND_EXPRS.get(sig)
    if memo is None:
        aggs = []
        for i, (_, _, _, db, rb) in enumerate(cand_rows):
            dep_hit = F.col("mask").bitwiseAND(F.lit(db)) != 0
            ref_hit = F.col("mask").bitwiseAND(F.lit(rb)) != 0
            aggs.append(
                F.sum(F.when(dep_hit, 1).otherwise(0)).cast("long").alias(f"d{i}")
            )
            aggs.append(
                F.sum(F.when(dep_hit & ref_hit, 1).otherwise(0))
                .cast("long")
                .alias(f"c{i}")
            )
        # labels are plan literals, exploded in-row: 1 row → n_cand rows,
        # no join, no exchange
        unpivot = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dep).alias("dependent"),
                        F.lit(ref).alias("referenced"),
                        F.coalesce(F.col(f"d{i}"), F.lit(0))
                        .cast("long")
                        .alias("n_distinct"),
                        F.coalesce(F.col(f"c{i}"), F.lit(0))
                        .cast("long")
                        .alias("n_contained"),
                    )
                    for i, (_, dep, ref, _, _) in enumerate(cand_rows)
                ]
            )
        ).alias("p")
        memo = _CAND_EXPRS[sig] = (aggs, unpivot)
    aggs, unpivot = memo
    one = masks.agg(*aggs)
    # a global aggregate emits exactly one row even on empty input (every
    # side all-NULL) with NULL sums — the coalesce above restores the
    # (0, 0) contract the old label-skeleton left join provided.
    out = one.select(unpivot).select(
        "p.dependent", "p.referenced", "p.n_distinct", "p.n_contained"
    )
    return out.select(
        "dependent",
        "referenced",
        "n_distinct",
        "n_contained",
        F.when(F.col("n_distinct") == F.col("n_contained"), 1)
        .otherwise(0)
        .cast("int")
        .alias("holds"),
        F.when(
            F.col("n_distinct") > 0,
            F.expr("(n_contained * 1000000) DIV n_distinct"),
        )
        .otherwise(F.lit(None))
        .cast("long")
        .alias("contained_ppm"),
    )
