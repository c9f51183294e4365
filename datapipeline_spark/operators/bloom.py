"""Bloom-filter semi-join pre-filtering: drop probe rows that cannot match
BEFORE the join shuffle.

The 100 TB join problem this solves: a selective inner join shuffles the
entire probe side even though most rows find no partner. Spark's own AQE
runtime filters cover some shapes; this operator makes the pattern
explicit, deterministic, and available to any plan: build an m-bit Bloom
bitmap from the build side's keys with ONE map-side-combined ``bit_or``
aggregation (the shuffle carries at most ``m/64`` longs per task,
independent of build rows), collect the ≤ m/64 words to the driver (a
bounded few-hundred-KB aggregate, never the key set), embed them as an
array literal, and filter the probe side with pure JVM bit tests in the
scan stage — zero extra shuffle, zero join, whole-stage codegen.

Guarantee: NO false negatives (every probe row with a real partner
survives), so ``bloom_prefilter_join == plain join`` exactly — which is
also its SQL oracle. False positives only cost wasted shuffle; the rate
for n build keys is ~(1 - e^(-k*n/m))^k (k=5, m/n=32 bits/key → ~0.04%).

Hashing is xxhash64 (fixed seed) — deterministic and
partitioning-invariant, and JVM-native with no string round-trip (the
md5→hex→conv contract costs ~10x more per row and buys nothing here: the
oracle is the PLAIN JOIN, it never replays the hash, so cross-engine hash
equality is not required — only no-false-negatives, which any hash
satisfies). One 64-bit hash split into two halves drives k positions via
Kirsch-Mitzenmacher double hashing (h1 + i*h2 mod m).

Reference gap: the reference engine joins by aligned iteration only
(src/datapipeline/pipelines/streams/align.py); it has no join
pre-filtering at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BITS_DEFAULT = 1 << 18  # 256 Kbit = 4096 words; size for ~8k keys at <0.1% FP
K_DEFAULT = 5


def _positions(key, m_bits: int, k: int) -> list[F.Column]:
    """k bit positions for a key: double hashing off one xxhash64."""
    h = F.xxhash64(key, F.lit(42))
    h1 = F.shiftright(h, 33)  # 31 high bits, non-negative
    h2 = h.bitwiseAND(F.lit((1 << 31) - 1)).bitwiseOR(F.lit(1))  # odd → full-period
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_build(
    build: DataFrame, key: str, m_bits: int = M_BITS_DEFAULT, k: int = K_DEFAULT
) -> list[int]:
    """Aggregate the build side into a packed bitmap (list of m_bits/64
    longs). One bit_or aggregation — partial combine caps the shuffle at
    m/64 rows per map task; the collect is the finished bitmap, bounded by
    m regardless of build cardinality."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    words = (
        build.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("w"),
            F.expr("shiftleft(1L, int(pos % 64))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r.w] = r.bits
    return out


def bloom_filter_keys(
    probe: DataFrame,
    key: str,
    words: list[int],
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
) -> DataFrame:
    """Map-side filter: keep probe rows whose key hits all k bits. Pure
    JVM expressions against one array literal — no shuffle, no join.

    The bitmap is emitted as ONE parsed SQL expression, not ``F.lit(list)``:
    lit() on a 4096-element Python list expands to 4096 Py4J ``lit`` calls
    plus a 4096-arg ``array`` call (~7.5 s of pure driver-side round-trips
    per invocation, measured). A single ``F.expr("array(...L)")`` string is
    one Py4J call; Catalyst constant-folds the CreateArray into a literal
    before codegen, so the executed plan is identical."""
    arr = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    one = F.lit(1).cast("long")
    pred = None
    for pos in _positions(F.col(key), m_bits, k):
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + F.lit(1))
        bit = F.call_function("shiftleft", one, (pos % 64).cast("int"))
        cond = word.bitwiseAND(bit) != 0
        pred = cond if pred is None else (pred & cond)
    return probe.filter(pred)


def bloom_prefilter_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_DEFAULT,
    how: str = "inner",
) -> DataFrame:
    """probe ⋈ build with the probe side Bloom-filtered before the join
    shuffle. Exactly equal to the plain join (no false negatives; the join
    removes false positives) — which is its oracle.

    Inner joins only: pre-filtering the probe side would silently drop
    unmatched probe rows under left/outer semantics, so any other `how`
    is rejected rather than quietly wrong."""
    if how not in ("inner",):
        raise ValueError(
            "bloom_prefilter_join only preserves semantics for how='inner' "
            f"(got {how!r}): the probe-side pre-filter drops unmatched rows"
        )
    words = bloom_build(build, build_key, m_bits, k)
    filtered = bloom_filter_keys(probe, probe_key, words, m_bits, k)
    return filtered.join(build, filtered[probe_key] == build[build_key], how)
