"""Unit tests for Z-order keys (functions/zorder.py): bit-exactness against
a pure-python Morton reference, and the actual layout claim — chunks of a
zkey-sorted table have tight ranges on BOTH dimensions, where single-column
sort leaves the other dimension unclustered."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from datapipeline_spark.functions.zorder import zorder_key, zorder_sql


def _py_morton(a: int, b: int) -> int:
    out = 0
    for i in range(31):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_matches_python_reference(spark):
    rng = random.Random(7)
    rows = [(rng.randrange(2**31), rng.randrange(2**31)) for _ in range(200)]
    rows += [(0, 0), (2**31 - 1, 2**31 - 1), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r.z == _py_morton(r.a, r.b), (r.a, r.b)


def test_sql_rendering_matches_column(spark):
    import duckdb

    rows = [(i * 97 % 1000, i * 31 % 1000) for i in range(100)]
    df = spark.createDataFrame(rows, "a long, b long")
    ours = {(r.a, r.b): r.z for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = f"SELECT a, b, {zorder_sql('a', 'b')} AS z FROM t"
    theirs = {(a, b): z for a, b, z in con.execute(sql).fetchall()}
    assert ours == theirs


def test_locality_beats_single_column_sort():
    # 64x64 grid of (x, y) points; compare per-chunk y-range width when
    # sorted by morton key vs by x alone. Tight chunk ranges = row-group
    # stats that prune on y predicates.
    pts = [(x, y) for x in range(64) for y in range(64)]

    def avg_chunk_y_range(order):
        chunk = 64
        spans = []
        for i in range(0, len(order), chunk):
            ys = [y for _, y in order[i : i + chunk]]
            spans.append(max(ys) - min(ys))
        return sum(spans) / len(spans)

    by_x = sorted(pts)
    by_z = sorted(pts, key=lambda p: _py_morton(p[0], p[1]))
    # x-sort leaves y spanning the full domain in every chunk; z-sort keeps
    # chunks inside small tiles
    assert avg_chunk_y_range(by_x) == 63
    assert avg_chunk_y_range(by_z) <= 16
