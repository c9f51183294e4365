from __future__ import annotations

import gzip
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from datapipeline_spark.io import materialize, run_output_path, write_csv, write_jsonl, write_parquet
from datapipeline_spark.sources import (
    read_csv,
    read_json,
    read_jsonl,
    temporal_csv,
    time_ticks,
)


def test_read_csv_semicolon_strict(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("time;value\n2024-01-01T00:00:00;1.5\n2024-01-01T01:00:00;2.5\n")
    df = read_csv(spark, str(p))
    assert df.columns == ["time", "value"]
    assert df.count() == 2


def test_read_csv_duplicate_header_rejected(spark, tmp_path):
    p = tmp_path / "dup.csv"
    p.write_text("a;b;a\n1;2;3\n")
    with pytest.raises(ValueError, match="duplicate header"):
        read_csv(spark, str(p))


def test_read_csv_bad_delimiter(spark):
    with pytest.raises(ValueError, match="single character"):
        read_csv(spark, "/nonexistent", delimiter=";;")


def test_temporal_csv_decimal_comma(spark, tmp_path):
    p = tmp_path / "el.csv"
    p.write_text(
        'HourUTC;PriceArea;SpotPriceDKK\n'
        '2022-01-01 03:00;DK1;124,51\n'
        '2022-01-01 04:00;DK1;"1.234,56"\n'
    )
    df = temporal_csv(
        spark,
        str(p),
        time_field="HourUTC",
        time_format="yyyy-MM-dd HH:mm",
        value_fields={"price": "SpotPriceDKK"},
        attrs=["PriceArea"],
        decimal=",",
    )
    rows = {r["time"].hour: r for r in df.collect()}
    assert rows[3]["price"] == 124.51
    assert rows[3]["PriceArea"] == "DK1"


def test_gzip_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = str(tmp_path / "out")
    write_jsonl(df, out, gzip=True)
    files = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert files
    back = read_jsonl(spark, out, schema="id long, s string")
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_read_json_array_field(spark, tmp_path):
    p = tmp_path / "doc.json"
    p.write_text('{"meta": "x", "records": [{"v": 1}, {"v": 2}]}')
    df = read_json(spark, str(p), array_field="records")
    assert sorted(r["v"] for r in df.collect()) == [1, 2]


def test_time_ticks_bounds_and_count(spark):
    df = time_ticks(spark, "2024-01-01T00:00:00Z", "2024-01-01T04:00:00Z", "1h")
    times = sorted(r["time"] for r in df.collect())
    assert len(times) == 5
    assert times[0] == datetime(2024, 1, 1, 0) and times[-1] == datetime(2024, 1, 1, 4)


def test_time_ticks_large_distributed(spark):
    # a year of minutes: 525k+ ticks without driver materialization
    df = time_ticks(spark, "2024-01-01T00:00:00Z", "2024-12-31T23:59:00Z", "1min")
    assert df.count() == 527040


def test_materialize_checkpoint(spark, tmp_path):
    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    back = materialize(df, str(tmp_path / "chk"), format="parquet")
    assert sorted(r["v"] for r in back.collect()) == [1.0, 2.0]


def test_run_output_layout(tmp_path):
    p = run_output_path(str(tmp_path), "r1", "prices", fold="f0", role="train", ext="parquet")
    assert p.endswith("runs/r1/dataset/prices.f0.train.parquet")
    assert os.path.isdir(os.path.dirname(p))
    assert os.readlink(os.path.join(tmp_path, "runs", "latest")) == "r1"
    p2 = run_output_path(str(tmp_path), "r2", "prices")
    assert p2.endswith("runs/r2/dataset/prices.parquet")
    assert os.readlink(os.path.join(tmp_path, "runs", "latest")) == "r2"


def test_write_csv_parquet(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    write_csv(df, str(tmp_path / "c"))
    write_parquet(df, str(tmp_path / "p"))
    assert spark.read.option("header", True).csv(str(tmp_path / "c")).count() == 1
    assert spark.read.parquet(str(tmp_path / "p")).count() == 1


def test_write_table_dynamic_partition_overwrite(spark, tmp_path):
    from datapipeline_spark.io.writers import write_table

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 11.0), ("b", 1, 20.0)], "part string, k int, v double"
    )
    write_table(base, path, partition_by=["part"], sort_by=["k"])
    assert spark.read.parquet(path).count() == 3

    # incremental backfill of partition b only: a must be untouched
    patch = spark.createDataFrame([("b", 9, 99.0)], "part string, k int, v double")
    write_table(patch, path, partition_by=["part"], overwrite_partitions=True)
    got = {(r["part"], r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {("a", 1, 10.0), ("a", 2, 11.0), ("b", 9, 99.0)}

    # whole-table overwrite without the flag replaces everything
    write_table(patch, path, partition_by=["part"])
    assert spark.read.parquet(path).count() == 1

    with pytest.raises(ValueError, match="partition_by"):
        write_table(patch, path, overwrite_partitions=True)


def test_write_table_partition_pruning(spark, tmp_path):
    from datapipeline_spark.io.writers import write_table

    path = str(tmp_path / "pruned")
    df = spark.range(100).selectExpr("id % 4 AS part", "id AS k", "id * 1.0 AS v")
    write_table(df, path, partition_by=["part"])
    plan = (
        spark.read.parquet(path)
        .filter("part = 2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partition filter handled by the file index, not a data-scan Filter
    assert "PartitionFilters: [isnotnull(part" in plan


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    from datapipeline_spark.io.writers import write_bucketed_table

    left = spark.range(1000).selectExpr("id AS k", "id * 2.0 AS lv")
    right = spark.range(1000).selectExpr("id AS k", "id * 3.0 AS rv")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed_table(
            left, "bk_left", ["k"], 4, sort_by=["k"], path=str(tmp_path / "bl")
        )
        write_bucketed_table(
            right, "bk_right", ["k"], 4, sort_by=["k"], path=str(tmp_path / "br")
        )
        # force the fact-to-fact (sort-merge) path a 100 TB join would take —
        # at test scale the planner would otherwise just broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucket reads: no Exchange on either join side
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_ensure_bucketed_table_reregisters_without_rewrite(spark, tmp_path):
    """Cross-process staging cache: after the catalog entry is gone (a new
    process), ensure_bucketed_table must re-register the finished files by
    DDL — no rewrite (file mtimes untouched), identical rows, and the
    bucket metadata restored so the co-located join still plans with zero
    Exchange."""
    import os

    from datapipeline_spark.io.writers import ensure_bucketed_table

    path_l = str(tmp_path / "el")
    path_r = str(tmp_path / "er")
    left = spark.range(500).selectExpr("id AS k", "id * 2.0 AS lv")
    right = spark.range(500).selectExpr("id AS k", "id * 3.0 AS rv")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        ensure_bucketed_table(spark, lambda: left, "eb_left", ["k"], 4, ["k"], path_l)
        ensure_bucketed_table(spark, lambda: right, "eb_right", ["k"], 4, ["k"], path_r)
        mtimes = {
            f: os.stat(os.path.join(path_l, f)).st_mtime_ns
            for f in os.listdir(path_l)
            if f.endswith(".parquet")
        }
        # simulate a fresh process: catalog entry gone, external files remain
        spark.sql("DROP TABLE eb_left")
        spark.sql("DROP TABLE eb_right")
        calls = {"n": 0}

        def boom():
            calls["n"] += 1
            return left

        t_l = ensure_bucketed_table(spark, boom, "eb_left", ["k"], 4, ["k"], path_l)
        t_r = ensure_bucketed_table(
            spark, lambda: right, "eb_right", ["k"], 4, ["k"], path_r
        )
        assert calls["n"] == 0  # hit path never builds the source frame
        assert {
            f: os.stat(os.path.join(path_l, f)).st_mtime_ns
            for f in os.listdir(path_l)
            if f.endswith(".parquet")
        } == mtimes  # no rewrite
        assert t_l.count() == 500
        assert sorted(r.k for r in t_l.limit(5).collect()) == sorted(
            r.k for r in spark.table("eb_left").limit(5).collect()
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = t_l.join(t_r, "k")
        assert joined.count() == 500
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS eb_left")
        spark.sql("DROP TABLE IF EXISTS eb_right")


def test_write_pickle_roundtrip_atomic(spark, tmp_path):
    import pickle

    from datapipeline_spark.io import write_pickle

    path = str(tmp_path / "out.pkl")
    df = spark.range(5).selectExpr("id", "id * 1.5 AS v", "concat('r', id) AS s")
    n = write_pickle(df, path)
    assert n == 5
    assert not os.path.exists(path + ".tmp")  # atomic rename, no temp left
    items = []
    with open(path, "rb") as fh:
        while True:
            try:
                items.append(pickle.load(fh))
            except EOFError:
                break
    assert len(items) == 5
    assert {it["id"] for it in items} == set(range(5))
    assert items[0].keys() == {"id", "v", "s"}
    with pytest.raises(FileExistsError):
        write_pickle(df, path, overwrite=False)


def test_write_stdout_jsonl_and_txt(spark):
    import io as _io
    import json

    from datapipeline_spark.io import write_stdout

    df = spark.range(3).selectExpr("id", "concat('x', id) AS s")
    buf = _io.StringIO()
    n = write_stdout(df, format="jsonl", stream=buf)
    assert n == 3
    lines = [json.loads(l) for l in buf.getvalue().strip().split("\n")]
    assert {l["s"] for l in lines} == {"x0", "x1", "x2"}

    buf = _io.StringIO()
    n = write_stdout(df.select("s"), format="txt", limit=2, stream=buf)
    assert n == 2
    assert all(l.startswith("x") for l in buf.getvalue().strip().split("\n"))

    with pytest.raises(ValueError, match="one"):
        write_stdout(df, format="txt", stream=_io.StringIO())
    with pytest.raises(ValueError, match="Unsupported"):
        write_stdout(df, format="xml", stream=_io.StringIO())


def test_orc_roundtrip(spark, tmp_path):
    from datapipeline_spark.io import write_orc
    from datapipeline_spark.sources import read_orc_glob

    df = spark.range(100).selectExpr("id", "id * 2 AS v", "CAST(id % 3 AS STRING) AS k")
    path = str(tmp_path / "t.orc")
    write_orc(df, path, partition_by=["k"])
    back = read_orc_glob(spark, path)
    assert back.count() == 100
    assert {r.v for r in back.filter("id < 3").collect()} == {0, 2, 4}
    # partition pruning reaches the ORC scan
    plan = back.filter("k = '1'")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(k" in plan


def test_compact_files(spark, tmp_path):
    import os

    from datapipeline_spark.io import compact_files

    path = str(tmp_path / "frag.parquet")
    # fragment: 24 tiny files
    spark.range(10000).selectExpr("id", "id % 7 AS k").repartition(24).write.parquet(path)
    n_before = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert n_before == 24
    before = spark.read.parquet(path).groupBy().sum("id", "k").collect()
    n_after = compact_files(spark, path, target_file_mb=128, sort_within_by=["k"])
    assert n_after == 1  # tiny data -> one target-sized file
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == n_after
    after = spark.read.parquet(path).groupBy().sum("id", "k").collect()
    assert before == after


def test_compact_files_recovers_interrupted_swap(spark, tmp_path):
    """Crash between the two swap renames leaves the table at __old__;
    the next invocation must restore it and complete a clean compaction
    (no data stranded, no reader-visible residue)."""
    import os

    from datapipeline_spark.io import compact_files

    path = str(tmp_path / "t")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").repartition(8).write.parquet(path)
    # simulate the torn state: path renamed away, staging left behind
    os.rename(path, path + "__old__")
    os.makedirs(path + "__compacting__")
    with open(path + "__compacting__/garbage", "w") as f:
        f.write("stale")

    n = compact_files(spark, path, target_file_mb=128)
    assert n == 1
    assert not os.path.exists(path + "__old__")
    assert not os.path.exists(path + "__compacting__")
    assert spark.read.parquet(path).count() == 100


def test_versioned_table_commit_timetravel_compact_vacuum(spark, tmp_path):
    """Manifest-based table: atomic version commits, time travel, atomic
    compaction (old versions stay readable), vacuum reclaims only
    unreferenced data dirs."""
    import os

    from datapipeline_spark.io import (
        compact_version,
        current_version,
        read_version,
        vacuum,
        write_version,
    )

    path = str(tmp_path / "vt")
    v1 = write_version(spark, spark.range(0, 10).selectExpr("id", "id * 2 AS v"), path)
    v2 = write_version(spark, spark.range(10, 15).selectExpr("id", "id * 2 AS v"), path)
    assert (v1, v2) == (1, 2) and current_version(spark, path) == 2
    assert read_version(spark, path).count() == 15
    assert read_version(spark, path, 1).count() == 10  # time travel

    v3 = compact_version(spark, path)
    assert v3 == 3 and read_version(spark, path).count() == 15
    assert read_version(spark, path, 2).count() == 15  # old version intact

    # overwrite starts a fresh file list
    v4 = write_version(
        spark, spark.range(100, 103).selectExpr("id", "id AS v"), path, mode="overwrite"
    )
    assert read_version(spark, path).count() == 3

    # grace_minutes=0: the test's dirs are seconds old; production default
    # (60 min) would skip them to protect concurrent in-flight writers
    removed = vacuum(spark, path, keep_last=2, grace_minutes=0)  # keeps v3, v4
    assert removed >= 1
    assert read_version(spark, path, 4).count() == 3
    assert read_version(spark, path, 3).count() == 15
    import pytest

    with pytest.raises(Exception):
        read_version(spark, path, 1)  # vacuumed away

    # a crashed commit leaves only a tmp manifest — invisible to readers,
    # reclaimed by vacuum; a PUBLISHED vN manifest is a committed version
    # that is never deleted or superseded: the next writer serializes
    # after it instead of clobbering it (no lost writes)
    man_dir = os.path.join(path, "_manifests")
    with open(os.path.join(man_dir, ".tmp-deadbeef.json"), "w") as f:
        f.write('{"version": 99, "mode": "append", "dirs": []}')
    assert current_version(spark, path) == 4  # tmp is invisible
    with open(os.path.join(man_dir, "v00000005.json"), "w") as f:
        f.write('{"version": 5, "mode": "append", "dirs": []}')
    assert current_version(spark, path) == 5  # committed the instant it appears
    v6 = write_version(spark, spark.range(1).selectExpr("id", "id AS v"), path)
    assert v6 == 6 and read_version(spark, path).count() == 1
    assert os.path.exists(os.path.join(man_dir, "v00000005.json"))  # untouched
    vacuum(spark, path, keep_last=2, grace_minutes=0)
    assert not os.path.exists(os.path.join(man_dir, ".tmp-deadbeef.json"))
    # and with the default grace period a FRESH unreferenced dir survives
    with open(os.path.join(man_dir, ".tmp-inflight.json"), "w") as f:
        f.write('{}')
    vacuum(spark, path, keep_last=2)
    assert os.path.exists(os.path.join(man_dir, ".tmp-inflight.json"))
    os.remove(os.path.join(man_dir, ".tmp-inflight.json"))


def test_versioned_table_schema_evolution(spark, tmp_path):
    from datapipeline_spark.io import read_version, write_version

    path = str(tmp_path / "evo")
    write_version(spark, spark.range(3).selectExpr("id"), path)
    write_version(spark, spark.range(3, 5).selectExpr("id", "id * 2 AS extra"), path)
    df = read_version(spark, path)
    assert set(df.columns) == {"id", "extra"}
    rows = {r.id: r.extra for r in df.collect()}
    assert rows[1] is None and rows[4] == 8  # old files null-fill new column
