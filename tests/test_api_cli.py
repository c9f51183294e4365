"""Python API + CLI tests (reference integrations/ml.py + cli/app.py)."""

from __future__ import annotations

import json

import pytest


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text, encoding="utf-8")


@pytest.fixture()
def project(tmp_path):
    root = tmp_path / "proj"
    data = [
        {"time": f"2024-01-01T{h:02d}:00:00Z", "loc": loc, "value": float(h + (10 if loc == "b" else 0))}
        for h in range(6)
        for loc in ("a", "b")
    ]
    _write(root / "data" / "m.jsonl", "\n".join(json.dumps(r) for r in data))
    _write(root / "project.yaml", "schema_version: 3\nname: api_demo\n")
    _write(
        root / "sources" / "m.yaml",
        """id: src.m
parser: { entrypoint: core.temporal_record }
loader: { transport: fs, path: data/m.jsonl, reader: { format: jsonl } }
""",
    )
    _write(
        root / "streams" / "m.yaml",
        """id: s.m
from: { source: src.m }
partition_by: [loc]
""",
    )
    _write(
        root / "dataset.yaml",
        """sample:
  cadence: 1h
  keys: [loc]
features:
  - { id: val, stream: s.m, field: value }
targets:
  - { id: tgt, stream: s.m, field: value }
""",
    )
    _write(root / "profiles" / "serve.dataset.yaml", "operation: dataset\n")
    _write(
        root / "profiles" / "serve.defaults.yaml",
        "output: { transport: fs, format: jsonl, directory: output }\n",
    )
    return root


def test_iter_samples(spark, project):
    from datapipeline_spark.api import iter_samples

    got = list(iter_samples(spark, project))
    assert len(got) == 12
    assert set(got[0]) == {"time", "loc", "val", "tgt"}
    by_key = {(s["time"].hour, s["loc"]): s["val"] for s in got}
    assert by_key[(3, "a")] == 3.0 and by_key[(3, "b")] == 13.0


def test_iter_samples_limit(spark, project):
    from datapipeline_spark.api import iter_samples

    assert len(list(iter_samples(spark, project, limit=5))) == 5


def test_iter_model_batches(spark, project):
    import numpy as np

    from datapipeline_spark.api import iter_model_batches

    batches = list(iter_model_batches(spark, project, batch_size=5))
    assert [b.features.shape[0] for b in batches] == [5, 5, 2]
    b0 = batches[0]
    assert b0.features.dtype == np.float32
    assert b0.columns == ["val"] and b0.target_columns == ["tgt"]
    assert b0.targets.shape == b0.features.shape
    all_vals = np.concatenate([b.features[:, 0] for b in batches])
    assert sorted(all_vals.tolist()) == sorted(
        float(h + extra) for h in range(6) for extra in (0, 10)
    )


def test_model_batches_reject_nonfinite(spark, tmp_path):
    from datapipeline_spark.api import iter_model_batches

    root = tmp_path / "p"
    data = [
        {"time": "2024-01-01T00:00:00Z", "value": 1.0},
        {"time": "2024-01-01T02:00:00Z", "value": 2.0},
    ]
    _write(root / "data" / "m.jsonl", "\n".join(json.dumps(r) for r in data))
    _write(root / "project.yaml", "schema_version: 3\nname: nf\n")
    _write(
        root / "sources" / "m.yaml",
        """id: src.m
parser: { entrypoint: core.temporal_record }
loader: { transport: fs, path: data/m.jsonl, reader: { format: jsonl } }
""",
    )
    _write(
        root / "streams" / "m.yaml",
        """id: s.m
from: { source: src.m }
transforms:
  - { operation: ensure_cadence, cadence: 1h }
""",
    )
    _write(
        root / "dataset.yaml",
        """sample:
  cadence: 1h
features:
  - { id: val, stream: s.m, field: value }
""",
    )
    with pytest.raises(ValueError, match="non-finite"):
        list(iter_model_batches(spark, root))
    # non-strict mode passes NaN through
    batches = list(iter_model_batches(spark, root, strict_finite=False))
    assert batches[0].features.shape == (3, 1)


def test_cli_serve_and_build(spark, project, capsys):
    from datapipeline_spark import cli

    rc = cli.main(["build", str(project)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "series\tbuilt" in out

    rc = cli.main(["build", str(project)])
    assert "fresh (skipped)" in capsys.readouterr().out
    assert rc == 0

    rc = cli.main(["serve", str(project), "--run-id", "testrun"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "all.full" in out
    out_path = project / "output" / "runs" / "testrun" / "dataset" / "dataset.all.full.jsonl"
    assert out_path.exists()
    lines = [
        json.loads(l)
        for part in sorted(out_path.glob("part-*"))
        for l in part.read_text().splitlines()
        if l.strip()
    ]
    assert len(lines) == 12
    assert (project / "output" / "runs" / "latest").exists()


def test_cli_inspect_and_materialize(spark, project, tmp_path, capsys):
    from datapipeline_spark import cli

    rc = cli.main(["inspect", str(project)])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["project"] == "api_demo"
    assert info["streams"]["s.m"]["partition_by"] == ["loc"]
    assert info["dataset"]["features"] == ["val"]

    out = tmp_path / "mat.jsonl"
    rc = cli.main(["materialize", str(project), "s.m", str(out)])
    assert rc == 0
    assert out.exists()


def test_preview_stages(spark, project, capsys):
    from datapipeline_spark import cli
    from datapipeline_spark.api import preview

    df = preview(spark, project, "records", stream="s.m")
    assert set(df.columns) >= {"time", "loc", "value"}
    series = preview(spark, project, "series")
    assert set(series.columns) >= {"series_id", "time", "value"}
    samples = preview(spark, project, "samples")
    assert "__split__" not in samples.columns
    final = preview(spark, project, "postprocess")
    assert final.count() == 12

    rc = cli.main(["preview", str(project), "samples", "--limit", "3"])
    assert rc == 0
    assert "val" in capsys.readouterr().out

    with pytest.raises(ValueError, match="requires stream"):
        preview(spark, project, "records")


def test_preview_input_and_canonical_stages(spark, project):
    """The two record-level boundaries the reference exposes before the
    full stream (config/preview.py:4-20, operations/runtime/dataset.py:
    150-172): `input` = loader→parser output, `canonical` = after the
    mapper; derived streams return the upstream's records at both."""
    from datapipeline_spark.api import preview

    # a stream with a canonical mapper: input sees raw (time, loc, value),
    # canonical sees the mapper's (time, value) projection
    _write(
        project / "streams" / "m2.yaml",
        """id: s.m2
from: { source: src.m }
partition_by: []
map: { entrypoint: encode_time, args: { mode: linear } }
""",
    )
    inp = preview(spark, project, "input", stream="s.m2")
    assert set(inp.columns) >= {"time", "loc", "value"}
    canon = preview(spark, project, "canonical", stream="s.m2")
    assert set(canon.columns) == {"time", "value"}
    assert canon.count() == inp.count() == 12

    # no mapper: input == canonical == the parsed frame
    no_map = preview(spark, project, "canonical", stream="s.m")
    assert no_map.columns == preview(spark, project, "input", stream="s.m").columns

    # derived stream: both boundaries are the UPSTREAM stream's records —
    # even when the derived stream declares its OWN mapper (the reference
    # truncates at the upstream's stage count, dataset.py:151-157, so the
    # derived mapper first appears at `records`)
    _write(
        project / "streams" / "d.yaml",
        """id: s.d
from: { stream: s.m }
map: { entrypoint: encode_time, args: { mode: linear } }
""",
    )
    up = preview(spark, project, "records", stream="s.m")
    for point in ("input", "canonical"):
        got = preview(spark, project, point, stream="s.d")
        assert got.columns == up.columns and got.count() == up.count()
    assert set(preview(spark, project, "records", stream="s.d").columns) == {
        "time",
        "value",
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires stream"):
        preview(spark, project, "input")


def test_sql_over_project_streams(spark, project):
    """register_views exposes compiled streams as lazy temp views; spark.sql
    composes with the whole transform chain through Catalyst."""
    from datapipeline_spark.api import register_views, sql

    names = register_views(spark, project_dir=project)
    assert "s_m" in names
    out = sql(
        spark,
        "SELECT loc, count(*) AS n, round(avg(value), 2) AS avg_v "
        "FROM s_m GROUP BY loc ORDER BY loc",
    )
    rows = out.collect()
    assert [r.loc for r in rows] == ["a", "b"]
    assert rows[0].n == 6 and rows[1].n == 6
    assert rows[1].avg_v == rows[0].avg_v + 10.0


def test_sql_over_raw_tables(spark):
    from datapipeline_spark.api import sql

    df = sql(
        spark,
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
        tables_dir="/root/testdata/sf0.001",
    )
    assert df.collect()[0].n == 6000


def test_cli_sql_over_project(spark, project, capsys):
    from datapipeline_spark import cli

    rc = cli.main(["sql", "SELECT count(*) AS n FROM s_m", "--project", str(project)])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "n" and out[1] == "12"


def test_cli_checksum(spark, tmp_path, capsys):
    from datapipeline_spark import cli

    p = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr("id AS k", "id % 7 AS v", "cast(id as double) AS f").write.parquet(p)

    rc = cli.main(["checksum", p, "--cols", "k,v", "--buckets", "4"])
    out = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in out.strip().splitlines() if l]
    assert lines[0].split("\t") == ["bucket", "n_rows", "hash_sum", "hash_xor"]
    assert sum(int(l.split("\t")[1]) for l in lines[1:]) == 100

    # float columns are rejected (digest strings are not engine-portable)
    rc = cli.main(["checksum", p, "--cols", "k,f"])
    assert rc == 2


def test_cli_stats(spark, tmp_path, capsys):
    from datapipeline_spark import cli

    p = str(tmp_path / "s.parquet")
    spark.range(400).selectExpr(
        "cast(id % 2 as bigint) AS s",
        "cast(id % 40 + 1 as bigint) AS v",
        "cast(id % 5 = 0 as int) + cast(0 as bigint) AS conv",
        "cast(id as double) AS f",
    ).write.parquet(p)

    rc = cli.main(["stats", "ks", p, "--value", "v", "--side", "s"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.splitlines()[0].split("\t") == ["n0", "n1", "d_num", "ks"]

    rc = cli.main(["stats", "ztest", p, "--value", "conv", "--side", "s"])
    out = capsys.readouterr().out
    assert rc == 0 and out.splitlines()[0].split("\t") == ["n0", "c0", "n1", "c1", "z"]

    rc = cli.main(["stats", "mw", p, "--value", "v", "--side", "s"])
    assert rc == 0

    # integer discipline: float value column rejected for ks/benford/pearson
    rc = cli.main(["stats", "ks", p, "--value", "f", "--side", "s"])
    assert rc == 2
    rc = cli.main(["stats", "pearson", p, "-x", "f", "-y", "v"])
    assert rc == 2
    rc = cli.main(["stats", "spearman", p, "-x", "f", "-y", "v"])
    assert rc == 0  # rank-based: floats are fine


def test_cli_stats_did(spark, tmp_path, capsys):
    from datapipeline_spark import cli

    p = str(tmp_path / "did.parquet")
    spark.range(200).selectExpr(
        "id % 2 = 0 AS treat",
        "id % 4 < 2 AS post",
        "cast(id % 10 * 100 as bigint) AS cents",
    ).write.parquet(p)
    rc = cli.main(["stats", "did", p, "-x", "treat", "-y", "post", "--value", "cents"])
    out = capsys.readouterr().out
    assert rc == 0
    header = out.splitlines()[0].split("\t")
    assert header[:4] == ["n_t1", "n_t0", "n_c1", "n_c0"] and "did" in header


def test_cli_stats_wmedian_and_mk(spark, tmp_path, capsys):
    from datapipeline_spark import cli

    p = str(tmp_path / "wm.parquet")
    spark.range(60).selectExpr(
        "cast(id % 2 as bigint) AS g",
        "cast(id as bigint) AS o",
        "cast((id * 13) % 50 as bigint) AS v",
        "cast(id % 4 + 1 as bigint) AS w",
        "cast(id as double) AS f",
    ).write.parquet(p)

    rc = cli.main(["stats", "wmedian", p, "--value", "v", "-x", "w", "--by", "g"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.splitlines()[0].split("\t") == ["g", "weighted_median", "total_weight"]

    rc = cli.main(["stats", "mk", p, "--value", "v", "-x", "o", "--by", "g"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.splitlines()[0].split("\t") == ["g", "n", "s", "var18"]

    # integer discipline: float value rejected
    rc = cli.main(["stats", "wmedian", p, "--value", "f", "-x", "w", "--by", "g"])
    assert rc == 2


def test_cli_stats_ols2(spark, tmp_path, capsys):
    from datapipeline_spark import cli

    p = str(tmp_path / "o2.parquet")
    spark.range(80).selectExpr(
        "cast(id % 9 as bigint) AS a",
        "cast((id * 5) % 7 as bigint) AS b",
        "cast(4 * (id % 9) - 3 * ((id * 5) % 7) + 11 as bigint) AS y",
    ).write.parquet(p)
    rc = cli.main(["stats", "ols2", p, "-x", "a", "-y", "b", "--value", "y"])
    out = capsys.readouterr().out
    assert rc == 0
    head, row = out.splitlines()[:2]
    assert head.split("\t") == ["n", "b1", "b2", "intercept"]
    vals = row.split("\t")
    assert float(vals[1]) == 4.0 and float(vals[2]) == -3.0
