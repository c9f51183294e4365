"""Multi-value bucket semantics (reference operations/artifacts/series.py:
336-367 + tests/unit/pipeline/test_sample_regressions.py:570-651): a series
whose cadence buckets hold more than one observation becomes a fixed-length
list cell (time-ordered), absent buckets conform to [null]*length, the
metadata contract rejects mixed multiplicities, and scaling applies
elementwise to list cells after stream-level fill."""

from __future__ import annotations

import json

import pytest


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text, encoding="utf-8")


def _project(tmp_path, ap_rows):
    root = tmp_path / "mv"
    _write(
        root / "data" / "ap.jsonl",
        "\n".join(json.dumps(r) for r in ap_rows),
    )
    _write(
        root / "data" / "ws.jsonl",
        "\n".join(
            json.dumps(r)
            for r in [
                {"time": "2024-01-01T00:00:00Z", "value": 5.0},
                {"time": "2024-01-01T01:00:00Z", "value": None},
            ]
        ),
    )
    _write(root / "project.yaml", "schema_version: 3\nname: multivalue\n")
    for name in ("ap", "ws"):
        _write(
            root / "sources" / f"{name}.yaml",
            f"""id: src.{name}
parser: {{ entrypoint: core.temporal_record }}
loader: {{ transport: fs, path: data/{name}.jsonl, reader: {{ format: jsonl }} }}
""",
        )
    _write(
        root / "streams" / "ap.yaml",
        """id: s.ap
from: { source: src.ap }
transforms:
  - { operation: fill, statistic: median, window: 10, min_samples: 1, field: value }
""",
    )
    _write(
        root / "streams" / "ws.yaml",
        """id: s.ws
from: { source: src.ws }
transforms:
  - { operation: fill, statistic: mean, window: 10, min_samples: 1, field: value }
""",
    )
    _write(
        root / "dataset.yaml",
        """sample:
  cadence: 1h
features:
  - { id: air_pressure, stream: s.ap, field: value, scale: true }
  - { id: wind_speed, stream: s.ws, field: value, scale: true }
targets: []
""",
    )
    return root


AP = [
    {"time": "2024-01-01T00:10:00Z", "value": 1000.0},
    {"time": "2024-01-01T00:20:00Z", "value": None},  # filled → median(1000)
    {"time": "2024-01-01T00:40:00Z", "value": 1100.0},
]


def test_fill_then_scale_multivalue_bucket(spark, tmp_path):
    from datapipeline_spark.plans import compile_project, load_project
    from datapipeline_spark.plans.dataset_build import build_dataset

    build = build_dataset(compile_project(spark, load_project(_project(tmp_path, AP))))
    out = build.outputs()[("all", "full")]
    rows = out.orderBy("time").collect()
    assert [r["time"].hour for r in rows] == [0, 1]

    # air_pressure bucket 0 = [1000 (obs), 1000 (filled), 1100] scaled
    # elementwise with corpus stats mean=3100/3, pstdev=sqrt(2222.2)
    ap0 = rows[0]["air_pressure"]
    assert ap0 == pytest.approx([-0.7071067, -0.7071067, 1.4142135], rel=1e-5)
    # absent bucket conforms to [null]*3
    assert list(rows[1]["air_pressure"]) == [None, None, None]
    # wind_speed stays scalar; both values 5.0 (one filled) → std ε-clamped → 0
    assert rows[0]["wind_speed"] == pytest.approx(0.0)
    assert rows[1]["wind_speed"] == pytest.approx(0.0)


def test_mixed_multiplicity_rejected(spark, tmp_path):
    from datapipeline_spark.plans import compile_project, load_project
    from datapipeline_spark.plans.dataset_build import build_dataset

    # hour 0 has 3 values, hour 2 has 1 → mixed scalar/list kinds
    ap = AP + [{"time": "2024-01-01T02:00:00Z", "value": 1200.0}]
    with pytest.raises(ValueError, match="multiplicit"):
        build_dataset(compile_project(spark, load_project(_project(tmp_path, ap))))
