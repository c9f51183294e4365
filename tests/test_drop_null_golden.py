"""Drop-null fixture ported end-to-end (reference
tests/integration/test_integration_drop_null.py +
tests/fixtures/drop_null_project/): a synthetic 2h tick source mapped
through encode_time(linear), ensure_cadence(1h) filling the odd hours with
nulls, and a samples-features threshold of 1.0 dropping exactly the filled
buckets — only the original ticks survive, with epoch-second values.
"""

from __future__ import annotations

import datetime as dt

import pytest


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text, encoding="utf-8")


@pytest.fixture()
def project(tmp_path):
    root = tmp_path / "dropnull"
    _write(
        root / "project.yaml",
        """schema_version: 3
name: drop_null_project
globals:
  start_time: 2024-01-01T00:00:00Z
  end_time: 2024-01-01T04:00:00Z
""",
    )
    _write(
        root / "sources" / "synthetic.ticks.yaml",
        """id: synthetic.ticks
parser: { entrypoint: core.synthetic.ticks }
loader:
  entrypoint: core.synthetic.ticks
  args: { start: "${start_time}", end: "${end_time}", frequency: 2h }
""",
    )
    _write(
        root / "streams" / "linear.yaml",
        """id: time.ticks.linear
from: { source: synthetic.ticks }
map: { entrypoint: encode_time, args: { mode: linear } }
preprocess:
  - { operation: where, operator: ge, field: time, comparand: "${start_time}" }
  - { operation: where, operator: le, field: time, comparand: "${end_time}" }
transforms:
  - { operation: ensure_cadence, cadence: 1h }
""",
    )
    _write(
        root / "dataset.yaml",
        """sample:
  cadence: 1h
features:
  - { id: time_linear, stream: time.ticks.linear, field: value }
targets: []
postprocess:
  samples:
    features:
      threshold: 1.0
""",
    )
    return root


def test_drop_null_golden(spark, project):
    from datapipeline_spark.plans import compile_project, load_project
    from datapipeline_spark.plans.dataset_build import build_dataset

    build = build_dataset(compile_project(spark, load_project(project)))
    out = build.outputs()[("all", "full")]
    rows = out.orderBy("time").collect()

    # 2h ticks over [00:00, 04:00] → hours 0/2/4; cadence-filled 1/3 dropped
    assert [r["time"].hour for r in rows] == [0, 2, 4]
    # (Spark collects session-UTC naive datetimes; the reference asserts a
    # tz-aware UTC object — same instant, different driver representation.)
    for r in rows:
        expected = dt.datetime(
            2024, 1, 1, r["time"].hour, tzinfo=dt.timezone.utc
        ).timestamp()
        assert r["time_linear"] == pytest.approx(expected)
