"""Incomplete-prices fixture ported end-to-end with the reference's golden
values (tests/integration/test_integration_incomplete_real_data.py:66-90 +
tests/fixtures/incomplete_prices_project/): messy real-world CSV (decimal
comma, naive timestamps, attribute projection), ensure_cadence + mean-fill
over gaps, per-area partition suffixes, sequence stride gating, row-coverage
postprocess. Data fixture: tests/fixtures_data/Elspotprices.csv (verbatim
copy of the reference's public test data, required for value-identical
golden assertions).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

DATA = Path(__file__).parent / "fixtures_data" / "Elspotprices.csv"


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text, encoding="utf-8")


@pytest.fixture()
def project(tmp_path):
    root = tmp_path / "prices"
    (root / "data").mkdir(parents=True)
    shutil.copy(DATA, root / "data" / "Elspotprices.csv")
    _write(
        root / "project.yaml",
        """schema_version: 3
name: incomplete_prices
globals:
  start_time: 2022-01-01T03:00:00Z
  end_time: 2022-01-01T10:00:00Z
""",
    )
    _write(
        root / "sources" / "elspot.yaml",
        """id: incomplete.elspot
parser:
  entrypoint: core.temporal.csv
  args:
    time_field: HourUTC
    value_field: SpotPriceEUR
    decimal: ","
    attributes: { area: PriceArea }
loader:
  transport: fs
  path: data/Elspotprices.csv
  reader: { format: csv, delimiter: ";" }
""",
    )
    _write(
        root / "streams" / "elspot.yaml",
        """id: metrics.elspot.eur
from: { source: incomplete.elspot }
partition_by: [area]
preprocess:
  - { operation: where, operator: ge, field: time, comparand: "${start_time}" }
  - { operation: where, operator: le, field: time, comparand: "${end_time}" }
transforms:
  - { operation: ensure_cadence, cadence: 1h }
  - { operation: fill, statistic: mean, window: 2, min_samples: 1, field: value }
""",
    )
    _write(
        root / "dataset.yaml",
        """sample:
  cadence: 1h
features:
  - { id: spot_eur_scaled, stream: metrics.elspot.eur, field: value, scale: true }
  - id: spot_eur_sequence
    stream: metrics.elspot.eur
    field: value
    sequence: { size: 3, stride: 2 }
targets: []
postprocess:
  samples:
    features:
      threshold: 0.4
""",
    )
    return root


def test_incomplete_prices_golden(spark, project):
    from datapipeline_spark.plans import compile_project, load_project
    from datapipeline_spark.plans.dataset_build import build_dataset

    build = build_dataset(compile_project(spark, load_project(project)))
    out = build.outputs()[("all", "full")]
    rows = out.orderBy("time").collect()

    # reference: 8 samples survive the 0.4 coverage threshold, first at 03:00
    assert len(rows) == 8
    first = rows[0]
    assert first["time"].hour == 3
    # 7 areas x 2 feature ids = 14 feature columns (+ time)
    assert len([c for c in out.columns if c != "time"]) == 14

    assert first["spot_eur_scaled__@area:DK1"] == pytest.approx(
        -1.0020365384, rel=1e-6
    )
    assert first["spot_eur_scaled__@area:SYSTEM"] == pytest.approx(
        -1.3841396412, rel=1e-6
    )
    assert all(v is None for v in first["spot_eur_sequence__@area:DK1"])

    # stride keeps only alternating buckets populated
    assert all(v is None for v in rows[1]["spot_eur_sequence__@area:DK1"])
    assert rows[2]["spot_eur_sequence__@area:DK1"] == pytest.approx(
        [37.669998, 39.700001, 40.59], rel=1e-6
    )


def test_vertical_drop_counts_absent_sequence_opportunities(spark, project):
    """Column selection at threshold 1.0 drops the stride-gated sequence
    columns (absent windows count as missed opportunities) but keeps the
    fully-covered scalar columns (reference
    tests/integration/test_integration_vertical_drop_build_metadata.py)."""
    import yaml

    from datapipeline_spark.plans import compile_project, load_project
    from datapipeline_spark.plans.dataset_build import build_dataset

    ds = project / "dataset.yaml"
    cfg = yaml.safe_load(ds.read_text())
    cfg["postprocess"] = {"columns": {"features": {"threshold": 1.0}}}
    ds.write_text(yaml.safe_dump(cfg), encoding="utf-8")

    build = build_dataset(compile_project(spark, load_project(project)))
    out = build.outputs()[("all", "full")]
    assert "spot_eur_sequence__@area:DK1" not in out.columns
    assert not any(c.startswith("spot_eur_sequence") for c in out.columns)
    assert "spot_eur_scaled__@area:DK1" in out.columns
