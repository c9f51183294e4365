"""Incomplete-generation fixture ported end-to-end with the reference's
golden values (tests/integration/test_integration_incomplete_real_data.py:
93-125 + tests/fixtures/incomplete_generation_project/): two messy
decimal-comma CSVs, a municipality-partitioned wind stream (`where in`
attribute filter, cadence fill with median) aligned against a DK1 price
target, corpus scaler per partition suffix, stride-gated sequences, and a
0.3 row-coverage threshold. Data fixtures: verbatim copies of the
reference's public test CSVs (required for value-identical assertions).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

DATA = Path(__file__).parent / "fixtures_data"


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text, encoding="utf-8")


@pytest.fixture()
def project(tmp_path):
    root = tmp_path / "gen"
    (root / "data").mkdir(parents=True)
    shutil.copy(DATA / "Elspotprices.csv", root / "data" / "Elspotprices.csv")
    shutil.copy(
        DATA / "ProductionMunicipalityHour.csv",
        root / "data" / "ProductionMunicipalityHour.csv",
    )
    _write(
        root / "project.yaml",
        """schema_version: 3
name: incomplete_generation
globals:
  start_time: 2022-01-01T04:00:00Z
  end_time: 2022-01-01T12:00:00Z
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
        root / "sources" / "production.yaml",
        """id: incomplete.production
parser:
  entrypoint: core.temporal.csv
  args:
    time_field: HourUTC
    value_field: OnshoreWindMWh
    decimal: ","
    attributes: { municipality: MunicipalityNo }
loader:
  transport: fs
  path: data/ProductionMunicipalityHour.csv
  reader: { format: csv, delimiter: ";" }
""",
    )
    _write(
        root / "streams" / "wind.yaml",
        """id: metrics.production.wind
from: { source: incomplete.production }
partition_by: [municipality]
preprocess:
  - { operation: where, operator: ge, field: time, comparand: "${start_time}" }
  - { operation: where, operator: le, field: time, comparand: "${end_time}" }
  - { operation: where, operator: in, field: municipality, comparand: ["849", "550", "400"] }
transforms:
  - { operation: ensure_cadence, cadence: 1h }
  - { operation: fill, statistic: median, window: 3, min_samples: 1, field: value }
""",
    )
    _write(
        root / "streams" / "price.yaml",
        """id: targets.price.dk1
from: { source: incomplete.elspot }
preprocess:
  - { operation: where, operator: ge, field: time, comparand: "${start_time}" }
  - { operation: where, operator: le, field: time, comparand: "${end_time}" }
  - { operation: where, operator: eq, field: area, comparand: DK1 }
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
  - { id: onshore_mwh_scaled, stream: metrics.production.wind, field: value, scale: true }
  - id: onshore_mwh_window
    stream: metrics.production.wind
    field: value
    sequence: { size: 2, stride: 2 }
targets:
  - { id: dk1_price, stream: targets.price.dk1, field: value }
postprocess:
  samples:
    features:
      threshold: 0.3
""",
    )
    return root


FEATURES = {
    "onshore_mwh_scaled__@municipality:400",
    "onshore_mwh_scaled__@municipality:550",
    "onshore_mwh_scaled__@municipality:849",
    "onshore_mwh_window__@municipality:400",
    "onshore_mwh_window__@municipality:550",
    "onshore_mwh_window__@municipality:849",
}


def test_incomplete_generation_golden(spark, project):
    from datapipeline_spark.plans import compile_project, load_project
    from datapipeline_spark.plans.dataset_build import build_dataset

    build = build_dataset(compile_project(spark, load_project(project)))
    out = build.outputs()[("all", "full")]
    rows = out.orderBy("time").collect()

    assert len(rows) == 9
    assert set(build.feature_columns) == FEATURES
    assert build.target_columns == ["dk1_price"]

    first = rows[0]
    assert first["dk1_price"] == pytest.approx(39.700001, rel=1e-6)
    assert first["onshore_mwh_scaled__@municipality:849"] == pytest.approx(
        0.2560143735, rel=1e-6
    )
    assert list(first["onshore_mwh_window__@municipality:849"]) == [None, None]

    window_sample = rows[3]
    assert window_sample["time"].hour == 7
    assert window_sample["onshore_mwh_window__@municipality:849"] == pytest.approx(
        [2.880863, 2.351027], rel=1e-6
    )
