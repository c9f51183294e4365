"""Identity-alignment fixture ported end-to-end with the reference's golden
values (tests/integration/test_integration_identity_alignment_regression.py +
tests/fixtures/identity_alignment_project/): dedupe, rolling/lag/lead,
aligned+derived PE stream, partition-suffix series ids, sequence features,
scaler over the full corpus, exact scaled floats.
"""

from __future__ import annotations

import json
import math

import pytest


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text, encoding="utf-8")


PRICES = [
    ("2024-01-03", "B", 30),
    ("2024-01-01", "A", 2),
    ("2024-01-02", "B", 20),
    ("2024-01-02", "B", 20),  # duplicate → dedupe
    ("2024-01-03", "A", 6),
    ("2024-01-01", "B", 10),
    ("2024-01-02", "A", 4),
]
EARNINGS = [
    ("2024-01-02", "C", 10),  # ticker absent from prices → dropped by align
    ("2024-01-03", "A", 3),
    ("2023-12-31", "B", 2),  # no matching price time → dropped
    ("2024-01-01", "A", 2),
    ("2024-01-02", "B", 1),
]
FUNDAMENTALS = [
    ("2024-01-03", "B", "revenue", 240),
    ("2024-01-01", "A", "debt", 50),
    ("2024-01-02", "B", "revenue", 220),
    ("2024-01-01", "B", "debt", 80),
    ("2024-01-03", "A", "revenue", 120),
    ("2024-01-02", "A", "debt", 55),
    ("2024-01-01", "A", "revenue", 100),
    ("2024-01-03", "B", "debt", 96),
    ("2024-01-02", "A", "revenue", 110),
    ("2024-01-01", "B", "revenue", 200),
    ("2024-01-03", "A", "debt", 60),
]


@pytest.fixture()
def project(tmp_path):
    root = tmp_path / "ia"
    _write(
        root / "data" / "prices.jsonl",
        "\n".join(
            json.dumps({"time": f"{t}T00:00:00Z", "ticker": k, "value": v})
            for t, k, v in PRICES
        ),
    )
    _write(
        root / "data" / "earnings.jsonl",
        "\n".join(
            json.dumps({"time": f"{t}T00:00:00Z", "ticker": k, "value": v})
            for t, k, v in EARNINGS
        ),
    )
    _write(
        root / "data" / "fundamentals.jsonl",
        "\n".join(
            json.dumps({"time": f"{t}T00:00:00Z", "ticker": k, "metric": m, "value": v})
            for t, k, m, v in FUNDAMENTALS
        ),
    )
    _write(root / "project.yaml", "schema_version: 3\nname: identity_alignment\n")
    for name in ("prices", "earnings", "fundamentals"):
        _write(
            root / "sources" / f"{name}.yaml",
            f"""id: fixture.{name}
parser: {{ entrypoint: core.temporal_record }}
loader: {{ transport: fs, path: data/{name}.jsonl, reader: {{ format: jsonl }} }}
""",
        )
    _write(
        root / "streams" / "price.yaml",
        """id: market.price
from: { source: fixture.prices }
partition_by: [ticker]
transforms:
  - { operation: dedupe }
  - { operation: rolling, field: value, to: mean_2, window: 2, min_samples: 1 }
  - { operation: lag, field: value, to: lag_1, periods: 1 }
  - { operation: lead, field: value, to: lead_1, periods: 1 }
""",
    )
    _write(
        root / "streams" / "earnings.yaml",
        """id: company.earnings
from: { source: fixture.earnings }
partition_by: [ticker]
""",
    )
    _write(
        root / "streams" / "fundamental.yaml",
        """id: company.fundamental
from: { source: fixture.fundamentals }
partition_by: [ticker, metric]
""",
    )
    _write(
        root / "streams" / "valuation_inputs.yaml",
        """id: valuation.inputs
from:
  align: [market.price, company.earnings]
combine:
  entrypoint: select
  args:
    fields:
      ticker: market.price.ticker
      price: market.price.value
      earnings: company.earnings.value
""",
    )
    _write(
        root / "streams" / "valuation_pe.yaml",
        """id: valuation.pe
from: { stream: valuation.inputs }
transforms:
  - { operation: derive, left: price, operator: div, right_field: earnings, to: value }
""",
    )
    _write(
        root / "dataset.yaml",
        """sample:
  cadence: 1d
  keys: [ticker]
features:
  - { id: price_scaled, stream: market.price, field: value, scale: true }
  - { id: price_history, stream: market.price, field: value, sequence: { size: 2 } }
  - { id: price_mean_2, stream: market.price, field: mean_2 }
  - { id: price_lag_1, stream: market.price, field: lag_1 }
  - { id: price_lead_1, stream: market.price, field: lead_1 }
  - { id: pe_ratio, stream: valuation.pe, field: value }
  - { id: fundamental, stream: company.fundamental, field: value }
targets: []
""",
    )
    return root


def test_identity_alignment_golden(spark, project):
    from datapipeline_spark.plans import compile_project, load_project
    from datapipeline_spark.plans.dataset_build import build_dataset

    build = build_dataset(compile_project(spark, load_project(project)))

    # scaler artifact parity: mean 12, pstd sqrt(296/3) over the 6 prices
    stats = {r["series_id"]: r for r in build.scaler_stats.collect()}
    assert set(stats) == {"price_scaled"}
    assert stats["price_scaled"]["mean"] == pytest.approx(12.0)
    assert stats["price_scaled"]["std"] == pytest.approx(math.sqrt(296 / 3))
    assert stats["price_scaled"]["n_obs"] == 6

    # partition-suffix series ids for the leftover `metric` field
    assert "fundamental__@metric:debt" in build.column_base
    assert "fundamental__@metric:revenue" in build.column_base

    out = build.outputs()[("all", "full")]
    cols = [
        "time",
        "ticker",
        "price_scaled",
        "price_history",
        "price_mean_2",
        "price_lag_1",
        "price_lead_1",
        "pe_ratio",
        "fundamental__@metric:debt",
        "fundamental__@metric:revenue",
    ]
    rows = [
        (r[0].day, *r[1:])
        for r in (tuple(x) for x in out.select(*cols).orderBy("time", "ticker").collect())
    ]
    std = math.sqrt(296 / 3)
    expected = [
        (1, "A", (2 - 12) / std, [None, None], 2.0, None, 4.0, 1.0, 50.0, 100.0),
        (1, "B", (10 - 12) / std, [None, None], 10.0, None, 20.0, None, 80.0, 200.0),
        (2, "A", (4 - 12) / std, [2.0, 4.0], 3.0, 2.0, 6.0, None, 55.0, 110.0),
        (2, "B", (20 - 12) / std, [10.0, 20.0], 15.0, 10.0, 30.0, 20.0, None, 220.0),
        (3, "A", (6 - 12) / std, [4.0, 6.0], 5.0, 4.0, None, 2.0, 60.0, 120.0),
        (3, "B", (30 - 12) / std, [20.0, 30.0], 25.0, 20.0, None, None, 96.0, 240.0),
    ]
    assert len(rows) == 6
    for got, exp in zip(rows, expected):
        assert got[0] == exp[0] and got[1] == exp[1]
        assert got[2] == pytest.approx(exp[2])
        assert got[3] == exp[3]
        for g, e in zip(got[4:], exp[4:]):
            if e is None:
                assert g is None
            else:
                assert g == pytest.approx(e)
