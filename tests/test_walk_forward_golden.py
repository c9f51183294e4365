"""Walk-forward fixture ported end-to-end with the reference's exact golden
values (tests/integration/test_walk_forward_regression.py:36-130 +
tests/fixtures/walk_forward_project/): full-precision scaled floats, purge
exclusion, per-fold leakage-free statistics, and the leakage mutation test.
"""

from __future__ import annotations

import pytest


SIGNAL = [0, 2, 100, 4, 5, 10, 14, 1000, 16, 18]
OUTCOME = [10, 14, 1000, 18, 20, 100, 108, 10000, 112, 116]


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text, encoding="utf-8")


def _build_project(root, signal=SIGNAL, outcome=OUTCOME):
    def csv(vals):
        lines = ["time,value"] + [
            f"2024-01-{d + 1:02d}T00:00:00Z,{v}" for d, v in enumerate(vals)
        ]
        return "\n".join(lines)

    _write(root / "data" / "signal.csv", csv(signal))
    _write(root / "data" / "outcome.csv", csv(outcome))
    _write(root / "project.yaml", "schema_version: 3\nname: walk_forward\n")
    for name in ("signal", "outcome"):
        _write(
            root / "sources" / f"{name}.yaml",
            f"""id: regression.{name}
parser:
  entrypoint: core.temporal.csv
  args: {{ time_field: time, value_field: value }}
loader:
  transport: fs
  path: data/{name}.csv
  reader: {{ format: csv, delimiter: "," }}
""",
        )
        _write(
            root / "streams" / f"{name}.yaml",
            f"id: regression.{name}\nfrom: {{ source: regression.{name} }}\n",
        )
    _write(
        root / "dataset.yaml",
        """sample:
  cadence: 1d
features:
  - { id: signal, stream: regression.signal, field: value, scale: true }
targets:
  - { id: outcome, stream: regression.outcome, field: value, scale: true }
split:
  mode: time
  intervals:
    - { id: train_0, until: "2024-01-03T00:00:00Z" }
    - { id: purge_0, until: "2024-01-04T00:00:00Z" }
    - { id: validation_0, until: "2024-01-05T00:00:00Z" }
    - { id: test_0, until: "2024-01-06T00:00:00Z" }
    - { id: train_1, until: "2024-01-08T00:00:00Z" }
    - { id: purge_1, until: "2024-01-09T00:00:00Z" }
    - { id: validation_1, until: "2024-01-10T00:00:00Z" }
    - { id: test_1 }
  folds:
    - { id: fold_0, train: [train_0], validation: [validation_0], test: [test_0] }
    - { id: fold_1, train: [train_0, validation_0, train_1], validation: [validation_1], test: [test_1] }
""",
    )
    return root


def _serve(spark, root):
    from datapipeline_spark.plans import compile_project, load_project
    from datapipeline_spark.plans.dataset_build import build_dataset

    build = build_dataset(compile_project(spark, load_project(root)))
    outs = {}
    for (fold, role), df in build.outputs().items():
        outs[f"{fold}.{role}"] = [
            (r["time"].day, r["signal"], r["outcome"])
            for r in df.orderBy("time").collect()
        ]
    stats = {
        (r["fold"], r["series_id"]): (r["mean"], r["std"], r["n_obs"])
        for r in build.scaler_stats.collect()
    }
    return outs, stats


def test_walk_forward_golden(spark, tmp_path):
    outs, stats = _serve(spark, _build_project(tmp_path / "wf"))

    # scaler artifact parity (reference asserts the full artifact dict)
    assert stats[("fold_0", "signal")] == (1.0, 1.0, 2)
    assert stats[("fold_0", "outcome")] == (12.0, 2.0, 2)
    m, s, n = stats[("fold_1", "signal")]
    assert (m, n) == (6.0, 5) and s == pytest.approx(5.215361924162119, abs=0, rel=0)
    m, s, n = stats[("fold_1", "outcome")]
    assert (m, n) == (50.0, 5) and s == pytest.approx(44.23573216303761, abs=0, rel=0)

    # routed outputs: exact days and full-precision scaled values
    assert set(outs) == {
        "fold_0.train",
        "fold_0.validation",
        "fold_0.test",
        "fold_1.train",
        "fold_1.validation",
        "fold_1.test",
    }
    assert outs["fold_0.train"] == [(1, -1.0, -1.0), (2, 1.0, 1.0)]
    assert outs["fold_0.validation"] == [(4, 3.0, 3.0)]
    assert outs["fold_0.test"] == [(5, 4.0, 4.0)]
    assert outs["fold_1.train"] == [
        (1, -1.1504474832710556, -0.9042463647391171),
        (2, -0.7669649888473704, -0.8138217282652054),
        (4, -0.3834824944236852, -0.7233970917912936),
        (6, 0.7669649888473704, 1.1303079559238964),
        (7, 1.5339299776947408, 1.3111572288717197),
    ]
    assert outs["fold_1.validation"] == [(9, 1.917412472118426, 1.4015818653456316)]
    assert outs["fold_1.test"] == [(10, 2.3008949665421112, 1.4920065018195432)]

    # purge days (3, 8) appear in NO output
    emitted_days = {d for rows in outs.values() for d, _, _ in rows}
    assert 3 not in emitted_days and 8 not in emitted_days


def test_walk_forward_leakage(spark, tmp_path):
    """Mutating validation/test-era values must not change fold_0's fitted
    statistics or outputs (reference test_walk_forward_regression.py:110-130)."""
    base_outs, base_stats = _serve(spark, _build_project(tmp_path / "base"))

    signal = list(SIGNAL)
    outcome = list(OUTCOME)
    signal[3], signal[4] = 4000, 5000  # days 4, 5 (validation_0 / test_0 era)
    outcome[3], outcome[4] = 18000, 20000
    mut_outs, mut_stats = _serve(
        spark, _build_project(tmp_path / "mut", signal, outcome)
    )

    # fold_0 trains only on days 1-2 → identical stats and train output
    for sid in ("signal", "outcome"):
        assert mut_stats[("fold_0", sid)] == base_stats[("fold_0", sid)]
    assert mut_outs["fold_0.train"] == base_outs["fold_0.train"]
    # fold_1 trains on day 4 → its stats MUST change (sanity check)
    assert mut_stats[("fold_1", "signal")] != base_stats[("fold_1", "signal")]
