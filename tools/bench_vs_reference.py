#!/usr/bin/env python
"""Head-to-head throughput: this engine vs the reference runtime, same project.

BASELINE.md's goal is "match-or-beat the reference's single-node throughput at
the same data scale", but the reference publishes no numbers — so measure it:
generate ONE project (reference YAML grammar, which both engines consume),
run the reference's own serve path (PYTHONPATH import of /root/reference/src,
entry points resolved exactly like its test conftest does — no install, no
writes into the reference tree), run our Spark build on the identical files,
and report wall-clock + output parity.

Workload per stream (2 streams): N 10-minute ticks → ensure_cadence →
fill(mean, w=6) → rolling(mean, w=6) → lag(1); dataset assembles hourly
samples from both streams with per-fold standardization over 2 walk-forward
folds (scaler fit + leakage-safe split routing included in both timings).

Usage: python tools/bench_vs_reference.py [--rows 200000] [--skip-reference]
       [--scenario chain|fusion]

Scenarios:
- chain (default): the 2-stream window-transform chain described above.
- fusion: the join-heavy shape — two location-partitioned streams plus an
  unpartitioned global baseline; a broadcast combine (exact-time global
  index), an n-way align on (location, time), and per-location window
  transforms, assembled into per-location samples. Both engines read the
  SAME project: the combine entrypoint is a generic `select` combiner that
  this tool also provides to the reference (reference combiners receive
  positional records + YAML args, so `order:` in the args names them).
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import shutil
import sys
import time
from datetime import datetime, timedelta, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

sys.path.insert(0, str(REPO))

CADENCE_S = 600  # 10m ticks
START = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _write(path: Path, text: str) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text, encoding="utf-8")


def generate_project(root: Path, rows: int) -> None:
    shutil.rmtree(root, ignore_errors=True)
    t_split1 = START + timedelta(seconds=CADENCE_S * int(rows * 0.5))
    t_split2 = START + timedelta(seconds=CADENCE_S * int(rows * 0.75))
    for name, scale_v in (("signal", 1.0), ("outcome", 3.0)):
        lines = ["time,value"]
        t = START
        for i in range(rows):
            if i % 97 != 0:  # sprinkle gaps so fill/ensure_cadence do work
                v = round((i % 1000) * scale_v + (i % 7) * 0.25, 2)
                lines.append(f"{t.strftime('%Y-%m-%dT%H:%M:%SZ')},{v}")
            t += timedelta(seconds=CADENCE_S)
        _write(root / "data" / f"{name}.csv", "\n".join(lines))
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
            f"""id: regression.{name}
from: {{ source: regression.{name} }}
map:
  entrypoint: identity
  args: {{}}
transforms:
  - {{ operation: ensure_cadence, cadence: 10m }}
  - {{ operation: fill, statistic: mean, window: 6, min_samples: 1, field: value }}
  - {{ operation: rolling, statistic: mean, window: 6, min_samples: 1, field: value, to: roll6 }}
  - {{ operation: lag, periods: 1, field: value, to: prev }}
""",
        )
    _write(
        root / "project.yaml",
        """schema_version: 3
artifact_revision: 1
name: h2h
paths:
  streams: streams
  sources: sources
  dataset: dataset.yaml
  artifacts: artifacts
  profiles: profiles
""",
    )
    _write(
        root / "profiles" / "serve.defaults.yaml",
        """artifact_mode: FORCE
""",
    )
    _write(
        root / "profiles" / "serve.dataset.yaml",
        """operation: dataset
output:
  transport: fs
  format: jsonl
  directory: output
observability:
  visuals: OFF
  heartbeat_interval_seconds: 0
  logging:
    level: CRITICAL
    outputs:
      - transport: STDERR
""",
    )
    _write(
        root / "dataset.yaml",
        f"""sample:
  cadence: 10m
features:
  - {{ id: signal, stream: regression.signal, field: roll6, scale: true }}
  - {{ id: signal_prev, stream: regression.signal, field: prev, scale: false }}
targets:
  - {{ id: outcome, stream: regression.outcome, field: roll6, scale: true }}
split:
  mode: time
  intervals:
    - {{ id: train_0, until: "{t_split1.strftime('%Y-%m-%dT%H:%M:%SZ')}" }}
    - {{ id: validation_0, until: "{t_split2.strftime('%Y-%m-%dT%H:%M:%SZ')}" }}
    - {{ id: test_0 }}
  folds:
    - {{ id: fold_0, train: [train_0], validation: [validation_0], test: [test_0] }}
""",
    )


def generate_fusion_project(root: Path, rows: int, locations: int = 50) -> None:
    """Join-heavy project: streams `a` and `b` partitioned by location with
    ~1% gaps, a gap-free unpartitioned `baseline` broadcast onto `a` by exact
    time, then align[adjusted, b] per (location, time)."""
    shutil.rmtree(root, ignore_errors=True)
    steps = max(rows // locations, 8)
    t_split1 = START + timedelta(seconds=CADENCE_S * int(steps * 0.5))
    t_split2 = START + timedelta(seconds=CADENCE_S * int(steps * 0.75))

    for name, scale_v in (("a", 1.0), ("b", 2.0)):
        lines = []
        for j in range(locations):
            t = START
            for i in range(steps):
                if (i + j) % 97 != 0:  # per-location gap pattern
                    v = round((i % 1000) * scale_v + ((i + j) % 7) * 0.25, 2)
                    lines.append(
                        '{"time": "%s", "location": "loc%02d", "value": %s}'
                        % (t.strftime("%Y-%m-%dT%H:%M:%SZ"), j, v)
                    )
                t += timedelta(seconds=CADENCE_S)
        _write(root / "data" / f"{name}.jsonl", "\n".join(lines))
        _write(
            root / "sources" / f"{name}.yaml",
            f"""id: fusion.{name}
parser:
  entrypoint: core.temporal_record
loader:
  transport: fs
  path: data/{name}.jsonl
  reader: {{ format: jsonl }}
""",
        )
    base_lines = []
    t = START
    for i in range(steps):
        base_lines.append(
            '{"time": "%s", "value": %s}'
            % (t.strftime("%Y-%m-%dT%H:%M:%SZ"), round(i * 0.5, 2))
        )
        t += timedelta(seconds=CADENCE_S)
    _write(root / "data" / "baseline.jsonl", "\n".join(base_lines))
    _write(
        root / "sources" / "baseline.yaml",
        """id: fusion.baseline
parser:
  entrypoint: core.temporal_record
loader:
  transport: fs
  path: data/baseline.jsonl
  reader: { format: jsonl }
""",
    )
    _write(
        root / "streams" / "baseline.yaml",
        """id: fusion.baseline
from: { source: fusion.baseline }
map:
  entrypoint: identity
  args: {}
""",
    )
    _write(
        root / "streams" / "a.yaml",
        """id: fusion.a
from: { source: fusion.a }
map:
  entrypoint: identity
  args: {}
partition_by: [location]
transforms:
  - { operation: fill, statistic: mean, window: 6, min_samples: 1, field: value }
  - { operation: rolling, statistic: mean, window: 6, min_samples: 1, field: value, to: roll6 }
""",
    )
    _write(
        root / "streams" / "b.yaml",
        """id: fusion.b
from: { source: fusion.b }
map:
  entrypoint: identity
  args: {}
partition_by: [location]
transforms:
  - { operation: lag, periods: 1, field: value, to: prev }
""",
    )
    _write(
        root / "streams" / "adjusted.yaml",
        """id: fusion.adjusted
from:
  stream: fusion.a
  broadcast: fusion.baseline
combine:
  entrypoint: select
  args:
    order: [fusion.a, fusion.baseline]
    fields:
      location: fusion.a.location
      raw: fusion.a.value
      base: fusion.baseline.value
    derive:
      - { to: value, left: raw, operator: add, right_field: base }
""",
    )
    _write(
        root / "streams" / "paired.yaml",
        """id: fusion.paired
from:
  align: [fusion.adjusted, fusion.b]
combine:
  entrypoint: select
  args:
    order: [fusion.adjusted, fusion.b]
    fields:
      location: fusion.adjusted.location
      adj: fusion.adjusted.value
      raw_b: fusion.b.value
    derive:
      - { to: value, left: adj, operator: sub, right_field: raw_b }
""",
    )
    _write(
        root / "project.yaml",
        """schema_version: 3
artifact_revision: 1
name: h2h_fusion
paths:
  streams: streams
  sources: sources
  dataset: dataset.yaml
  artifacts: artifacts
  profiles: profiles
""",
    )
    _write(root / "profiles" / "serve.defaults.yaml", "artifact_mode: FORCE\n")
    _write(
        root / "profiles" / "serve.dataset.yaml",
        """operation: dataset
output:
  transport: fs
  format: jsonl
  directory: output
observability:
  visuals: OFF
  heartbeat_interval_seconds: 0
  logging:
    level: CRITICAL
    outputs:
      - transport: STDERR
""",
    )
    _write(
        root / "dataset.yaml",
        f"""sample:
  cadence: 10m
  keys: [location]
features:
  - {{ id: a_roll, stream: fusion.a, field: roll6, scale: true }}
  - {{ id: adj, stream: fusion.adjusted, field: value, scale: false }}
targets:
  - {{ id: uplift, stream: fusion.paired, field: value, scale: true }}
split:
  mode: time
  intervals:
    - {{ id: train_0, until: "{t_split1.strftime('%Y-%m-%dT%H:%M:%SZ')}" }}
    - {{ id: validation_0, until: "{t_split2.strftime('%Y-%m-%dT%H:%M:%SZ')}" }}
    - {{ id: test_0 }}
  folds:
    - {{ id: fold_0, train: [train_0], validation: [validation_0], test: [test_0] }}
""",
    )


def _make_reference_select():
    """Generic `select` combiner for the REFERENCE runtime, mirroring the
    Spark registry's declarative select (fields + null-propagating derive).
    Reference combiners are called as combine(*records, **args); `order`
    names the positional records by stream id."""
    from datapipeline.domain.record import TemporalRecord

    def select(*records, order=(), fields=None, derive=()):
        by_id = dict(zip(order, records))
        rec = TemporalRecord(time=records[0].time)
        for out, ref in (fields or {}).items():
            sid = next(s for s in sorted(by_id, key=len, reverse=True) if ref.startswith(s + "."))
            setattr(rec, out, getattr(by_id[sid], ref[len(sid) + 1 :]))
        for d in derive:
            left = getattr(rec, d["left"])
            right = d["right_value"] if "right_value" in d else getattr(rec, d["right_field"])
            if left is None or right is None:
                val = None
            else:
                val = {
                    "add": left + right,
                    "sub": left - right,
                    "mul": left * right,
                    "div": (left / right) if right else None,
                }[d["operator"]]
            setattr(rec, d["to"], val)
        return rec

    return select


# --------------------------------------------------------------- reference run


def _stub_rich() -> None:
    """`rich` is not installed here; the reference imports it even with
    visuals off. Provide inert stand-ins (benchmark runs with visuals off,
    so nothing renders)."""
    import types

    if "rich" in sys.modules:
        return

    class _Anything:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return self

        def __getattr__(self, name):
            return _Anything()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    rich = types.ModuleType("rich")
    for sub, names in {
        "console": ["Console", "RenderableType", "Group"],
        "progress": [
            "Progress", "BarColumn", "TextColumn", "TimeElapsedColumn",
            "TimeRemainingColumn", "SpinnerColumn", "MofNCompleteColumn",
            "TaskProgressColumn", "ProgressColumn", "Task", "TaskID",
        ],
        "rule": ["Rule"],
        "table": ["Column", "Table"],
        "text": ["Text"],
        "live": ["Live"],
        "panel": ["Panel"],
    }.items():
        mod = types.ModuleType(f"rich.{sub}")
        for n in names:
            setattr(mod, n, _Anything)
        sys.modules[f"rich.{sub}"] = mod
        setattr(rich, sub, mod)
    sys.modules["rich"] = rich


def run_reference(root: Path) -> dict:
    """Run the reference's serve path in-process, timing end-to-end
    (artifact FORCE build + dataset serve to JSONL). Entry points resolve
    via the same load_ep override the reference's own tests/conftest.py
    uses (tests.parsers supplies core.temporal.csv)."""
    sys.path.insert(0, str(REFERENCE / "src"))
    sys.path.insert(0, str(REFERENCE))
    _stub_rich()

    from datapipeline.utils import load as dp_load

    targets = {
        ("datapipeline.parsers", "core.temporal.csv"): "tests.parsers.temporal_csv:TemporalCsvValueParser",
        ("datapipeline.parsers", "identity"): "datapipeline.parsers.identity:IdentityParser",
        ("datapipeline.parsers", "core.temporal_record"): "datapipeline.parsers.temporal_record:TemporalRecordParser",
        ("datapipeline.mappers", "identity"): "datapipeline.mappers.noop:identity",
        ("datapipeline.mappers", "encode_time"): "datapipeline.mappers.synthetic.time:encode",
        ("datapipeline.loaders", "core.synthetic.ticks"): "datapipeline.sources.synthetic.time.loader:make_time_loader",
        ("datapipeline.operations.build", "core.artifact.series"): "datapipeline.operations.artifacts.series:build_series_artifact",
        ("datapipeline.operations.build", "core.artifact.metadata"): "datapipeline.operations.artifacts.metadata:materialize_metadata",
        ("datapipeline.operations.build", "core.artifact.scaler"): "datapipeline.operations.artifacts.scaler:materialize_scaler_statistics",
        ("datapipeline.operations.build", "core.artifact.coverage_stats"): "datapipeline.operations.artifacts.coverage_stats:build_coverage_stats_artifact",
        ("datapipeline.operations.build", "core.artifact.ticks"): "datapipeline.operations.artifacts.ticks:materialize_ticks",
    }
    original = dp_load.load_ep

    def load_ep(group: str, name: str):
        if group == "datapipeline.combiners" and name == "select":
            return _make_reference_select()
        target = targets.get((group, name))
        if target:
            module, attr = target.split(":")
            return getattr(importlib.import_module(module), attr)
        return original(group, name)

    dp_load.load_ep = load_ep

    from datapipeline.profiles.orchestration import run_profiles
    from datapipeline.profiles.request_builder import build_runtime_run_request

    t0 = time.time()
    request = build_runtime_run_request(
        "serve",
        str(root / "project.yaml"),
        profile_name="dataset",
        artifact_mode="FORCE",
        cli_visuals="off",
        cli_log_level="CRITICAL",
    )
    run_profiles(request)
    wall = time.time() - t0

    rows = {}
    for f in sorted((root / "output" / "runs").glob("*/dataset/*.jsonl")):
        rows[f.stem] = sum(1 for _ in f.open())
    return {"wall_s": round(wall, 2), "rows": rows}


# ------------------------------------------------------------------- spark run


def run_spark(root: Path, out_dir: Path) -> dict:
    from datapipeline_spark.plans import compile_project, load_project
    from datapipeline_spark.plans.dataset_build import build_dataset
    from datapipeline_spark.session import get_spark

    spark = get_spark(app_name="h2h")
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    build = build_dataset(compile_project(spark, load_project(root)))
    rows = {}
    for (fold, role), df in build.outputs().items():
        path = str(out_dir / f"dataset.{fold}.{role}.jsonl")
        df.write.mode("overwrite").json(path)
        rows[f"dataset.{fold}.{role}"] = df.count()
    wall = time.time() - t0
    return {"wall_s": round(wall, 2), "rows": rows}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--scenario", choices=("chain", "fusion"), default="chain")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--workdir", default="/tmp/h2h_bench")
    args = ap.parse_args()

    ref_root = Path(args.workdir) / "ref_project"
    spark_root = Path(args.workdir) / "spark_project"
    if args.scenario == "fusion":
        generate_fusion_project(ref_root, args.rows)
    else:
        generate_project(ref_root, args.rows)
    shutil.copytree(ref_root, spark_root, dirs_exist_ok=True)

    result = {"scenario": args.scenario, "rows_per_stream": args.rows}
    # Spark first (imports are isolated; reference run patches its own loader)
    result["spark"] = run_spark(spark_root, Path(args.workdir) / "spark_out")
    if not args.skip_reference:
        result["reference"] = run_reference(ref_root)
        if result["reference"]["wall_s"]:
            result["speedup"] = round(
                result["reference"]["wall_s"] / result["spark"]["wall_s"], 2
            )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
