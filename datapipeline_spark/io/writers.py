"""Sinks + run-scoped output layout (SURVEY.md §2.2).

- JSONL (optionally gzip), CSV (header, stable column order), Parquet
  (zstd) — all distributed `df.write`; atomicity comes from Spark's
  commit protocol (staging + rename), replacing the reference's temp-file
  rename (io/writers/jsonl.py:1-26).
- Run-scoped layout mirrors io/output.py:61-70:
  `<root>/runs/<run_id>/dataset/<profile>[.<fold>.<role>].<ext>` with a
  `latest` symlink.
- `materialize` persists any intermediate stream as a durable checkpoint
  (services/materialize.py:23-58).
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame


def write_jsonl(df: DataFrame, path: str, gzip: bool = False, mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    sep: str = ",",
    gzip: bool = False,
) -> None:
    w = df.write.mode(mode).option("header", header).option("sep", sep)
    if gzip:
        w = w.option("compression", "gzip")
    w.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    compression: str = "zstd",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def materialize(df: DataFrame, path: str, format: str = "jsonl", gzip: bool = False) -> DataFrame:
    """Persist a stream checkpoint and return a reader over it."""
    spark = df.sparkSession
    if format == "jsonl":
        write_jsonl(df, path, gzip=gzip)
        return spark.read.schema(df.schema).json(path)
    if format == "parquet":
        write_parquet(df, path)
        return spark.read.parquet(path)
    raise ValueError(f"materialize: unsupported format {format!r}")


def run_output_path(
    root: str,
    run_id: str,
    profile: str,
    fold: str | None = None,
    role: str | None = None,
    ext: str = "parquet",
    update_latest: bool = True,
) -> str:
    """`<root>/runs/<run_id>/dataset/<profile>[.<fold>.<role>].<ext>` +
    `latest` symlink (reference io/output.py:61-70,94-160)."""
    parts = [profile] + [p for p in (fold, role) if p]
    name = ".".join(parts) + f".{ext}"
    run_dir = os.path.join(root, "runs", run_id, "dataset")
    os.makedirs(run_dir, exist_ok=True)
    if update_latest:
        latest = os.path.join(root, "runs", "latest")
        tmp = latest + ".tmp"
        try:
            if os.path.islink(tmp) or os.path.exists(tmp):
                os.remove(tmp)
            os.symlink(run_id, tmp)
            os.replace(tmp, latest)
        except OSError:
            pass  # filesystems without symlink support
    return os.path.join(run_dir, name)
