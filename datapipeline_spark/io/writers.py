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


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    compression: str = "zstd",
) -> None:
    """ORC sink (beyond the reference's jsonl/csv/parquet/pickle set —
    io/factory.py:17-66): the other columnar lake format, read-compatible
    with Hive/Trino/Presto warehouses. Same distributed commit protocol as
    the parquet sink."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def compact_files(
    spark,
    path: str,
    format: str = "parquet",
    target_file_mb: int = 128,
    sort_within_by: Sequence[str] = (),
) -> int:
    """Small-files compaction (lakehouse table maintenance, the OPTIMIZE
    verb — no reference analogue because a single-process runtime never
    fragments its output; a distributed engine writing per-task files
    does). Rewrites a directory to ~target-sized files: reads the current
    layout, coalesces to ceil(bytes / target) partitions, optionally
    re-sorts rows within each output file for scan locality, and swaps the
    directory via an adjacent staging path + rename. Returns the new file
    count.

    All filesystem ops go through the Hadoop FileSystem resolved for the
    path (like incremental_rollup_sink), so the maintenance verb works on
    HDFS / object stores, not just the local FS. The swap is two renames
    (path→__old__, __compacting__→path) — each rename is atomic on
    HDFS-like stores but the PAIR is not: a crash between them leaves the
    table at __old__ with the compacted copy at __compacting__. The next
    invocation recovers on entry (restores __old__→path, clears stale
    staging), so no data is ever stranded; concurrent readers during the
    instant between the renames can observe a missing directory — serialize
    maintenance against readers via a catalog/manifest where that matters.

    The coalesce is a NARROW repartition (no shuffle) unless a
    within-file sort is requested, in which case the rewrite pays one
    range-free sortWithinPartitions."""
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/"))
    fs = jpath.getFileSystem(hconf)
    staging = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compacting__")
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old__")

    # crash recovery from a previously interrupted swap
    if fs.exists(old):
        if not fs.exists(jpath):
            fs.rename(old, jpath)  # roll the original back into place
        else:
            fs.delete(old, True)  # swap completed, cleanup died
    if fs.exists(staging):
        fs.delete(staging, True)  # stale staging from a dead run

    def _data_files(p):
        it = fs.listFiles(p, True)
        out = []
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if not name.startswith(("_", ".")) and not name.endswith(".crc"):
                out.append(st.getLen())
        return out

    reader = getattr(spark.read, format)
    df = reader(path)
    total = sum(_data_files(jpath))
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    out = df.coalesce(n)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    getattr(out.write.mode("overwrite"), format)(staging.toString())
    if not fs.rename(jpath, old):
        raise IOError(f"compact_files: rename {path} -> {old} failed")
    if not fs.rename(staging, jpath):
        fs.rename(old, jpath)  # roll back so the table stays readable
        raise IOError(f"compact_files: rename {staging} -> {path} failed (rolled back)")
    fs.delete(old, True)
    return len(_data_files(jpath))


def write_table(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    overwrite_partitions: bool = False,
    sort_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
    compression: str = "zstd",
) -> None:
    """Partitioned parquet table sink for the 100 TB posture.

    - ``partition_by``: hive-style directory partitioning, so downstream
      reads prune partitions from the predicate alone.
    - ``overwrite_partitions=True``: dynamic partition overwrite — an
      incremental backfill replaces ONLY the partitions present in ``df``
      (idempotent re-runs of one day/hour never touch the rest of the
      table). Plain ``mode="overwrite"`` without it replaces the whole
      table.
    - ``sort_by``: sortWithinPartitions before write → clustered row
      groups, so parquet min/max statistics skip pages on range predicates.
    - ``max_records_per_file`` bounds output file size (small-file control
      comes from AQE coalescing upstream; this caps the other extreme).
    """
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    w = df.write.mode(mode).option("compression", compression)
    if overwrite_partitions:
        if not partition_by:
            raise ValueError("overwrite_partitions requires partition_by")
        w = w.option("partitionOverwriteMode", "dynamic")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (catalog-backed): rows are hash-distributed
    into ``num_buckets`` files per partition by ``bucket_by``, optionally
    sorted within each bucket.

    The scale payoff: equi-joins and aggregations keyed on ``bucket_by``
    between two tables bucketed the same way read pre-hashed, co-located
    buckets — Catalyst drops BOTH shuffle exchanges (and with ``sort_by``,
    the sorts too). At 100 TB this turns the nightly fact-to-fact join from
    the dominant shuffle into a local merge."""
    if not bucket_by:
        raise ValueError("bucket_by must name at least one column")
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def ensure_bucketed_table(
    spark,
    df_factory,
    name: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] = (),
    path: str | None = None,
) -> DataFrame:
    """Return the bucketed table ``name``, staging it AT MOST ONCE across
    processes (the artifact-fingerprint discipline applied to bucketed
    layouts — callers encode source-file fingerprints into ``name``/
    ``path`` so stale data can never be re-served). ``df_factory`` is a
    zero-arg callable producing the source DataFrame — called ONLY when
    the table actually has to be written (building the source frame just
    to read its schema cost ~0.5 s per table on the hit path).

    Resolution order: (1) live catalog entry — free; (2) finished files on
    disk at ``path`` (committer ``_SUCCESS`` marker plus the ``_schema.ddl``
    sidecar written at staging time) — re-register them with an
    external-table DDL carrying the same CLUSTERED/SORTED BY spec, which
    restores Catalyst's bucket metadata (and therefore the zero-Exchange
    join plan) WITHOUT rewriting a byte: the session catalog is in-memory
    per process, so before this, every new process paid the full staging
    write again (3.9 s per bench invocation for bucketed_join_revenue;
    the DDL itself is ~0.05 s warm, ~0.4 s for the first DDL in a
    process); (3) actually write the table (and the sidecar)."""
    if spark.catalog.tableExists(name):
        return spark.table(name)
    sidecar = os.path.join(path, "_schema.ddl") if path is not None else None
    if (
        sidecar is not None
        and os.path.exists(os.path.join(path, "_SUCCESS"))
        and os.path.exists(sidecar)
    ):
        with open(sidecar) as f:
            cols = f.read().strip()
        sort_clause = (
            " SORTED BY (" + ", ".join(f"`{c}`" for c in sort_by) + ")"
            if sort_by
            else ""
        )
        spark.sql(
            f"CREATE TABLE `{name}` ({cols}) USING parquet "
            f"CLUSTERED BY ({', '.join(f'`{c}`' for c in bucket_by)})"
            f"{sort_clause} INTO {num_buckets} BUCKETS LOCATION '{path}'"
        )
        return spark.table(name)
    df = df_factory()
    write_bucketed_table(df, name, bucket_by, num_buckets, sort_by, path)
    if sidecar is not None:
        with open(sidecar, "w") as f:
            f.write(
                ", ".join(
                    f"`{fld.name}` {fld.dataType.simpleString()}"
                    for fld in df.schema.fields
                )
            )
    return spark.table(name)


def write_pickle(df: DataFrame, path: str, overwrite: bool = True) -> int:
    """Pickle-stream export sink (reference io/writers/pickle_writer.py:1-21,
    io/factory.py:53-55): one local file of consecutively pickled row dicts,
    written atomically (temp file + rename, mirroring AtomicBinaryFileSink).

    Deliberately a DRIVER-SIDE export: the reference's pickle target is a
    single local file for handoff into Python tooling, so rows stream through
    ``toLocalIterator`` (one partition in memory at a time, never a full
    collect). This is an edge sink for small exports — at scale use
    ``write_parquet``/``write_table``; pickle is neither splittable nor
    cross-language. Returns the row count written."""
    import pickle

    if not overwrite and os.path.exists(path):
        raise FileExistsError(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    n = 0
    try:
        with open(tmp, "wb") as fh:
            pickler = pickle.Pickler(fh, protocol=pickle.HIGHEST_PROTOCOL)
            for row in df.toLocalIterator():
                pickler.dump(row.asDict(recursive=True))
                pickler.clear_memo()  # rows are independent; don't grow the memo
                n += 1
        os.replace(tmp, path)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise
    return n


def write_stdout(
    df: DataFrame,
    format: str = "jsonl",
    limit: int | None = None,
    stream=None,
) -> int:
    """Stdout sink (reference io/sinks/stdout.py, io/factory.py:24-29):
    stream rows to a text stream as JSON lines or plain text.

    Driver-side by contract (stdout lives on the driver); rows arrive via
    ``toLocalIterator`` so memory stays bounded — ``limit`` caps output for
    previews. ``txt`` requires a single string column (matching the
    reference's text_line_serializer on raw payloads)."""
    import json as _json
    import sys

    out = sys.stdout if stream is None else stream
    if format not in {"jsonl", "txt"}:
        raise ValueError(f"Unsupported stdout format {format!r}")
    if format == "txt":
        cols = df.columns
        if len(cols) != 1:
            raise ValueError("txt output requires exactly one (string) column")
    if limit is not None:
        df = df.limit(limit)
    n = 0
    for row in df.toLocalIterator():
        if format == "jsonl":
            out.write(_json.dumps(row.asDict(recursive=True), default=str) + "\n")
        else:
            out.write(str(row[0]) + "\n")
        n += 1
    out.flush()
    return n


def materialize(df: DataFrame, path: str, format: str = "jsonl", gzip: bool = False) -> DataFrame:
    """Persist a stream checkpoint and return a reader over it."""
    spark = df.sparkSession
    if format == "jsonl":
        write_jsonl(df, path, gzip=gzip)
        return spark.read.schema(df.schema).json(path)
    if format == "parquet":
        write_parquet(df, path)
        return spark.read.parquet(path)
    if format == "orc":
        write_orc(df, path)
        return spark.read.orc(path)
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
