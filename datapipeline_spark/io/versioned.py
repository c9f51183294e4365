"""Manifest-based versioned parquet tables — atomic commits, time travel.

A minimal transactional table layout in the Iceberg/Delta spirit, built on
nothing but parquet + the Hadoop FileSystem:

    table/
      data/v00000001-<nonce>/part-*.parquet   (immutable once published)
      _manifests/v00000001.json               (immutable: lists data dirs)

Writers stage data under a fresh nonce directory, then publish the next
manifest (children = previous manifest's dirs for append, or just the new
dir for overwrite/compaction) by writing it to a tmp name and RENAMING it
into place WITHOUT overwrite — on HDFS-like stores that rename is atomic
and fails if the destination exists, so the manifest's appearance IS the
commit point and doubles as the optimistic lock. There is no mutable
pointer file: readers resolve "latest" by listing `_manifests` and taking
the max version, so no reader can ever observe a half-committed table or a
transiently-missing pointer (the gap `compact_files`' directory swap
cannot close is closed here: compaction just publishes a manifest pointing
at the rewritten files while old versions stay readable). A concurrent
committer of the same version number loses the rename race and retries
with a fresh number; an existing manifest is NEVER deleted or superseded
in place — a silent lost write is structurally impossible. A crash before
the rename leaves only an unreferenced data dir / tmp manifest, invisible
to readers and reclaimed by vacuum.

Readers resolve the max manifest (or an explicit version — time travel)
and read exactly its file list; vacuum removes data dirs no retained
manifest references.

Beyond-reference (the reference has no table format at all); the lakehouse
counterpart of write_table/compact_files.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _jpath(jvm, *parts: str):
    return jvm.org.apache.hadoop.fs.Path("/".join(s.rstrip("/") for s in parts))


def _read_small(jvm, fs, jp) -> str:
    # Py4J passes byte[] by VALUE (mutations never propagate back), so the
    # usual read(buf) loop silently yields zeros from Python — hand the
    # stream to commons-io on the JVM side instead
    stream = fs.open(jp)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _write_small(fs, jp, text: str, overwrite: bool) -> None:
    stream = fs.create(jp, overwrite)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


class CommitConflictError(RuntimeError):
    """Another writer committed the contended version numbers first."""


def current_version(spark: SparkSession, path: str) -> int:
    """Latest committed version (0 if the table does not exist yet).

    Resolved by listing `_manifests` and taking the max vN — manifests are
    immutable and appear atomically (rename-into-place), so this read is
    consistent at every instant: there is no mutable pointer whose
    delete/rename gap a reader could fall into."""
    jvm, fs = _fs(spark, path)
    man_root = _jpath(jvm, path, "_manifests")
    if not fs.exists(man_root):
        return 0
    best = 0
    for st in fs.listStatus(man_root):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                best = max(best, int(name[1:-5]))
            except ValueError:
                continue
    return best


def _manifest(spark: SparkSession, path: str, version: int) -> dict:
    jvm, fs = _fs(spark, path)
    mf = _jpath(jvm, path, "_manifests", f"v{version:08d}.json")
    if not fs.exists(mf):
        raise FileNotFoundError(f"no manifest for version {version} at {path}")
    return json.loads(_read_small(jvm, fs, mf))


def write_version(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    compression: str = "zstd",
    extra: dict | None = None,
) -> int:
    """Commit `df` as the next version. mode='append' keeps previous data
    dirs in the new manifest; mode='overwrite' starts the file list fresh.
    Returns the committed version number.

    Publish protocol: data dir (nonce-named, so staging never collides) →
    manifest body written to a nonce tmp name → atomic no-overwrite RENAME
    to _manifests/vN.json. The rename is the commit point AND the
    optimistic lock: it fails if vN.json already exists, so two writers
    contending on N serialize — the loser re-derives the next version
    number (re-reading the new latest manifest's dirs for append) and
    retries; after `max_retries` losses it raises CommitConflictError. An
    existing manifest is never deleted or rewritten, so a slow in-flight
    commit can't be silently clobbered by a concurrent writer (no lost
    writes). A crash mid-commit leaves only the staged data dir and/or a
    tmp manifest — both invisible to readers, reclaimed by vacuum.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be append|overwrite")
    max_retries = 16
    jvm, fs = _fs(spark, path)
    nonce = uuid.uuid4().hex[:12]
    data_rel = f"data/{nonce}"
    data_dir = f"{path.rstrip('/')}/{data_rel}"
    df.write.mode("errorifexists").option("compression", compression).parquet(data_dir)

    fs.mkdirs(_jpath(jvm, path, "_manifests"))
    for _ in range(max_retries):
        prev = current_version(spark, path)
        version = prev + 1
        dirs = [data_rel]
        if mode == "append" and prev > 0:
            dirs = _manifest(spark, path, prev)["dirs"] + dirs
        manifest = {"version": version, "mode": mode, "dirs": dirs, **(extra or {})}
        tmp = _jpath(jvm, path, "_manifests", f".tmp-{nonce}.json")
        _write_small(fs, tmp, json.dumps(manifest), overwrite=True)
        mf = _jpath(jvm, path, "_manifests", f"v{version:08d}.json")
        if fs.exists(mf):  # cheap pre-check; the rename below is the real lock
            continue
        # atomic no-overwrite rename: the commit point. Returns false (no
        # partial state) if a concurrent writer published vN first.
        if fs.rename(tmp, mf):
            return version
    raise CommitConflictError(
        f"lost the commit race {max_retries} times at {path}; retry the write"
    )


def manifest_info(spark: SparkSession, path: str, version: int | None = None) -> dict:
    """The committed manifest dict (version, mode, dirs, any extras such as
    the streaming sink's batch_id)."""
    v = version if version is not None else current_version(spark, path)
    if v <= 0:
        raise FileNotFoundError(f"no committed version at {path}")
    return _manifest(spark, path, v)


def versioned_sink(path: str, mode: str = "append"):
    """foreachBatch sink committing each micro-batch as a table version,
    EXACTLY-ONCE: the manifest records the streaming batch_id, and a
    replayed batch (failure/restart re-delivery) is skipped when the
    latest committed batch_id is already >= the incoming one. Unlike the
    marker-file sink (streaming/ops.incremental_rollup_sink), readers also
    get atomic visibility and time travel per micro-batch for free.

    Use: stream.writeStream.foreachBatch(versioned_sink(path)).start()
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        v = current_version(spark, path)
        if v > 0:
            last = _manifest(spark, path, v).get("batch_id")
            if last is not None and int(last) >= batch_id:
                return  # replayed batch: already committed
        write_version(
            spark, batch_df, path, mode=mode, extra={"batch_id": int(batch_id)}
        )

    return write


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a committed version (default: latest). Time travel = pass any
    retained version number. Reads with mergeSchema: appended versions may
    add columns (schema evolution) — older files surface the new columns
    as nulls, parquet-standard."""
    v = version if version is not None else current_version(spark, path)
    if v <= 0:
        raise FileNotFoundError(f"no committed version at {path}")
    man = _manifest(spark, path, v)
    return spark.read.option("mergeSchema", "true").parquet(
        *[f"{path.rstrip('/')}/{d}" for d in man["dirs"]]
    )


def compact_version(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_within_by: tuple = (),
) -> int:
    """Rewrite the latest version into ~target-sized files and commit the
    result as a NEW version (mode='overwrite' manifest). Readers of the old
    version are never disturbed — this is what makes compaction atomic,
    unlike an in-place directory swap."""
    import math

    df = read_version(spark, path)
    jvm, fs = _fs(spark, path)
    man = _manifest(spark, path, current_version(spark, path))
    total = 0
    for d in man["dirs"]:
        it = fs.listFiles(_jpath(jvm, path, d), True)
        while it.hasNext():
            st = it.next()
            if not st.getPath().getName().startswith(("_", ".")):
                total += st.getLen()
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    out = df.coalesce(n)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    return write_version(spark, out, path, mode="overwrite")


def vacuum(
    spark: SparkSession, path: str, keep_last: int = 2, grace_minutes: int = 60
) -> int:
    """Delete data dirs referenced ONLY by manifests older than the last
    `keep_last` versions (and those stale manifests). Returns the number of
    data dirs removed. Never touches anything the retained manifests list.

    Concurrency: a writer mid-`write_version` has a staged data dir and a
    .tmp-* manifest that no retained manifest references yet — exactly what
    vacuum targets. Unreferenced entries younger than ``grace_minutes``
    (by filesystem mtime) are therefore skipped, so an in-flight commit
    cannot have its staged data deleted between staging and the manifest
    rename. A crashed writer's leftovers are reclaimed on the next vacuum
    after the grace window. ``grace_minutes=0`` restores the aggressive
    behavior (only safe when no writer can be concurrent)."""
    import time as _time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    jvm, fs = _fs(spark, path)
    latest = current_version(spark, path)
    keep_from = max(1, latest - keep_last + 1)
    keep_dirs: set[str] = set()
    for v in range(keep_from, latest + 1):
        keep_dirs.update(_manifest(spark, path, v)["dirs"])
    cutoff_ms = (_time.time() - grace_minutes * 60) * 1000
    removed = 0
    data_root = _jpath(jvm, path, "data")
    if fs.exists(data_root):
        for st in fs.listStatus(data_root):
            rel = f"data/{st.getPath().getName()}"
            if rel not in keep_dirs and st.getModificationTime() < cutoff_ms:
                fs.delete(st.getPath(), True)
                removed += 1
    man_root = _jpath(jvm, path, "_manifests")
    if fs.exists(man_root):
        for st in fs.listStatus(man_root):
            name = st.getPath().getName()  # v{N}.json, or .tmp-* from a crash
            if name.startswith(".tmp-"):
                if st.getModificationTime() < cutoff_ms:
                    fs.delete(st.getPath(), False)
                continue
            try:
                v = int(name[1:9])
            except ValueError:
                continue
            if v < keep_from:
                fs.delete(st.getPath(), False)
    return removed
