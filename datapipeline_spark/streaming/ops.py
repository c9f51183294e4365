"""Structured Streaming equivalents of the reference's stream-shaped batch ops.

Reference mapping (SURVEY.md §2.10): the reference is batch over bounded
sources but its dataflow is stream-shaped. This module provides the unbounded
versions:

| reference concept                  | here                                    |
|------------------------------------|-----------------------------------------|
| cadence bucket grouping            | tumbling `F.window(time, cadence)` agg  |
| late/duplicate data (hard errors)  | watermark + `dropDuplicatesWithinWatermark` |
| per-key generator state (rolling)  | `applyInPandasWithState` per-key state  |
| sliding sequences                  | stateful trailing-window emitter        |

Scale posture: state is partitioned by key across executors (RocksDB-backed
state store in production configs); watermarks bound state size; all
aggregations are incremental. Each op returns a streaming DataFrame — callers
pick the sink/trigger (tests use file source + availableNow + memory sink).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from datapipeline_spark.functions.time import (
    parse_cadence_seconds,
    parse_timecode_seconds,
)


def stream_jsonl_source(
    spark: SparkSession,
    path: str,
    schema: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source (new files under `path` become batches).
    Schema is mandatory — streaming reads never infer (plan stability)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def dedupe_stream(
    sdf: DataFrame,
    keys: Sequence[str],
    watermark: str = "1 hour",
    time_field: str = "time",
) -> DataFrame:
    """Drop duplicate `(keys)` rows arriving within the watermark horizon.

    The reference fails hard on duplicates (alignment/engine.py:56-65); a
    stream can't fail on late arrivals, so the streaming contract is
    watermarked dedup — state size stays bounded by the watermark.
    """
    return sdf.withWatermark(time_field, watermark).dropDuplicatesWithinWatermark(
        [*keys, time_field]
    )


def cadence_assembly_stream(
    sdf: DataFrame,
    cadence: str,
    entity_keys: Sequence[str],
    value_cols: Sequence[str],
    watermark: str = "1 hour",
    time_field: str = "time",
) -> DataFrame:
    """Streaming sample assembly: tumbling cadence window per entity with
    last-by-time per value column (batch analogue: dataset/sample.py
    `assemble_samples`). Watermark closes buckets so append-mode sinks emit
    exactly one final row per (bucket, entity)."""
    seconds = parse_cadence_seconds(cadence)
    w = F.window(F.col(time_field), f"{seconds} seconds")
    aggs = [F.max_by(F.col(c), F.col(time_field)).alias(c) for c in value_cols]
    return (
        sdf.withWatermark(time_field, watermark)
        .groupBy(w.alias("bucket"), *entity_keys)
        .agg(*aggs)
        .select(F.col("bucket.start").alias("time"), *entity_keys, *value_cols)
    )


def rolling_mean_stream(
    sdf: DataFrame,
    field: str,
    window: int,
    entity_keys: Sequence[str],
    min_samples: int = 1,
    time_field: str = "time",
    watermark: str = "1 hour",
    out: str = "rolling_mean",
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key trailing `window`-row mean over event-time order — the
    streaming form of operators/window.rolling (reference
    transforms/stream/rolling.py:34-77), implemented with
    `applyInPandasWithState`: state = last `window` values per key, exactly
    the reference's per-partition generator state made distributed/durable.

    Rows within one micro-batch are processed in event-time order; across
    batches arrival order applies (use watermarked sources for discipline).
    """
    payload = [c for c in sdf.columns]
    sort_cols = list(order_cols) if order_cols else [time_field]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sdf.schema.fields
    ) + f", `{out}` double"
    state_schema = "values array<double>"

    def fn(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            (buf,) = state.get
            buf = list(buf)
        else:
            buf = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(sort_cols)
            means = []
            for v in pdf[field]:
                buf.append(None if pd.isna(v) else float(v))
                if len(buf) > window:
                    buf.pop(0)
                present = [x for x in buf if x is not None]
                means.append(
                    sum(present) / len(present)
                    if len(present) >= min_samples
                    else None
                )
            pdf = pdf.copy()
            pdf[out] = pd.Series(means, index=pdf.index, dtype="float64")
            yield pdf[payload + [out]]
        state.update((buf,))

    return sdf.groupBy(*entity_keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sequence_windows_stream(
    sdf: DataFrame,
    field: str,
    size: int,
    entity_keys: Sequence[str],
    stride: int = 1,
    time_field: str = "time",
    out: str = "sequence",
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Sliding fixed-size sequences per key (streaming form of
    operators/window.sequence_windows; reference pipelines/series/stages.py:
    32-60): emit only full windows aligned to `stride` from the series start;
    state = trailing values + row count per key."""
    dtypes = dict(sdf.dtypes)
    key_fields = ", ".join(f"`{k}` {dtypes[k]}" for k in entity_keys)
    out_schema = ", ".join(
        part
        for part in (f"`{time_field}` timestamp", key_fields, f"`{out}` array<double>")
        if part
    )
    state_schema = "values array<double>, n bigint"
    sort_cols = list(order_cols) if order_cols else [time_field]

    def fn(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            buf, n = state.get
            buf = list(buf)
        else:
            buf, n = [], 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(sort_cols)
            rows = []
            for t, v in zip(pdf[time_field], pdf[field]):
                buf.append(None if pd.isna(v) else float(v))
                n += 1
                if len(buf) > size:
                    buf.pop(0)
                if n >= size and (n - size) % stride == 0:
                    rows.append((t, *key, list(buf)))
            if rows:
                yield pd.DataFrame(rows, columns=[time_field, *entity_keys, out])
        state.update((buf, n))

    return sdf.groupBy(*entity_keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    lookback: str,
    time_field: str = "time",
    right_suffix: str = "_r",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: pair each left row with right rows sharing
    `keys` whose time falls in ``[left.time - lookback, left.time]``.

    The unbounded analogue of the reference's alignment joins (SURVEY.md §2.5
    align/broadcast — batch, exact-key) generalized to a time interval: both
    sides carry watermarks, and the time-range predicate lets Spark expire
    buffered rows once the watermark passes `lookback`, so join state is
    bounded. Inner-join results emit as soon as both sides match — no
    watermark-close wait. All non-key right columns are suffixed with
    `right_suffix`.

    ``how`` may be "inner" or "leftOuter". Outer results (left rows with no
    match) are held back until the watermark passes their window, so in a
    bounded run the tail of the stream only flushes if something advances
    the watermark beyond it — append a heartbeat/punctuation row past
    ``max(time) + lookback + watermark`` (and filter it from the output) to
    drain the state deterministically.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"interval_join_stream supports inner/leftOuter, got {how!r}")
    lb_s = parse_timecode_seconds(lookback)
    l = left.withWatermark(time_field, watermark)
    renames = {
        c: c + right_suffix for c in right.columns if c not in keys
    }
    r = right.withColumnsRenamed(renames).withWatermark(
        time_field + right_suffix, watermark
    )
    rt = F.col(time_field + right_suffix)
    join_cond = (
        rt >= F.col(time_field) - F.expr(f"INTERVAL {lb_s} SECONDS")
    ) & (rt <= F.col(time_field))
    for k in keys:
        join_cond = join_cond & (l[k] == r[k])
    out = l.join(r, join_cond, how)
    # drop the duplicate key columns from the right side
    for k in keys:
        out = out.drop(r[k])
    return out


def sessionize_stream(
    sdf: DataFrame,
    gap: str,
    entity_keys: Sequence[str],
    time_field: str = "time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization — the unbounded form of operators/asof.py
    `sessionize`, using Spark's native ``session_window`` aggregation: a
    session extends while events arrive within `gap` (timecode) of its end,
    and closes (emits one row) once the watermark passes session_end.

    Built-in incremental session state (no Python in the loop); state per
    open session only, bounded by the watermark. Output: (keys...,
    session_start, session_end, n_events) where session_end is last event
    time + gap, matching Spark's session-window semantics.
    """
    gap_s = parse_timecode_seconds(gap)
    return (
        sdf.withWatermark(time_field, watermark)
        .groupBy(
            *entity_keys,
            F.session_window(F.col(time_field), f"{gap_s} seconds"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *entity_keys,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def idempotent_batch_sink(path: str):
    """foreachBatch sink with exactly-once delivery by idempotence.

    Structured Streaming guarantees at-least-once invocation of
    foreachBatch: after a failure the SAME batch_id is replayed with the
    SAME data. Writing each micro-batch to its own `batch_id=<n>` directory
    and skipping directories that already committed (`_SUCCESS` marker)
    makes the replay a no-op — the standard exactly-once file-sink pattern
    when the built-in file sink's log can't be used (e.g. custom layouts,
    multi-table fan-out). The output is itself a readable hive-partitioned
    dataset.

    Returns the function to pass to ``writeStream.foreachBatch``.
    """

    def process(batch_df, batch_id: int) -> None:
        out = path.rstrip("/") + f"/batch_id={batch_id}"
        # Probe the commit marker through the Hadoop FileSystem resolved for
        # the path's scheme — os.path.exists would silently never fire on
        # hdfs:// or s3a:// paths, turning the skip into dead code there.
        spark = batch_df.sparkSession
        marker = spark._jvm.org.apache.hadoop.fs.Path(out + "/_SUCCESS")
        fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(marker):
            return  # replayed after failure: already committed, skip
        batch_df.write.mode("overwrite").parquet(out)

    return process


def cdc_upsert_sink(path: str, keys, seq, op_col: str = "op", delete_op: str = "D"):
    """foreachBatch CDC consumer: fold each micro-batch of changes into a
    materialized latest-state table (the Delta/Iceberg ``MERGE INTO``
    pattern, expressed on plain parquet).

    Each trigger applies :func:`datapipeline_spark.operators.cdc.
    apply_changes` — snapshot ⊕ batch — and swaps the state directory via a
    staging write + Hadoop FileSystem rename (never overwriting a directory
    that is still being read; works on any FS the path's scheme resolves
    to). The state RETAINS tombstones (winning deletes, with ``op_col``):
    per-key ordering is only guaranteed within a source partition, so a
    late micro-batch can carry an upsert OLDER than an applied delete —
    without the tombstone it would resurrect the key. With tombstones the
    fold is associative (last-writer-wins by ``seq``), so folding N
    micro-batches equals one batch apply, which the test asserts. Read the
    live state with :func:`read_cdc_state`. On a transactional table format
    this whole function collapses to ``MERGE INTO`` per batch (with the
    format's own tombstone retention).

    Returns the function to pass to ``writeStream.foreachBatch``.
    """
    from datapipeline_spark.operators.cdc import apply_changes

    def process(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        state = jvm.org.apache.hadoop.fs.Path(path)
        fs = state.getFileSystem(conf)
        if fs.exists(state):
            snap = spark.read.parquet(path)
        else:
            snap = spark.createDataFrame([], batch_df.schema)
        merged = apply_changes(
            snap, batch_df, keys, seq, op_col, delete_op, keep_tombstones=True
        )
        staging = path.rstrip("/") + f".staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        fs.delete(state, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(staging), state)

    return process


def read_cdc_state(spark, path: str, op_col: str = "op", delete_op: str = "D"):
    """Live rows of a :func:`cdc_upsert_sink` state table (tombstones
    filtered, op column dropped)."""
    from pyspark.sql import functions as F

    st = spark.read.parquet(path)
    return st.filter(F.col(op_col) != delete_op).drop(op_col)


def ewma_stream(
    sdf: DataFrame,
    field: str,
    window: int,
    entity_keys: Sequence[str],
    decay: float = 0.5,
    time_field: str = "time",
    out: str = "ewma",
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key truncated EWMA over event-time order — the streaming form of
    operators/window.ewma, via `applyInPandasWithState` (state = last
    `window` values per key, bounded). The fold runs the identical IEEE
    double operations as the batch JVM array fold (oldest→newest, acc from
    0.0), so with decay 0.5 (exact powers of two) streaming == batch
    bit-for-bit — asserted in tests/test_streaming.py."""
    payload = [c for c in sdf.columns]
    sort_cols = list(order_cols) if order_cols else [time_field]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sdf.schema.fields
    ) + f", `{out}` double"
    state_schema = "values array<double>"

    def fn(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        buf = list(state.get[0]) if state.exists else []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(sort_cols)
            res = []
            for v in pdf[field]:
                buf.append(float(v))
                if len(buf) > window:
                    buf.pop(0)
                n = len(buf)
                num = 0.0
                den = 0.0
                for i, x in enumerate(buf):  # oldest -> newest, as the batch fold
                    w = decay ** float(n - 1 - i)
                    num = num + x * w
                    den = den + w
                res.append(num / den)
            pdf = pdf.copy()
            pdf[out] = pd.Series(res, index=pdf.index, dtype="float64")
            yield pdf[payload + [out]]
        state.update((buf,))

    return sdf.groupBy(*entity_keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def profile_stream(
    sdf: DataFrame,
    entity_keys: Sequence[str],
    value_field: str = "value",
) -> DataFrame:
    """Per-key running profile (count / exact-cent sum / min / max) on the
    Spark 4 `transformWithStateInPandas` API — the typed-state successor to
    `applyInPandasWithState` (ValueState handles, per-state TTL, timers,
    initial-state bootstrap), used here so the engine exercises both
    stateful surfaces. Emits ONE profile row per key per micro-batch
    (running totals), so with a single availableNow batch the batch
    aggregate is an exact oracle, and across batches the last emission
    folds to the one-shot result (tested). The sum accumulates integer
    cents in state — exact in any batch split; min/max are moved doubles.

    State is one fixed-width tuple per key, partitioned across executors
    (RocksDB-backed in production): bounded by key cardinality, not data
    volume.

    Environment gate: the transformWithState Python runner requires
    protobuf AND the RocksDB state store provider. The provider switch is
    session-wide state, so this builder never flips it implicitly (doing
    so would silently change the state backend of every other stateful
    query started later in the session) — call `use_rocksdb_state_store`
    explicitly before building. When protobuf is absent — as in this
    container — or the session is not RocksDB-configured, the op falls
    back to an `applyInPandasWithState` implementation with identical
    semantics, state shape, and output schema; `test_streaming` asserts
    the two surfaces agree wherever both are available."""
    keys = list(entity_keys)
    key_fields = [f for f in sdf.schema.fields if f.name in keys]
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields)
        + ", `n_events` bigint, `total_cents` bigint,"
        + " `min_value` double, `max_value` double"
    )

    def _fold(pdfs, n, s, mn, mx):
        for pdf in pdfs:
            vals = pdf[value_field].astype("float64")
            n += int(len(vals))
            # exact integer cents, like the batch convention: round half
            # away handled identically because inputs are 2-dp doubles
            s += int((vals * 100).round().astype("int64").sum())
            bmn = float(vals.min())
            bmx = float(vals.max())
            mn = bmn if mn is None or bmn < mn else mn
            mx = bmx if mx is None or bmx > mx else mx
        return n, s, mn, mx

    def _emit(key, n, s, mn, mx):
        return pd.DataFrame(
            {
                **{k: [kv] for k, kv in zip(keys, key)},
                "n_events": [n],
                "total_cents": [s],
                "min_value": [mn],
                "max_value": [mx],
            }
        )

    if has_transform_with_state() and _is_rocksdb_session(sdf.sparkSession):
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class ProfileProcessor(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._state = handle.getValueState(
                    "profile", "n BIGINT, s BIGINT, mn DOUBLE, mx DOUBLE"
                )

            def handleInputRows(self, key, rows, timerValues):
                st = self._state.get() if self._state.exists() else None
                n, s, mn, mx = _fold(rows, *(st or (0, 0, None, None)))
                self._state.update((n, s, mn, mx))
                yield _emit(key, n, s, mn, mx)

            def close(self) -> None:
                pass  # required by the StatefulProcessor ABC; no resources held

        return sdf.groupBy(*keys).transformWithStateInPandas(
            statefulProcessor=ProfileProcessor(),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="None",
        )

    def fn(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        st = state.get if state.exists else (0, 0, None, None)
        n, s, mn, mx = _fold(pdf_iter, *st)
        state.update((n, s, mn, mx))
        yield _emit(key, n, s, mn, mx)

    return sdf.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="n bigint, s bigint, mn double, mx double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark) -> None:
    """Explicit opt-in to the RocksDB state store (required by
    transformWithState; recommended for any large-state streaming job).
    Session-wide by design — Spark resolves the provider from the session
    conf at query start, so there is no per-query scope; keeping the
    switch a named, caller-visible action is what prevents one operator
    from silently changing every other stateful query's backend."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


def _is_rocksdb_session(spark) -> bool:
    try:
        return (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
            == ROCKSDB_PROVIDER
        )
    except Exception:
        # conf probe only: some session states raise on unknown streaming
        # keys — "couldn't read the conf" and "not RocksDB" route the same
        # way (the caller picks the HDFS-backed default provider)
        return False


def has_transform_with_state() -> bool:
    """True when the Spark 4 transformWithState Python runner can start:
    its worker imports protobuf at init, so a missing protobuf crashes the
    whole query rather than failing gracefully."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def incremental_rollup_sink(
    path: str,
    keys: Sequence[str],
    counters: Sequence[str],
):
    """foreachBatch incremental aggregate maintenance: keep a materialized
    per-key table of ASSOCIATIVE counters (counts, integer sums) current as
    micro-batches arrive — the continuous-aggregate refresh pattern
    (TimescaleDB/Materialize) on plain parquet.

    Each trigger pre-aggregates ONLY the batch (tiny), unions it with the
    matching rows of the existing state, re-sums, and swaps the state dir
    via staging + Hadoop FS rename. Because every counter is associative
    and commutative, folding N micro-batches equals one batch aggregate —
    asserted in tests. Counters must be pre-computed columns (e.g. a 1 for
    counts, cent-scaled longs for sums); the merge is a plain SUM over
    (state ∪ batch-aggregate).

    Bootstrap: first batch creates the state. Read the live rollup with a
    plain ``spark.read.parquet(path)``.
    """

    def process(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        state = jvm.org.apache.hadoop.fs.Path(path)
        fs = state.getFileSystem(conf)
        from pyspark.sql import functions as F

        delta = batch_df.groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in counters]
        )
        if fs.exists(state):
            prev = spark.read.parquet(path)
            merged = (
                prev.unionByName(delta)
                .groupBy(*keys)
                .agg(*[F.sum(c).alias(c) for c in counters])
            )
        else:
            merged = delta
        staging = path.rstrip("/") + f".staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        fs.delete(state, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(staging), state)

    return process


def expectations_sink(path: str, expectations):
    """foreachBatch data-quality ledger: fold each micro-batch's
    expectation_report (operators/expect.py) into a cumulative per-rule
    violation table on plain parquet — the streaming face of the
    declarative DQ surface (batch report == the fold of the per-batch
    reports, because every column is an associative count; the ppm ratio
    is recomputed from the folded integers, never averaged).

    State dir swaps via staging + Hadoop FS rename (object-store safe,
    same contract as incremental_rollup_sink). Read the live ledger with
    ``spark.read.parquet(path)``.
    """

    def process(batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from datapipeline_spark.operators.expect import expectation_report

        spark = batch_df.sparkSession
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        state = jvm.org.apache.hadoop.fs.Path(path)
        fs = state.getFileSystem(conf)

        delta = expectation_report(batch_df, expectations).select(
            "rule", "action", "n_rows", "n_violations"
        )
        if fs.exists(state):
            prev = spark.read.parquet(path).select(
                "rule", "action", "n_rows", "n_violations"
            )
            merged = (
                prev.unionByName(delta)
                .groupBy("rule", "action")
                .agg(
                    F.sum("n_rows").alias("n_rows"),
                    F.sum("n_violations").alias("n_violations"),
                )
            )
        else:
            merged = delta
        merged = merged.withColumn(
            "violation_ppm",
            F.expr(
                "CAST((n_violations * 1000000) DIV greatest(n_rows, 1) AS BIGINT)"
            ),
        )
        staging = path.rstrip("/") + f".staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        fs.delete(state, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(staging), state)

    return process


def near_dup_filter_stream(
    sdf: DataFrame,
    text_col: str = "text",
    watermark: str = "1 hour",
    time_field: str = "time",
    shingle_words: int = 2,
    params=None,
) -> DataFrame:
    """Ingest-time streaming near-dup filter: per-ROW minhash signature
    (dedup/minhash.row_minhash — a pure map, legal in append mode where a
    per-doc aggregation is not) + watermarked first-occurrence dedup on the
    signature. Documents whose full signature was already seen within the
    watermark horizon are dropped — the streaming face of the batch
    MinHash dedup pipeline, with state bounded by (watermark window ×
    distinct-signature rate), not corpus size. Signature-less rows (fewer
    than `shingle_words` words) pass through untouched: they cannot be
    near-dups, and silently dropping them would lose data.
    """
    from datapipeline_spark.dedup.minhash import MinHashParams, row_minhash

    sig = row_minhash(
        sdf, text_col, params or MinHashParams(), shingle_words, out="minhash_sig"
    ).withWatermark(time_field, watermark)
    # Split, don't fabricate a key: routing signature-less rows through the
    # dedup with any shared fallback key (e.g. '∅'+event-time) would
    # deduplicate two DISTINCT short documents that share a timestamp.
    # They bypass the stateful operator entirely — truly untouched, and
    # the dedup state stays signature-only.
    with_sig = sig.filter(F.col("minhash_sig").isNotNull())
    no_sig = sig.filter(F.col("minhash_sig").isNull())
    return with_sig.dropDuplicatesWithinWatermark(["minhash_sig"]).unionByName(
        no_sig
    )


def cusum_stream(
    sdf: DataFrame,
    field: str,
    target: float,
    entity_keys: Sequence[str],
    slack: float = 0.0,
    scale: int = 100,
    time_field: str = "time",
    out: str = "cusum",
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key streaming CUSUM — the streaming form of
    operators/window.cusum, via `applyInPandasWithState`.

    State per key is TWO integers (prefix sum and its running minimum) —
    the same prefix-sum/running-min identity the batch operator uses, so
    state is O(1) per key regardless of stream length, and the emitted
    statistic is the identical exact bigint: streaming == batch
    bit-for-bit under event-time order (asserted in tests). Deviations
    accumulate as integers at `scale` units per 1.0.
    """
    payload = [c for c in sdf.columns]
    sort_cols = list(order_cols) if order_cols else [time_field]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sdf.schema.fields
    ) + f", `{out}` bigint"
    state_schema = "prefix bigint, run_min bigint"

    def _half_up(x: float) -> int:
        # Spark's round() is HALF_UP away from zero; Python round() is
        # banker's — match Spark exactly so streaming == batch on .5 ties
        import math

        return int(math.copysign(math.floor(abs(x) * scale + 0.5), x))

    t9 = _half_up(target + slack)

    def fn(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        prefix, run_min = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            pdf = pdf.sort_values(sort_cols)
            stats = []
            for v in pdf[field]:
                prefix += _half_up(float(v)) - t9
                run_min = min(run_min, prefix)
                stats.append(prefix - min(0, run_min))
            pdf = pdf.copy()
            pdf[out] = pd.Series(stats, index=pdf.index, dtype="int64")
            yield pdf[payload + [out]]
        state.update((prefix, run_min))

    return sdf.groupBy(*entity_keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def holt_stream(
    sdf: DataFrame,
    field: str,
    entity_keys: Sequence[str],
    alpha: float = 0.5,
    beta: float = 0.5,
    time_field: str = "time",
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key Holt linear-trend fold over event-time order — the streaming
    form of operators/holt.holt_linear, via `applyInPandasWithState`. State
    is O(1) per key (level, trend, count — never a buffer: the recurrence
    is fully summarized by its two-double state, the property that makes
    Holt the canonical streaming forecaster). The Python fold performs the
    identical IEEE double operations as the batch JVM array fold, so with
    α=β=½ (exact power-of-two scalings) streaming == batch bit-for-bit."""
    payload = [c for c in sdf.columns]
    sort_cols = list(order_cols) if order_cols else [time_field]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sdf.schema.fields
    ) + ", `level` double, `trend` double"
    state_schema = "l double, b double, n bigint"

    def fn(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            l, b, n = state.get
        else:
            l, b, n = 0.0, 0.0, 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(sort_cols)
            levels, trends = [], []
            for v in pdf[field]:
                y = float(v)
                if n == 0:
                    l, b = y, 0.0
                else:
                    l_new = alpha * y + (1.0 - alpha) * (l + b)
                    b = beta * (l_new - l) + (1.0 - beta) * b
                    l = l_new
                n += 1
                levels.append(l)
                trends.append(b)
            pdf = pdf.copy()
            pdf["level"] = pd.Series(levels, index=pdf.index, dtype="float64")
            pdf["trend"] = pd.Series(trends, index=pdf.index, dtype="float64")
            yield pdf[payload + ["level", "trend"]]
        state.update((l, b, n))

    return sdf.groupBy(*entity_keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hampel_stream(
    sdf: DataFrame,
    field: str,
    window: int,
    entity_keys: Sequence[str],
    k: int = 3,
    min_samples: int = 3,
    time_field: str = "time",
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key streaming Hampel repair — the streaming form of
    operators/window.hampel via `applyInPandasWithState`: state is the
    last ``window − 1`` integer values (bounded buffer, like
    ewma_stream). Lower median / lower MAD over the trailing frame are
    pure integer selections, so streaming output EQUALS the batch
    operator row for row — no float folds at all."""
    payload = [c for c in sdf.columns]
    sort_cols = list(order_cols) if order_cols else [time_field]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sdf.schema.fields
    ) + ", `hampel` bigint"
    state_schema = "values array<long>"

    def fn(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        buf = list(state.get[0]) if state.exists else []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(sort_cols)
            res = []
            for v in pdf[field]:
                v = int(v)
                buf.append(v)
                if len(buf) > window:
                    buf.pop(0)
                frame = sorted(buf)
                n = len(frame)
                med = frame[(n + 1) // 2 - 1]
                mad = sorted(abs(x - med) for x in frame)[(n + 1) // 2 - 1]
                res.append(
                    med if n >= min_samples and abs(v - med) > k * mad else v
                )
            pdf = pdf.copy()
            pdf["hampel"] = pd.Series(res, index=pdf.index, dtype="int64")
            yield pdf[payload + ["hampel"]]
        state.update((buf,))

    return sdf.groupBy(*entity_keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
