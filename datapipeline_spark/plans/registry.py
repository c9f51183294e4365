"""Entry-point registries: loaders, parsers, mappers, combiners.

This is the engine's UDx surface (reference pyproject.toml:82-92 registers
loaders/parsers/mappers/combiners as Python entry points; resolved once at
compile time by services/runtime_compiler.py:25-37). Here an entrypoint is a
**DataFrame transform builder** — it receives/returns DataFrames so user code
stays on the Catalyst fast path; `mapInPandas`-style Python logic is opt-in
inside the registered function, never imposed by the framework.

Signatures:
- loader(spark, source_cfg, definition, args) -> DataFrame            (synthetic sources)
- parser(df, args) -> DataFrame                                        (raw → canonical records)
- mapper(df, args) -> DataFrame                                        (records → domain records)
- combiner(df, refs, args) -> DataFrame
    `refs` maps input stream id → column prefix inside `df` ("" for the
    broadcast primary). Fields of input `s` appear as f"{refs[s]}{field}".
"""

from __future__ import annotations

import math
from typing import Any, Callable, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LOADERS: dict[str, Callable[..., DataFrame]] = {}
PARSERS: dict[str, Callable[[DataFrame, dict], DataFrame]] = {}
MAPPERS: dict[str, Callable[[DataFrame, dict], DataFrame]] = {}
COMBINERS: dict[str, Callable[[DataFrame, Mapping[str, str], dict], DataFrame]] = {}


def register_loader(name: str, fn: Callable[..., DataFrame]) -> None:
    LOADERS[name] = fn


def register_parser(name: str, fn: Callable[[DataFrame, dict], DataFrame]) -> None:
    PARSERS[name] = fn


def register_mapper(name: str, fn: Callable[[DataFrame, dict], DataFrame]) -> None:
    MAPPERS[name] = fn


def register_combiner(
    name: str, fn: Callable[[DataFrame, Mapping[str, str], dict], DataFrame]
) -> None:
    COMBINERS[name] = fn


#: packaging entry-point groups scanned for plugins, by registry kind.
#: A third-party distribution declares e.g.
#:   [project.entry-points."datapipeline_spark.parsers"]
#:   "acme.tickdata" = "acme_tickdata.spark:parse"
#: and its entrypoints resolve with NO register_* call — the same contract
#: as the reference (pyproject.toml:82-92, resolved by
#: services/runtime_compiler.py via utils/load.py:load_ep).
ENTRY_POINT_GROUPS = {
    "loader": "datapipeline_spark.loaders",
    "parser": "datapipeline_spark.parsers",
    "mapper": "datapipeline_spark.mappers",
    "combiner": "datapipeline_spark.combiners",
}


def _load_from_entry_points(kind: str, name: str) -> Callable | None:
    """Look `name` up in the installed-distribution entry points for
    `kind`'s group. Returns the loaded callable or None; raises on an
    ambiguous name (two distributions claiming it) or a non-callable."""
    import importlib.metadata as md

    eps = md.entry_points().select(group=ENTRY_POINT_GROUPS[kind], name=name)
    if not eps:
        return None
    if len(eps) > 1:
        mods = ", ".join(ep.value for ep in eps)
        raise ValueError(f"ambiguous {kind} entrypoint {name!r}: {mods}")
    fn = next(iter(eps)).load()
    if not callable(fn):
        raise TypeError(f"{kind} entrypoint {name!r} must load to a callable")
    return fn


def discover_entrypoints() -> dict[str, list[str]]:
    """Eagerly load EVERY plugin entry point into the registries (called
    once per compile by plans/compiler.compile_project; also useful for
    CLI listings). Explicit register_* calls win over distributions —
    a plugin cannot silently shadow in-process registrations. Returns
    {kind: [names loaded]}."""
    import importlib.metadata as md

    tables = {
        "loader": LOADERS,
        "parser": PARSERS,
        "mapper": MAPPERS,
        "combiner": COMBINERS,
    }
    loaded: dict[str, list[str]] = {}
    for kind, group in ENTRY_POINT_GROUPS.items():
        # two DISTRIBUTIONS claiming one name is an error, same as the lazy
        # _load_from_entry_points path — entry_points() ordering is
        # environment-dependent, so first-seen-wins would make plugin
        # resolution nondeterministic AND inconsistent with lazy lookup
        by_name: dict[str, list] = {}
        for ep in md.entry_points().select(group=group):
            by_name.setdefault(ep.name, []).append(ep)
        for name, eps in by_name.items():
            if len(eps) > 1:
                mods = ", ".join(ep.value for ep in eps)
                raise ValueError(f"ambiguous {kind} entrypoint {name!r}: {mods}")
            if name in tables[kind]:
                continue
            fn = eps[0].load()
            if not callable(fn):
                raise TypeError(f"{kind} entrypoint {name!r} must load to a callable")
            tables[kind][name] = fn
            loaded.setdefault(kind, []).append(name)
    return loaded


def resolve(kind: str, name: str) -> Callable:
    table = {
        "loader": LOADERS,
        "parser": PARSERS,
        "mapper": MAPPERS,
        "combiner": COMBINERS,
    }[kind]
    if name not in table:
        # lazy plugin fallback: a pip-installed distribution's entry point
        # resolves without any register_* call (memoized into the table)
        fn = _load_from_entry_points(kind, name)
        if fn is not None:
            table[name] = fn
            return fn
        raise KeyError(f"unknown {kind} entrypoint {name!r}; registered: {sorted(table)}")
    return table[name]


# --------------------------------------------------------------------------- #
# built-in loaders
# --------------------------------------------------------------------------- #


def _load_synthetic_ticks(spark: SparkSession, source_cfg, definition, args: dict) -> DataFrame:
    """Bounded tick generator (reference sources/synthetic/time/loader.py:9-44)."""
    from datapipeline_spark.sources.readers import time_ticks

    return time_ticks(spark, args["start"], args["end"], args["frequency"])


register_loader("core.synthetic.ticks", _load_synthetic_ticks)


# --------------------------------------------------------------------------- #
# built-in parsers
# --------------------------------------------------------------------------- #


def _parse_identity(df: DataFrame, args: dict) -> DataFrame:
    return df


def _coerce_time(df: DataFrame, time_field: str) -> DataFrame:
    """ISO-8601 (Z-suffix ok) or epoch → TimestampType `time`, asserted
    non-null (reference parsers/temporal_record.py coerce_time + the tz-aware
    requirement in pipelines/stream/pipeline.py:146-184)."""
    src = F.col(time_field)
    dtype = dict(df.dtypes).get(time_field)
    ts = src if dtype == "timestamp" else F.to_timestamp(src)
    guarded = F.when(
        ts.isNull() & src.isNotNull(),
        F.raise_error(F.concat(F.lit("unparseable time: "), src.cast("string"))),
    ).otherwise(ts)
    out = df.withColumn("__time__", guarded).drop(time_field)
    cols = ["__time__"] + [c for c in out.columns if c != "__time__"]
    return out.select(*cols).withColumnRenamed("__time__", "time")


def _parse_temporal_record(df: DataFrame, args: dict) -> DataFrame:
    return _coerce_time(df, str(args.get("time_field", "time")))


def _parse_temporal_csv(df: DataFrame, args: dict) -> DataFrame:
    """Messy real-world temporal CSV (reference parsers `core.temporal.csv`):
    named time column (naive timestamps = UTC), decimal-comma numerics via
    ``decimal: ","``, and ``attributes: {out: source_col}`` projections. Only
    time + value + attributes survive (the reference DTO shape)."""
    time_field = str(args.get("time_field", "time"))
    value_field = str(args.get("value_field", "value"))
    decimal = str(args.get("decimal", "."))
    attributes: dict = dict(args.get("attributes", {}))
    out = _coerce_time(df, time_field)
    if value_field in out.columns:
        raw = F.col(value_field)
        if decimal != ".":
            raw = F.replace(raw.cast("string"), F.lit(decimal), F.lit("."))
        out = out.withColumn("__value__", raw.cast("double"))
    else:
        out = out.withColumn("__value__", F.lit(None).cast("double"))
    cols = [F.col("time")]
    # attributes are raw CSV cells → always strings (the reference parser
    # never types them; schema inference here must not leak through)
    cols += [F.col(src).cast("string").alias(dst) for dst, src in attributes.items()]
    cols += [F.col("__value__").alias("value")]
    if attributes or value_field in df.columns:
        return out.select(*cols)
    return out.drop("__value__")


register_parser("identity", _parse_identity)
register_parser("core.temporal_record", _parse_temporal_record)
register_parser("core.temporal.csv", _parse_temporal_csv)
register_parser("core.synthetic.ticks", _parse_identity)  # loader already canonical


# --------------------------------------------------------------------------- #
# built-in mappers
# --------------------------------------------------------------------------- #


def _map_identity(df: DataFrame, args: dict) -> DataFrame:
    return df


def _map_encode_time(df: DataFrame, args: dict) -> DataFrame:
    """Time featurization (reference mappers/synthetic/time.py:14-25):
    linear → epoch seconds; hour_sin/weekday_sin → cyclic encodings. Output
    schema = (time, value), like the reference's TimeEncodedRecord."""
    mode = args.get("mode", "linear")
    t = F.col("time")
    if mode == "linear":
        value = t.cast("double")
    elif mode == "hour_sin":
        value = F.sin(F.hour(t) * (2.0 * math.pi / 24.0))
    elif mode == "weekday_sin":
        value = F.sin(((F.dayofweek(t) + 5) % 7) * (2.0 * math.pi / 7.0))
    else:
        raise ValueError(f"Unsupported encode_time mode: {mode}")
    return df.select(t.alias("time"), value.alias("value"))


register_mapper("identity", _map_identity)
register_mapper("encode_time", _map_encode_time)


# --------------------------------------------------------------------------- #
# built-in combiners
# --------------------------------------------------------------------------- #


def _ref_col(df: DataFrame, refs: Mapping[str, str], ref: str) -> Column:
    """Resolve "stream.id.field" → prefixed column (stream ids are dotted;
    fields are not). Join keys (partition fields, time) stay unprefixed in the
    joined frame, so a prefixed miss falls back to the bare field."""
    columns = set(df.columns)
    for sid in sorted(refs, key=len, reverse=True):
        if ref == sid:
            raise ValueError(f"combine ref {ref!r} names a stream, not a field")
        if ref.startswith(sid + "."):
            field = ref[len(sid) + 1 :]
            prefixed = refs[sid] + field
            if prefixed in columns:
                return F.col(prefixed)
            if field in columns:  # shared join key
                return F.col(field)
            raise ValueError(f"combine ref {ref!r}: no column {prefixed!r}")
    if ref in columns:  # bare field (broadcast primary keeps its names)
        return F.col(ref)
    raise ValueError(f"combine ref {ref!r} matches no input stream of {sorted(refs)}")


def _combine_select(df: DataFrame, refs: Mapping[str, str], args: dict) -> DataFrame:
    """Declarative combine: `fields: {out: "stream.id.field"}` projects inputs
    into one record; optional `derive: [{to, left, operator, right_field|right_value}]`
    adds arithmetic over the projected fields. Covers the reference's example
    combiners (tests/combiners.py:4-17) without leaving Catalyst."""
    fields: dict[str, str] = dict(args.get("fields", {}))
    if not fields:
        raise ValueError("combine select requires 'fields'")
    cols = [F.col("time")] if "time" in df.columns else []
    cols += [_ref_col(df, refs, ref).alias(out) for out, ref in fields.items()]
    out = df.select(*cols)
    for d in args.get("derive", []):
        left = F.col(d["left"])
        right = (
            F.lit(d["right_value"]) if "right_value" in d else F.col(d["right_field"])
        )
        op = d["operator"]
        expr = {
            "add": left + right,
            "sub": left - right,
            "mul": left * right,
            "div": left / right,
        }[op]
        out = out.withColumn(d["to"], expr)
    return out


register_combiner("select", _combine_select)
