"""Time grammar + column expressions.

Semantics per reference src/datapipeline/utils/time.py:5-79:
- cadence  = positive `<n>(min|m|h|d)` (no seconds)
- timecode = signed `<n>(s|min|m|h|d)`
- flooring anchors to the UTC epoch lattice (time.py:42-49); since the engine
  keeps all timestamps in UTC session time, `floor(unix_ts / s) * s` is exact.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_CADENCE_RE = re.compile(r"^(0*[1-9]\d*)(min|m|h|d)$")
_TIMECODE_RE = re.compile(r"^([+-]?\d+)(s|min|m|h|d)$")
_SECONDS_PER_UNIT = {"s": 1, "m": 60, "min": 60, "h": 3600, "d": 86400}


def parse_cadence_seconds(value: str) -> int:
    """`10m` → 600. Positive cadences only (reference utils/time.py:31-39)."""
    m = _CADENCE_RE.fullmatch(value) if isinstance(value, str) else None
    if m is None:
        raise ValueError(f"Unsupported cadence: {value!r}")
    return int(m.group(1)) * _SECONDS_PER_UNIT[m.group(2)]


def parse_timecode_seconds(value: str) -> int:
    """`-1h` → -3600. Signed durations (reference utils/time.py:18-28)."""
    m = _TIMECODE_RE.fullmatch(value) if isinstance(value, str) else None
    if m is None:
        raise ValueError(f"Unsupported timecode: {value!r}")
    return int(m.group(1)) * _SECONDS_PER_UNIT[m.group(2)]


def parse_datetime_utc(value: str):
    """ISO-8601 (Z suffix ok) → tz-aware datetime, naive assumed UTC
    (reference utils/time.py:64-79)."""
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def floor_time_expr(col: Column | str, cadence: str | int) -> Column:
    """Floor a timestamp column to the UTC-epoch cadence lattice.

    Mirrors reference floor_time_to_cadence (utils/time.py:42-49). Integer
    arithmetic on epoch seconds — stays in whole-stage codegen, no UDF.
    """
    secs = parse_cadence_seconds(cadence) if isinstance(cadence, str) else int(cadence)
    c = _as_col(col)
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(c) / F.lit(secs)).cast("long") * F.lit(secs)
    )


def shift_time_expr(col: Column | str, timecode: str | int) -> Column:
    """Add a signed duration to a timestamp column (reference transforms/time.py:24-32)."""
    secs = parse_timecode_seconds(timecode) if isinstance(timecode, str) else int(timecode)
    return _as_col(col) + F.expr(f"INTERVAL {secs} SECOND")
