#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every entry in __spark_entry__.queries() on Spark and the matching
oracle_sql() on DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive values (column-name-sorted,
like the driver's hash compare — see repo README "driver contract").

Usage: python tools/check_correctness.py [--sf-dir /root/testdata/sf0.01] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tag(v, float_round=None):
    """Scalar → (type_tag, canonical_value).

    The driver's value-hash is TYPE-strict (round-1 judge finding: DuckDB
    HUGEINT sums arrive as float64 while Spark emits bigint, and `7` vs `7.0`
    hash differently even though Python `==` says equal). Mirror that by
    tagging every scalar with its post-pandas Python type so int/float drift
    is a hard FAIL here too.
    """
    import numpy as np

    if v is None:
        return ("n", None)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("n", None)
        if float_round is not None:
            f = round(f, float_round)
        return ("f", f)
    if isinstance(v, bytes):
        return ("y", v)
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, tuple):
        return ("t", tuple(_tag(x, float_round) for x in v))
    if v != v:  # NaT / NaN objects
        return ("n", None)
    return ("o:" + type(v).__name__, str(v))


def _canon_df(df):
    """Canonicalize a pandas DataFrame: sorted columns, datetime→int64 micros,
    floats→float64, lists→tuples. Returned dtypes are directly comparable
    across engines (int vs float drift survives canonicalization and FAILS)."""
    import pandas as pd
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: tuple(np.asarray(v).tolist()) if isinstance(v, (list, np.ndarray)) else v
            )
    return df


def _dtypes(df):
    """Column → dtype KIND ('i'nt / 'f'loat / 'b'ool / 'O'bject).

    Width is deliberately ignored (int32 vs int64): the driver hash treats
    both as Python ints (q7_nation_volume emits int32 l_year vs the oracle's
    int64 and was driver-green in round 1). What must match is the KIND —
    int vs float is exactly the HUGEINT→float64 class the driver rejects.
    """
    kinds = {}
    for c, dt in _canon_df(df).dtypes.items():
        k = dt.kind
        kinds[c] = "i" if k in "iu" else k
    return kinds


def _normalize(df, float_round=None):
    """pandas DataFrame → sorted list of type-tagged value tuples."""
    df = _canon_df(df)
    rows = []
    for t in df.itertuples(index=False, name=None):
        rows.append(tuple(_tag(v, float_round) for v in t))
    return sorted(rows, key=lambda r: tuple((x[1] is None, x[0], str(x[1])) for x in r))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--float-round", type=int, default=None, help="extra rounding before compare")
    ap.add_argument("--json", default=None, help="write driver-style per-query results JSON here")
    ap.add_argument(
        "--duck-temp-cap",
        default=None,
        help="cap DuckDB spill (e.g. '30GiB'): a runaway oracle then fails "
        "cleanly as that one query's error instead of filling the disk under "
        "every other process (observed: the near_dup_clusters oracle at sf1 "
        "wrote >50 GB of hash-join temp). DuckDB temp storage is "
        "connection-lifetime — it persists across queries — so long sweeps "
        "over heavy oracles should also be chunked into fresh processes.",
    )
    args = ap.parse_args()

    # hash-defined operators must run the md5 'oracle' mode here — the
    # DuckDB oracles replay those hashes verbatim (functions/hashing.py)
    os.environ["SPARK_GRAFT_HASH_MODE"] = "oracle"

    import duckdb

    import __spark_entry__ as entry
    from datapipeline_spark.session import get_spark
    from datapipeline_spark.tables import TABLE_NAMES

    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    if args.duck_temp_cap:
        con.execute(f"SET max_temp_directory_size='{args.duck_temp_cap}'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    passed, failed, skipped = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir).toPandas()
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            skipped.append(name)
            print(f"skip  {name}: no oracle (rows-only: {len(sdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            failed.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue

        if sorted(sdf.columns) != sorted(ddf.columns):
            failed.append((name, f"columns {sorted(sdf.columns)} != {sorted(ddf.columns)}"))
            print(f"FAIL  {name}: columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
            continue
        if len(sdf) != len(ddf):
            failed.append((name, f"rowcount {len(sdf)} != {len(ddf)}"))
            print(f"FAIL  {name}: rowcount spark={len(sdf)} duck={len(ddf)}")
            continue
        sdt, ddt = _dtypes(sdf), _dtypes(ddf)
        if sdt != ddt:
            diff = {c: (sdt[c], ddt[c]) for c in sdt if sdt[c] != ddt[c]}
            failed.append((name, f"dtype drift {diff}"))
            print(f"FAIL  {name}: dtype drift (spark, duck) = {diff}")
            continue
        s_rows = _normalize(sdf, args.float_round)
        d_rows = _normalize(ddf, args.float_round)
        if s_rows != d_rows:
            mism = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
            failed.append((name, f"{mism}/{len(s_rows)} rows mismatch"))
            print(f"FAIL  {name}: {mism}/{len(s_rows)} rows differ")
            for a, b in zip(s_rows, d_rows):
                if a != b:
                    print(f"      spark: {a}\n      duck : {b}")
                    break
        else:
            passed.append(name)
            print(f"PASS  {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only "
        f"of {len(queries)} queries at {args.sf_dir}"
    )
    if args.json:
        import json

        fail_reasons = dict(failed)
        results = {}
        for name in queries:
            if only and name not in only:
                continue
            if name in skipped:
                results[name] = {"rows_only": True, "err": None}
            elif name in fail_reasons:
                results[name] = {"hash_match": False, "err": fail_reasons[name]}
            elif name in passed:
                results[name] = {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": None,
                }
        with open(args.json, "w") as fh:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "passed": len(passed),
                    "failed": len(failed),
                    "rows_only": len(skipped),
                    "total": len(results),
                    "queries": results,
                },
                fh,
                indent=1,
            )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
