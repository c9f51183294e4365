#!/usr/bin/env python
"""Generate an sf1 rehearsal dataset (10x sf0.1) for the scale rehearsal
(tools/bench_sf1.py) WITHOUT touching the read-only driver testdata.

Method: 10 key-offset replicas of every sf0.1 table, written with real
row groups (the driver's single-row-group files cap scan parallelism at
one task — at sf1 we want the honest multi-split shape a real table has).
Foreign keys offset consistently (customer/orders/lineitem/part/supplier
agree per replica); region/nation stay fixed (genuinely small dims).
`documents` word-shuffles each replica deterministically (hash-keyed sort
per replica) so the text corpus grows in DISTINCT content — plain copies
would make every doc a 10-way exact/near dup and turn the dedup queries
into a measurement of degenerate-cluster handling instead of scale.
`embeddings` jitters two hash-chosen dims per replica for the same
reason. Replica 0 is sf0.1 verbatim.

Output: ./testdata_sf1/ (gitignored). ~15 s, ~170 MB.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1")
R = 10  # replicas

# key column -> offset step per replica (max key + 1 at sf0.1)
STEPS = {
    "o_orderkey": 150_000,
    "l_orderkey": 150_000,
    "o_custkey": 15_000,
    "c_custkey": 15_000,
    "l_partkey": 20_000,
    "p_partkey": 20_000,
    "l_suppkey": 1_000,
    "s_suppkey": 1_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}

ROW_GROUP = 122_880  # duckdb default; explicit so intent is visible


def _cols(con, table: str) -> list[str]:
    return [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchall()
    ]


# entity names derive from their key in the source data ("Customer#%09d");
# re-derive them from the OFFSET key, or every name appears 10x verbatim
# and any name-blocked operator (fuzzy match) measures degenerate-dup
# handling instead of scale
NAME_FROM_KEY = {
    "c_name": "'Customer#' || lpad((c_custkey + r.i * 15000)::VARCHAR, 9, '0')",
    "s_name": "'Supplier#' || lpad((s_suppkey + r.i * 1000)::VARCHAR, 9, '0')",
}


def replicate_sql(con, table: str) -> None:
    cols = _cols(con, table)
    sel = ", ".join(
        f"({c} + r.i * {STEPS[c]})::BIGINT AS {c}"
        if c in STEPS
        else (f"({NAME_FROM_KEY[c]}) AS {c}" if c in NAME_FROM_KEY else c)
        for c in cols
    )
    con.execute(
        f"""
        COPY (
          SELECT {sel}
          FROM read_parquet('{SRC}/{table}.parquet'), range({R}) r(i)
          ORDER BY r.i
        ) TO '{DST}/{table}.parquet' (FORMAT parquet, ROW_GROUP_SIZE {ROW_GROUP})
        """
    )


def copy_verbatim(con, table: str) -> None:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
        f"TO '{DST}/{table}.parquet' (FORMAT parquet)"
    )


def shuffle_words(text: str, replica: int) -> str:
    if replica == 0:
        return text
    words = text.split()
    keyed = sorted(
        (hashlib.md5(f"{replica}|{i}|{w}".encode()).hexdigest(), w)
        for i, w in enumerate(words)
    )
    return " ".join(w for _, w in keyed)


def make_documents() -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.read_parquet(f"{SRC}/documents.parquet")
    out = []
    for i in range(R):
        d = base.copy()
        d["doc_id"] = d["doc_id"] + i * STEPS["doc_id"]
        if i:
            d["text"] = [shuffle_words(t, i) for t in d["text"]]
        out.append(d)
    alld = pd.concat(out, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(alld, preserve_index=False),
        f"{DST}/documents.parquet",
        row_group_size=10_000,
    )


def make_embeddings() -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.read_parquet(f"{SRC}/embeddings.parquet")
    dim = len(base["embedding"].iloc[0])
    out = []
    for i in range(R):
        d = base.copy()
        d["vec_id"] = d["vec_id"] + i * STEPS["vec_id"]
        if i:
            # deterministic per-(replica, vec) jitter on two hash-chosen dims
            def jitter(row):
                v = np.array(row["embedding"], dtype=np.float32).copy()
                h = int(hashlib.md5(f"{i}|{row['vec_id']}".encode()).hexdigest()[:8], 16)
                v[h % dim] += ((h >> 8) % 1000 - 500) / 5000.0
                v[(h >> 4) % dim] -= ((h >> 12) % 1000 - 500) / 5000.0
                return v.tolist()

            d["embedding"] = d.apply(jitter, axis=1)
        out.append(d)
    alle = pd.concat(out, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(alle, preserve_index=False),
        f"{DST}/embeddings.parquet",
        row_group_size=2_000,
    )


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        copy_verbatim(con, t)
        print(f"{t}: verbatim")
    for t in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        replicate_sql(con, t)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    make_documents()
    make_embeddings()
    print("documents + embeddings done ->", DST)
    return 0


if __name__ == "__main__":
    sys.exit(main())
