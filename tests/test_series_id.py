"""Series-id encode/decode roundtrip parity (reference domain/series_id.py).

The Spark encoder builds ids as column expressions; the decoder is a
driver-side utility. Property test: encode(partition values) must decode back
to the exact values for every supported type, including float-hex fidelity.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

from datapipeline_spark.dataset.series import (
    base_id,
    decode_series_id,
    encode_series_id_expr,
)


def _encode(spark, row: dict, schema: str) -> str:
    df = spark.createDataFrame([tuple(row.values())], schema)
    sid = encode_series_id_expr("base", df, list(row))
    return df.select(sid.alias("s")).first()["s"]


def test_plain_base_id(spark):
    df = spark.createDataFrame([(1,)], "x int")
    assert df.select(encode_series_id_expr("base", df, []).alias("s")).first()["s"] == "base"
    assert decode_series_id("base") == ("base", ())
    assert base_id("base") == "base"


def test_typed_components_roundtrip(spark):
    sid = _encode(
        spark,
        {"s": "north east", "i": 42, "f": 2.5, "b": True},
        "s string, i long, f double, b boolean",
    )
    assert sid == "base__@s:north%20east|@i:!i:42|@f:!f:0x1.4000000000000p+1|@b:!b:1"
    base, comps = decode_series_id(sid)
    assert base == "base"
    assert comps == (("s", "north east"), ("i", 42), ("f", 2.5), ("b", True))


def test_null_component(spark):
    sid = _encode(spark, {"v": None}, "v string")
    assert sid == "base__@v:!n"
    assert decode_series_id(sid)[1] == (("v", None),)


def test_invalid_ids_raise():
    with pytest.raises(ValueError):
        decode_series_id("base__")
    with pytest.raises(ValueError):
        decode_series_id("base__no_at_sign")
    with pytest.raises(ValueError):
        decode_series_id("base__@f:!z:1")


@settings(max_examples=25, deadline=None)
@given(
    s=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=12,
    ).filter(lambda x: "|" not in x or True),
    i=st.integers(min_value=-(2**62), max_value=2**62),
    f=st.floats(allow_nan=False, allow_infinity=False, width=64),
    b=st.booleans(),
)
def test_roundtrip_property(spark, s, i, f, b):
    sid = _encode(
        spark,
        {"s": s, "i": i, "f": f, "b": b},
        "s string, i long, f double, b boolean",
    )
    base, comps = decode_series_id(sid)
    assert base == "base"
    d = dict(comps)
    assert d["s"] == s and d["i"] == i and d["b"] == b
    assert d["f"] == f or (math.copysign(1, d["f"]) == math.copysign(1, f) and d["f"] == f)
