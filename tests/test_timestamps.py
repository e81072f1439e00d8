"""Timestamp encoding round-trip — mirrors the reference's
mongoTimestampEncoding tests (lib/redispub/mongoTimestampEncoding_test.go)."""

import pytest
from hypothesis import given, strategies as st

from oplogtoredis_spark.timestamps import decode_ts, encode_ts


def test_known_values():
    # uint64(T)<<32 | I per lib/redispub/mongoTimestampEncoding.go:14-16
    assert encode_ts(0, 0) == 0
    assert encode_ts(1, 0) == 1 << 32
    assert encode_ts(1, 1) == (1 << 32) + 1
    assert encode_ts(1234560000, 7) == (1234560000 << 32) | 7


@given(
    t=st.integers(min_value=0, max_value=2**32 - 1),
    i=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_roundtrip(t, i):
    assert decode_ts(encode_ts(t, i)) == (t, i)


def test_total_order_matches_lex_order():
    # (T, I) lexicographic == encoded numeric order
    pairs = [(0, 0), (0, 1), (1, 0), (1, 5), (2, 0)]
    encoded = [encode_ts(t, i) for t, i in pairs]
    assert encoded == sorted(encoded)


def test_out_of_range_rejected():
    with pytest.raises(ValueError):
        encode_ts(2**32, 0)


def test_column_encode_decode(spark):
    from pyspark.sql import functions as F

    from oplogtoredis_spark.timestamps import (
        encode_ts_col,
        ts_ordinal_col,
        ts_seconds_col,
    )

    df = spark.createDataFrame([(1700000000, 3)], "t long, i long")
    row = (
        df.select(encode_ts_col(F.col("t"), F.col("i")).alias("ts"))
        .select(
            "ts",
            ts_seconds_col(F.col("ts")).alias("t2"),
            ts_ordinal_col(F.col("ts")).alias("i2"),
        )
        .first()
    )
    assert row.ts == encode_ts(1700000000, 3)
    assert (row.t2, row.i2) == (1700000000, 3)
