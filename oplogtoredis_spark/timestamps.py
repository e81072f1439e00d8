"""Oplog-timestamp total order: encode/decode ``T<<32 | I``.

Mirrors the reference's Redis checkpoint encoding
(/root/reference/lib/redispub/mongoTimestampEncoding.go:14-32): a Mongo
``primitive.Timestamp{T uint32 seconds, I uint32 ordinal}`` is persisted as the
decimal string of ``uint64(T)<<32 | uint64(I)``. That single int64 is BOTH the
ordering key and (together with tx_idx) the identity/idempotency key
(/root/reference/lib/redispub/publication.go:19-31).

We keep the encoded form everywhere (one comparable long survives shuffles and
MERGE predicates cheaply); these helpers exist for generators, tests and
human-readable lineage. Column-level equivalents are plain Spark expressions:

    encode:  (T.cast("long") << 32) | I           -> F.shiftleft + bitwiseOR
    decode:  ts >> 32, ts & 0xFFFFFFFF            -> F.shiftright / bitwiseAND
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MASK32 = 0xFFFFFFFF


def encode_ts(t_seconds: int, ordinal: int) -> int:
    """Python-side encode (generator / oracle / tests)."""
    if not (0 <= t_seconds <= _MASK32 and 0 <= ordinal <= _MASK32):
        raise ValueError(f"timestamp parts out of uint32 range: T={t_seconds} I={ordinal}")
    return (t_seconds << 32) | ordinal


def decode_ts(encoded: int) -> tuple[int, int]:
    """Python-side decode -> (T seconds, I ordinal)."""
    return (encoded >> 32) & _MASK32, encoded & _MASK32


def encode_ts_col(t_col: Column, i_col: Column) -> Column:
    """Column-level encode; stays inside whole-stage codegen."""
    return F.shiftleft(t_col.cast("long"), 32).bitwiseOR(i_col.cast("long"))


def ts_seconds_col(ts_col: Column) -> Column:
    return F.shiftright(ts_col.cast("long"), 32)


def ts_ordinal_col(ts_col: Column) -> Column:
    return ts_col.cast("long").bitwiseAND(F.lit(_MASK32))


def total_order_col(ts_col: Column, tx_idx_col: Column) -> Column:
    """The engine-wide total order: struct(ts, tx_idx).

    Struct comparison in Spark SQL is lexicographic, which matches the
    reference's tie-breaking contract: oplog timestamp first, then position
    within the transaction (/root/reference/lib/redispub/publisher.go:315-317).
    Used as the `max_by` ordinal in LWW dedup and in the MERGE predicate.
    """
    return F.struct(ts_col.alias("ts"), tx_idx_col.alias("tx_idx"))
