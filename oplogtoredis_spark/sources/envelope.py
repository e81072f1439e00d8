"""S4 — envelope projection / decode (SURVEY.md §2).

The reference deliberately decodes ONLY the 6 top-level envelope fields from
raw BSON, never the full document (/root/reference/lib/oplog/tail.go:603-677
— an explicit perf decision). The Spark-native equivalent: when the log
arrives as raw JSON lines/strings, ``from_json`` with a fixed 6-field schema
projects exactly the envelope; Catalyst's nested-schema pruning keeps the
payload (o/o2) as unparsed JSON text for downstream operators, so the "never
fully deserialize" property holds — payload parsing happens lazily, per
operator, on the fields it needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

# ts arrives as {"t": seconds, "i": ordinal} (Mongo timestamp shape,
# lib/oplog/tail.go:38-45); o/o2 stay as raw JSON text (MapType would force
# a full parse — string keeps it opaque until an operator needs it)
RAW_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.StructType([
            T.StructField("t", T.LongType()),
            T.StructField("i", T.LongType()),
        ])),
        T.StructField("wall", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("ns", T.StringType()),
        T.StructField("o", T.StringType()),
        T.StructField("o2", T.StringType()),
    ]
)


def parse_raw_envelope(df: DataFrame, json_col: str = "raw") -> DataFrame:
    """raw JSON entries → the 6-field envelope with the encoded total-order
    timestamp. Unparseable rows surface with null op (dropped by F3) rather
    than failing the batch — the reference logs-and-skips the same way
    (tail.go:606-677 error paths)."""
    from ..timestamps import encode_ts_col

    env = F.from_json(F.col(json_col), RAW_ENVELOPE_SCHEMA)
    other = [c for c in df.columns if c != json_col]
    return df.select(
        *other,
        encode_ts_col(
            F.coalesce(env["ts"]["t"], F.lit(0)), F.coalesce(env["ts"]["i"], F.lit(0))
        ).alias("ts"),
        env["wall"].alias("wall"),
        env["op"].alias("op"),
        env["ns"].alias("ns"),
        env["o"].alias("o"),
        env["o2"].alias("o2"),
    )
