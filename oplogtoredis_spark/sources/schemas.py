"""Schemas: the change-event envelope and the lake target table.

The event envelope mirrors the reference's 6-field oplog envelope
(/root/reference/lib/oplog/tail.go:38-45) re-shaped for the source-code-repos
domain fixed by BASELINE.json input_hint: the document key is ``(repo, path)``
(analogue of (database, _id)), the payload is the after-image
``(commit, lang, content)`` plus an optional modifier ``diff`` JSON that drives
changed-field extraction (T4–T6 in SURVEY.md §2).

Design note (scale): events carry the full after-image for i/u — the standard
Debezium/CDC "after" record — so last-writer-wins is a pure, fully parallel
``max_by`` aggregate. Diff-only folding (sequential per key) exists as a
separate operator (operators/fold.py) but is off the hot path.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- change-event log (the oplog analogue) ---------------------------------
EVENT_SCHEMA = T.StructType(
    [
        # arrival order in the log; distinct from the total order (ts, tx_idx)
        T.StructField("seq", T.LongType(), False),
        # encoded Mongo timestamp T<<32|I (timestamps.py) — ordering + identity
        T.StructField("ts", T.LongType(), False),
        # position within a multi-op transaction (tie-break within one ts)
        T.StructField("tx_idx", T.IntegerType(), False),
        # server wall-clock — drives watermark / lag metric
        T.StructField("wall", T.TimestampType(), False),
        # i / u / d / c  (lib/oplog/oplogEntry.go:13-18)
        T.StructField("op", T.StringType(), False),
        # document key (database/_id analogue per input_hint)
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        # after-image payload (null for deletes)
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        # modifier-update document as JSON: v1 {"$v":1,"$set":{...},"$unset":{...}}
        # or v2 {"$v":2,"diff":{...}} — null for inserts/replacements/deletes
        T.StructField("diff", T.StringType(), True),
    ]
)

# Evolution phase adds (schema evolution test, SURVEY.md §7.1 M5):
EVENT_SCHEMA_EVOLVED = T.StructType(
    EVENT_SCHEMA.fields + [T.StructField("stars", T.LongType(), True)]
)

# --- lake target table (the Iceberg-analogue upsert target) -----------------
TARGET_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        # last applied total order — the MERGE predicate operands
        T.StructField("last_ts", T.LongType(), False),
        T.StructField("last_tx_idx", T.IntegerType(), False),
        # tombstone flag: deletes are retained (filtered out of the read view)
        # so that late-arriving older events can never resurrect a deleted row
        T.StructField("deleted", T.BooleanType(), False),
        # storage bucket = pmod(xxhash64(repo, path), n_buckets)
        T.StructField("bucket", T.IntegerType(), False),
    ]
)

TARGET_KEY = ("repo", "path")
