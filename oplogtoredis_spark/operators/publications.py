"""The end-to-end per-event publication pipeline — processOplogEntry parity.

Composes T2-T9 + the dead-letter contract into the reference's golden path
(/root/reference/lib/oplog/processor.go processOplogEntry): one raw oplog
entry → namespace split → typed doc-id extraction (updates read o2,
tail.go:702-707) → changed fields → the {"e","d","f"} wire message → the
two routing channels → sha256-LE parallelism key + shard. Unsupported doc
ids route to the dead-letter side (ErrUnsupportedDocIDType + counter,
processor.go:16,48-66) instead of producing a null message.

Everything is native Catalyst expressions (the only Python is the opt-in
deep v2 extraction), so the whole pipeline runs inside whole-stage codegen
in the scan stage — zero shuffles: at 10^10 events this is a pure map over
the log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.changed_fields import changed_fields
from ..functions.messages import classify_doc_id, message_json
from ..functions.routing import assign_to_shard, channels, sha256_le_int64, split_namespace


def derive_publications(
    df: DataFrame,
    n_shards: int = 8,
    deep: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """events (op, ns, o, o2 — o/o2 JSON strings, other columns carried) →
    ``(publications, dead)``.

    publications: one row per (event, channel) — the carried columns plus
    channel, msg, pkey, shard. dead: events whose doc id is unsupported or
    missing, with ``dl_reason`` (route to operators.deadletter.quarantine).
    """
    db, _coll = split_namespace(F.col("ns"))
    id_doc = F.when(F.col("op") == "u", F.col("o2")).otherwise(F.col("o"))
    id_str, id_is_oid, reason = classify_doc_id(id_doc)
    fields = changed_fields(F.col("op"), F.col("o"), deep=deep)
    base = df.withColumns(
        {
            "_id_str": id_str,
            "_dl": reason,
            "msg": message_json(F.col("op"), id_str, fields, id_is_oid),
            "pkey": sha256_le_int64(db),
        }
    )
    dead = base.where(F.col("_dl").isNotNull()).select(
        *df.columns, F.col("_dl").alias("dl_reason")
    )
    pubs = (
        base.where(F.col("_dl").isNull())
        .withColumn("shard", assign_to_shard(F.col("pkey"), n_shards))
        .withColumn("channel", F.explode(channels(F.col("ns"), F.col("_id_str"))))
        .select(*df.columns, "channel", "msg", "pkey", "shard")
    )
    return pubs, dead
