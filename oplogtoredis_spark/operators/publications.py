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
from ..functions.messages import _OID_SCHEMA as OID_SCHEMA, message_json
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
    # Stage every expensive intermediate as a NAMED column referenced more
    # than once downstream: CollapseProject then keeps each projection
    # boundary and every variant-parse / sha256 tree is evaluated ONCE per
    # row. The previous inline form (classify_doc_id's Column tuple
    # substituted into _dl / msg / channel and a `where(_dl)` between the
    # projections) analyzed into a plan that re-evaluated the parse tree up
    # to ~6x per row AND let predicate pushdown sink the parse below the
    # parallelizing exchange into the narrow scan stage — measured 11.2 s
    # vs 2.9 s for 1M rows at local[32] (guide §4.4's duplication trap, JVM
    # expression flavor; CLAUDE.md's no-CSE-across-boundaries rule).
    s = df.withColumn("_v", F.try_parse_json(id_doc))
    s = s.withColumn("_idv", F.try_variant_get(F.col("_v"), "$._id", "variant"))
    s = s.withColumns(
        {
            "_sch": F.schema_of_variant(F.col("_idv")),
            "_oidh": F.try_variant_get(F.col("_idv"), '$["$oid"]', "string"),
            "_ids": F.try_variant_get(F.col("_v"), "$._id", "string"),
        }
    )
    # classify_doc_id's exact contract, over the staged columns
    id_is_oid = (F.col("_sch") == F.lit(OID_SCHEMA)) & F.col("_oidh").rlike(
        "^[0-9a-fA-F]{24}$"
    )
    s = s.withColumn("_is_oid", F.coalesce(id_is_oid, F.lit(False)))
    s = s.withColumn(
        "_id_str",
        F.coalesce(
            F.when(F.col("_sch") == F.lit("STRING"), F.col("_ids")),
            F.when(F.col("_is_oid"), F.col("_oidh")),
        ),
    )
    reason = F.when(F.col("_idv").isNull(), F.lit("missing_doc_id")).when(
        F.col("_id_str").isNull(), F.lit("unsupported_doc_id_type")
    )
    fields = changed_fields(F.col("op"), F.col("o"), deep=deep)
    base = s.withColumns(
        {
            "_dl": reason,
            "msg": message_json(
                F.col("op"), F.col("_id_str"), fields, F.col("_is_oid")
            ),
            "pkey": sha256_le_int64(db),
        }
    )
    dead = base.where(F.col("_dl").isNotNull()).select(
        *df.columns, F.col("_dl").alias("dl_reason")
    )
    # dead rows drop via an EMPTY channel array instead of a filter: a
    # `where` here would be pushed below the staged projections (predicate
    # pushdown substitutes the aliases), re-evaluating the parse per row in
    # the scan stage; explode of an empty array drops exactly the same rows
    # with no filter node in the plan.
    pubs = (
        base.withColumn("shard", assign_to_shard(F.col("pkey"), n_shards))
        .withColumn(
            "channel",
            F.explode(
                F.when(
                    F.col("_dl").isNull(),
                    channels(F.col("ns"), F.col("_id_str")),
                ).otherwise(F.array().cast("array<string>"))
            ),
        )
        .select(*df.columns, "channel", "msg", "pkey", "shard")
    )
    return pubs, dead
