"""Outgoing-message construction T7 (SURVEY.md §2).

Builds the redis-oplog wire format ``{"e": event, "d": {"_id": id}, "f":
[changed fields]}`` as a native ``to_json(struct(...))`` expression:

  * event rename d→r  — /root/reference/lib/oplog/processor.go:119-124
  * string _id passes through; ObjectID-style hex ids encode as
    ``{"$type":"oid","$value":hex}`` — processor.go:48-66
  * any other id type is an error (ErrUnsupportedDocIDType, processor.go:16)
    — surfaced here as a null message the caller can route to a dead-letter
    side output (Spark jobs must not throw per-row).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_OID_HEX_LEN = 24  # 12-byte ObjectID as hex


def event_name(op: Column) -> Column:
    """i→i, u→u, d→r (processor.go:119-124)."""
    return F.when(op == F.lit("d"), F.lit("r")).otherwise(op)


def message_json(
    op: Column,
    id_str: Column,
    fields: Column,
    id_is_oid: Column | None = None,
) -> Column:
    """The exact wire JSON. Field order e, d, f mirrors the Go struct order
    (processor.go:25-32) so golden messages compare byte-for-byte.

    ``id_is_oid`` marks ids that were BSON ObjectIDs; those serialize as the
    extended-JSON oid object instead of a bare string.
    """
    if id_is_oid is None:
        id_is_oid = F.lit(False)
    plain = F.to_json(
        F.struct(
            event_name(op).alias("e"),
            F.struct(id_str.alias("_id")).alias("d"),
            fields.alias("f"),
        )
    )
    oid = F.to_json(
        F.struct(
            event_name(op).alias("e"),
            F.struct(
                F.struct(
                    F.lit("oid").alias("$type"), id_str.alias("$value")
                ).alias("_id")
            ).alias("d"),
            fields.alias("f"),
        )
    )
    return F.when(id_str.isNull(), F.lit(None)).otherwise(
        F.when(id_is_oid, oid).otherwise(plain)
    )


_OID_SCHEMA = "OBJECT<`$oid`: STRING>"  # schema_of_variant of {"$oid": "..."}


def classify_doc_id(doc_json: Column) -> tuple[Column, Column, Column]:
    """Typed _id extraction with the reference's supported-type contract
    (ErrUnsupportedDocIDType, processor.go:16,48-66): string ids and 12-byte
    ObjectIDs (extended JSON ``{"$oid": hex24}``) are supported; any other
    type (number, bool, array, other object) is unprocessable and must go to
    the dead-letter side output, not vanish.

    Returns ``(id_str, id_is_oid, reason)`` — ``reason`` is null for
    supported ids, else 'missing_doc_id' / 'unsupported_doc_id_type'.
    Implementation is variant-typed (parse_json + schema_of_variant) so a
    JSON number 42 is distinguished from the string "42" — a plain
    get_json_object would conflate them.
    """
    v = F.try_parse_json(doc_json)
    idv = F.try_variant_get(v, "$._id", "variant")
    sch = F.schema_of_variant(idv)
    oid = F.try_variant_get(idv, '$["$oid"]', "string")
    id_is_oid = (sch == F.lit(_OID_SCHEMA)) & oid.rlike("^[0-9a-fA-F]{24}$")
    id_str = F.coalesce(
        F.when(sch == F.lit("STRING"), F.try_variant_get(v, "$._id", "string")),
        F.when(id_is_oid, oid),
    )
    reason = F.when(idv.isNull(), F.lit("missing_doc_id")).when(
        id_str.isNull(), F.lit("unsupported_doc_id_type")
    )
    return id_str, F.coalesce(id_is_oid, F.lit(False)), reason
