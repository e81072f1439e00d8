"""Driver contract for the spark-graft builder (PySpark target).

One ``queries()`` entry per implemented operator from SURVEY.md §2 plus the
training-data operators (dedup / similarity / text analysis / multimodal),
each with a DuckDB ``oracle_sql()`` mirror with exact value parity (portable
sha256-based hashing, deterministic LCG hyperplanes, rounded doubles, integer
arithmetic — see oplogtoredis_spark/functions/hashing.py and
operators/similarity.py). EVERY registered query has an oracle — including
the LSH ANN and LSH dedup scale paths, whose bucket arithmetic is mirrored
bit-for-bit in SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

from oplogtoredis_spark.functions.hashing import (
    MERSENNE31,
    MINHASH_A,
    MINHASH_B,
    N_MINHASH,
)
from oplogtoredis_spark.functions.routing import assign_to_shard, sha256_le_int64

SF_DEFAULT = "/root/testdata/sf0.001"


def _ts_ms():
    """epoch millis of the NTZ event timestamp (session tz = UTC, so the
    cast interprets naive values as UTC — matching DuckDB's epoch_ms)."""
    return F.unix_millis(F.col("ts").cast("timestamp"))


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect)
# ---------------------------------------------------------------------------
_LE_HEX = "concat(" + ",".join(f"substr(h,{63 - 2 * i},2)" for i in range(8)) + ")"
_SQL_PKEY = (
    "(CASE WHEN u >= 9223372036854775808::UBIGINT THEN "
    "(u::HUGEINT - 18446744073709551616::HUGEINT) ELSE u::HUGEINT END)::BIGINT"
)
_H31 = "(('0x' || substr(sha256({x}),1,15))::BIGINT % 2147483647)"
_TOKS = "string_split_regex(trim({x}), '\\s+')"
_EN_STOP = "['the','a','of','and','to','in','is','it','for','on']"


def _ensure_shipped(spark: SparkSession) -> None:
    """The deep changed-fields pandas UDF pickles by module reference; ship
    the package zip to this session's Python workers once (idempotent) so
    the queries work under ANY SparkSession, not just ours."""
    if getattr(spark, "_otr_pkg_shipped", False):
        return
    from oplogtoredis_spark.session import _ship_package

    _ship_package(spark)
    spark._otr_pkg_shipped = True


def _par(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a small single-file input across all cores for CPU-heavy
    per-row derivations (a one-row-group parquet file is otherwise ONE scan
    task). At real scale inputs arrive in many splits and this is a no-op
    decision; the repartition cost here is a few MB."""
    return df.repartition(spark.sparkContext.defaultParallelism)


def _ev(spark: SparkSession, sf_dir: str, par: bool = False) -> DataFrame:
    _ensure_shipped(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return _par(spark, df) if par else df


def _docs(spark: SparkSession, sf_dir: str, par: bool = False) -> DataFrame:
    _ensure_shipped(spark)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return _par(spark, df) if par else df


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # always _par (guide §2.5/§6): embeddings.parquet is ONE row group at
    # bench scale, so without the repartition EVERY embedding family's
    # per-row vector math (bucket aggregates, centroid assignment, norms)
    # runs inside a single scan task — minPartitionNum cannot split inside
    # a row group. All consumers are CPU-heavy per row; the few-MB shuffle
    # is noise next to the serial pass it removes.
    _ensure_shipped(spark)
    return _par(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def _scratch_dir(prefix: str) -> str:
    """Scratch dir for query fixtures (lake tables, stream checkpoints,
    file sinks): prefer the fastest local storage. This sandbox's root disk
    is shared and slow (~75-100 MB/s effective); /dev/shm stands in for the
    local NVMe a real cluster would give scratch space (the same posture
    bench.py/session.py take for spark.local.dir). Parameterised via
    OTR_SCRATCH_DIR; falls back to the system tempdir."""
    import tempfile

    base = os.environ.get("OTR_SCRATCH_DIR")
    if base is None and os.path.isdir("/dev/shm"):
        base = "/dev/shm/otr_scratch"
    if base is None:
        return tempfile.mkdtemp(prefix=prefix)
    os.makedirs(base, exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def _dump_split_stream_dir(
    df: DataFrame,
    base: str,
    sub: str,
    order_col: str,
    extra_second: DataFrame | None = None,
) -> str:
    """Streaming-fixture dump, SPARK-NATIVE (guide §5; VERDICT r5 #3): two
    time-ordered parquet files under ``base/sub`` — earlier half of
    ``order_col`` in 00.parquet, the rest (plus ``extra_second``, e.g.
    redelivered duplicates) in 01.parquet, mtimes stamped so
    maxFilesPerTrigger=1 replays oldest-first. The split point is a
    quantile of ``order_col``; every consumer of these fixtures is
    split-point-invariant (watermarks exceed the data span; stateful folds
    sort per key per batch), so only the CROSS-batch time ordering matters,
    which the threshold split guarantees. Replaces the r5 driver-side
    ``toPandas`` dump that materialized every row on the driver (a 100×
    driver OOM; also ~seconds of serialize at sf1.0)."""
    import glob
    import shutil
    import time as _t

    m = df.approxQuantile(order_col, [0.5], 0.01)[0]
    d = f"{base}/{sub}"
    os.makedirs(d)
    halves = [df.where(F.col(order_col) <= m), df.where(F.col(order_col) > m)]
    if extra_second is not None:
        halves[1] = halves[1].unionByName(extra_second)
    for i, h in enumerate(halves):
        tmp = f"{base}/_tmp_{sub}_{i}"
        h.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        p = f"{d}/{i:02d}.parquet"
        os.replace(part, p)
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = _t.time() - 100 + i
        os.utime(p, (t0, t0))
    return d


import contextlib as _contextlib  # noqa: E402


@_contextlib.contextmanager
def _stream_state_parallelism(spark: SparkSession, width: int | None = None):
    """Scope shuffle partitions to the core count — or an explicit
    data-scaled ``width`` — for an availableNow stateful replay
    (set/restore — same discipline as SemanticCorpus's
    _epoch_shuffle_scale). A fresh stream checkpoint pins its state-store
    partition count from this conf: the session's batch-analytics reduce
    width (128) would schedule 128 state tasks per micro-batch per
    stateful operator, ~4× task-launch overhead for identical results
    (state operators are keyed per row; partition count never affects
    emitted rows). Each stream-stream-join state partition additionally
    carries ~4 state-store instances with a large FIXED load/commit cost
    per micro-batch (measured on the interval join at sf1.0: 8 parts
    3.7 s, 32 parts 10.7 s, 64 parts 20 s — near-linear in partition
    count), so stateful fixtures pass ``width`` derived from their feed
    size via :func:`_stateful_width`. Never a constant — core count and
    feed rows both scale it."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(
        key, str(width or spark.sparkContext.defaultParallelism)
    )
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _stateful_width(
    spark: SparkSession, *dump_dirs: str, target_rows: int = 64_000
) -> int:
    """Data-scaled state-partition count for a stateful availableNow
    replay: ceil(total feed rows / target_rows), clamped to [2, core
    count]. Row totals come from the parquet footers of the already-
    written stream fixture dirs — driver-side metadata, no Spark job."""
    import pyarrow.parquet as pq

    total = 0
    for d in dump_dirs:
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
    cores = spark.sparkContext.defaultParallelism
    return max(2, min(cores, -(-total // target_rows)))


# ---------------------------------------------------------------------------
# CDC pipeline operators over `events` (SURVEY.md §2 S/F/T/R/B/M rows)
# ---------------------------------------------------------------------------
def q_cdc_final_state(spark, sf_dir):
    """Flagship (B2 LWW + T9 + R1): events as a CDC stream keyed by user_id;
    op 'error'→delete, else upsert; final live state per key."""
    ev = _ev(spark, sf_dir, par=True).select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        _ts_ms().alias("ts_ms"),
    )
    win = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "event_type", "value", "ts_ms"),
            F.struct("ts_ms", "event_id"),
        ).alias("w"),
        F.count(F.lit(1)).alias("n_events"),
    )
    live = win.where(F.col("w.event_type") != "error")
    return live.select(
        "user_id",
        F.col("w.event_id").alias("last_event_id"),
        F.col("w.event_type").alias("last_type"),
        F.round(F.col("w.value"), 4).alias("last_value"),
        "n_events",
        sha256_le_int64(F.col("user_id").cast("string")).alias("pkey"),
    ).withColumn("shard", assign_to_shard(F.col("pkey"), 8))


SQL_CDC_FINAL_STATE = f"""
WITH e AS (SELECT user_id, event_id, event_type, value, epoch_ms(ts) ts_ms FROM events),
 ranked AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) rn,
                   count(*) OVER (PARTITION BY user_id) n_events FROM e),
 latest AS (SELECT user_id, event_id last_event_id, event_type last_type,
                   round(value, 4) last_value, n_events FROM ranked WHERE rn = 1),
 hashed AS (SELECT *, sha256(user_id::VARCHAR) h FROM latest),
 u AS (SELECT *, ('0x' || {_LE_HEX})::UBIGINT u FROM hashed),
 k AS (SELECT user_id, last_event_id, last_type, last_value, n_events, {_SQL_PKEY} pkey FROM u)
SELECT *, ((pkey % 8) + 8) % 8 AS shard FROM k WHERE last_type != 'error'
"""


def q_source_scan_pushdown(spark, sf_dir):
    """S1/S4: predicate + projection pushed into the parquet scan."""
    return (
        _ev(spark, sf_dir)
        .where((F.col("value") > 50.0) & (F.col("event_type") == "click"))
        .select("event_id", "user_id", F.round("value", 4).alias("value"))
    )


SQL_SOURCE_SCAN = """
SELECT event_id, user_id, round(value, 4) AS value
FROM events WHERE value > 50.0 AND event_type = 'click'
"""


def q_op_filter(spark, sf_dir):
    """F3: op-type allowlist."""
    return (
        _ev(spark, sf_dir)
        .where(F.col("event_type").isin("click", "view", "purchase"))
        .select("event_id", "event_type")
    )


SQL_OP_FILTER = """
SELECT event_id, event_type FROM events
WHERE event_type IN ('click','view','purchase')
"""


def q_denylist_filter(spark, sf_dir):
    """F1: denylist anti-filter (IN-list pushdown form)."""
    return (
        _ev(spark, sf_dir)
        .where(~F.col("user_id").isin(1, 2, 3))
        .select("event_id", "user_id")
    )


SQL_DENYLIST_FILTER = """
SELECT event_id, user_id FROM events WHERE user_id NOT IN (1,2,3)
"""


def q_system_filter(spark, sf_dir):
    """F2: system-namespace drop (prefix + exact-name predicates)."""
    return (
        _ev(spark, sf_dir)
        .where(~F.col("event_type").startswith("sys") & (F.col("user_id") != 0))
        .select("event_id", "event_type", "user_id")
    )


SQL_SYSTEM_FILTER = """
SELECT event_id, event_type, user_id FROM events
WHERE NOT starts_with(event_type, 'sys') AND user_id != 0
"""


def q_txn_flatten(spark, sf_dir):
    """T1: the REAL flatten_transactions operator (operators/transactions.py)
    over applyOps-style command rows constructed deterministically from
    events — event_id % 10: 0-6 plain op, 7-8 a 2-op transaction, 9 a
    depth-2 NESTED transaction (ref golden lib/oplog/tail_test.go:280-393).
    The oracle derives the expected flat stream analytically from the same
    arithmetic. (The previous registration was a contrived collect_list
    re-derivation that never exercised the operator and would OOM on a hot
    key at scale.)"""
    from oplogtoredis_spark.operators.transactions import flatten_transactions

    eid = F.col("event_id").cast("long")
    m = eid % 10
    x = eid * 10
    child = lambda op, ns, i: F.concat(  # noqa: E731
        F.lit('{"op":"' + op + '","ns":"' + ns + '","o":{"_id":'),
        i.cast("string"),
        F.lit("}}"),
    )
    txn2_o = F.concat(
        F.lit('{"applyOps":['),
        child("i", "app.events", x),
        F.lit(","),
        child("u", "app.events", x + 1),
        F.lit("]}"),
    )
    nested_o = F.concat(
        F.lit('{"applyOps":['),
        child("i", "app.events", x),
        F.lit(',{"op":"c","ns":"admin.$cmd","o":{"applyOps":['),
        child("i", "app.events", x + 1),
        F.lit(","),
        child("d", "app.events", x + 2),
        F.lit("]}}]}"),
    )
    raw = _ev(spark, sf_dir, par=True).select(
        eid.alias("seq"),
        eid.alias("ts"),
        F.lit(None).cast("timestamp").alias("wall"),
        F.when(m <= 6, F.lit("i")).otherwise(F.lit("c")).alias("op"),
        F.when(m <= 6, F.lit("app.events")).otherwise(F.lit("admin.$cmd")).alias("ns"),
        F.when(m <= 6, F.concat(F.lit('{"_id":'), eid.cast("string"), F.lit("}")))
        .when(m <= 8, txn2_o)
        .otherwise(nested_o)
        .alias("o"),
        F.lit(None).cast("string").alias("o2"),
    )
    # explicit bound (constructed data is depth-2): skips the data-driven
    # per-level probe jobs; the residual guard still fails loud if wrong
    flat = flatten_transactions(raw, max_depth=2)
    return flat.select(
        "ts",
        "tx_idx",
        "op",
        "ns",
        F.get_json_object("o", "$._id").cast("long").alias("doc_id"),
    )


SQL_TXN_FLATTEN = """
WITH e AS (SELECT event_id::BIGINT eid, event_id % 10 AS m FROM events),
 plain AS (SELECT eid AS ts, 0 AS tx_idx, 'i' AS op, 'app.events' AS ns, eid AS doc_id
           FROM e WHERE m <= 6),
 t2 AS (SELECT eid AS ts, k AS tx_idx, CASE WHEN k = 0 THEN 'i' ELSE 'u' END AS op,
               'app.events' AS ns, eid * 10 + k AS doc_id
        FROM (SELECT eid, unnest([0, 1]) AS k FROM e WHERE m IN (7, 8))),
 t3 AS (SELECT eid AS ts, k AS tx_idx, CASE WHEN k = 2 THEN 'd' ELSE 'i' END AS op,
               'app.events' AS ns, eid * 10 + k AS doc_id
        FROM (SELECT eid, unnest([0, 1, 2]) AS k FROM e WHERE m = 9))
SELECT * FROM plain UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3
"""


def q_envelope_decode(spark, sf_dir):
    """S4: raw JSON log lines → the 6-field envelope via parse_raw_envelope
    (sources/envelope.py) — fixed-schema from_json, payload kept opaque,
    encoded total-order ts = T<<32|I. Lines constructed deterministically
    from events; malformed lines (every 13th) surface with null op rather
    than failing the batch, mirroring tail.go:606-677's log-and-skip."""
    from oplogtoredis_spark.sources.envelope import parse_raw_envelope

    eid = F.col("event_id").cast("long")
    line = F.concat(
        F.lit('{"ts":{"t":'), eid.cast("string"),
        F.lit(',"i":'), (eid % 4).cast("string"),
        F.lit('},"op":"'),
        F.when(eid % 3 == 0, F.lit("i")).when(eid % 3 == 1, F.lit("u")).otherwise(F.lit("d")),
        F.lit('","ns":"app.'), F.col("event_type"),
        F.lit('","o":{"_id":'), eid.cast("string"), F.lit("}}"),
    )
    # par=True (guide §2.5/§6): events.parquet is ONE row group at bench
    # scale, so the 1M-row JSON construct+from_json parse otherwise runs as
    # a single scan task (measured 13.5 s at sf1.0; minPartitionNum cannot
    # split inside a row group)
    raw = _ev(spark, sf_dir, par=True).select(
        eid.alias("event_id"),
        F.when(eid % 13 == 0, F.lit("not json")).otherwise(line).alias("raw"),
    )
    env = parse_raw_envelope(raw)
    return env.select(
        "event_id", "ts", "op", "ns",
        F.get_json_object("o", "$._id").cast("long").alias("doc_id"),
    )


SQL_ENVELOPE_DECODE = """
SELECT event_id,
  CASE WHEN event_id % 13 = 0 THEN 0
       ELSE (event_id::BIGINT << 32) | (event_id % 4) END AS ts,
  CASE WHEN event_id % 13 = 0 THEN NULL
       WHEN event_id % 3 = 0 THEN 'i'
       WHEN event_id % 3 = 1 THEN 'u' ELSE 'd' END AS op,
  CASE WHEN event_id % 13 = 0 THEN NULL ELSE 'app.' || event_type END AS ns,
  CASE WHEN event_id % 13 = 0 THEN NULL ELSE event_id::BIGINT END AS doc_id
FROM events
"""


def q_namespace_split(spark, sf_dir):
    """T2: "db.coll" SplitN(2) semantics."""
    from oplogtoredis_spark.functions.routing import split_namespace

    d = _docs(spark, sf_dir).select(
        "doc_id", F.concat("source", F.lit("."), "lang").alias("ns")
    )
    db, coll = split_namespace(F.col("ns"))
    return d.select("doc_id", "ns", db.alias("db"), coll.alias("coll"))


SQL_NAMESPACE_SPLIT = """
SELECT doc_id, source || '.' || lang AS ns,
       split_part(source || '.' || lang, '.', 1) AS db,
       CASE WHEN strpos(source || '.' || lang, '.') > 0
            THEN substr(source || '.' || lang, strpos(source || '.' || lang, '.') + 1)
            ELSE '' END AS coll
FROM documents
"""


def q_doc_id_extract(spark, sf_dir):
    """T3: id from o2 for updates, from o otherwise (coalesce/when)."""
    ev = _ev(spark, sf_dir)
    doc_id = F.when(
        F.col("event_type") == "purchase", F.get_json_object("props", "$.k")
    ).otherwise(F.col("event_id").cast("string"))
    return ev.select("event_id", doc_id.alias("doc_key"))


SQL_DOC_ID_EXTRACT = """
SELECT event_id,
       CASE WHEN event_type = 'purchase' THEN json_extract_string(props, '$.k')
            ELSE event_id::VARCHAR END AS doc_key
FROM events
"""


def q_changed_fields_v1(spark, sf_dir):
    """T4: v1 modifier update field extraction (native map/JSON exprs)."""
    from oplogtoredis_spark.functions.changed_fields import changed_fields

    ev = _ev(spark, sf_dir, par=True).select(
        "event_id", F.concat(F.lit('{"$v":1,"$set":'), "props", F.lit("}")).alias("o")
    )
    return ev.select(
        "event_id",
        F.explode(changed_fields(F.lit("u"), F.col("o"))).alias("field"),
    )


SQL_CHANGED_FIELDS_V1 = """
SELECT event_id, unnest(json_keys(props)) AS field FROM events
"""


def q_changed_fields_v2_shallow(spark, sf_dir):
    """T5: v2 shallow — i/u/d subtree keys + s-field names."""
    from oplogtoredis_spark.functions.changed_fields import changed_fields

    ev = _ev(spark, sf_dir, par=True).select(
        "event_id",
        F.concat(
            F.lit('{"$v":2,"diff":{"u":'), "props", F.lit(',"sfoo":{"a":true}}}')
        ).alias("o"),
    )
    return ev.select(
        "event_id",
        F.explode(changed_fields(F.lit("u"), F.col("o"))).alias("field"),
    )


SQL_CHANGED_FIELDS_V2_SHALLOW = """
SELECT event_id, unnest(list_concat(json_keys(props), ['foo'])) AS field FROM events
"""


def q_changed_fields_v2_deep(spark, sf_dir):
    """T6: v2 deep dotted paths (Arrow-batched pandas UDF)."""
    from oplogtoredis_spark.functions.changed_fields import changed_fields

    ev = _ev(spark, sf_dir, par=True).select(
        "event_id",
        F.concat(F.lit('{"$v":2,"diff":{"smeta":{"u":'), "props", F.lit("}}}")).alias("o"),
    )
    return ev.select(
        "event_id",
        F.explode(changed_fields(F.lit("u"), F.col("o"), deep=True)).alias("field"),
    )


SQL_CHANGED_FIELDS_V2_DEEP = """
SELECT event_id, 'meta.' || unnest(json_keys(props)) AS field FROM events
"""


def q_message_json(spark, sf_dir):
    """T7: the {"e","d","f"} wire message with d→r rename."""
    from oplogtoredis_spark.functions.changed_fields import changed_fields
    from oplogtoredis_spark.functions.messages import message_json

    ev = _ev(spark, sf_dir, par=True).select(
        "event_id",
        F.when(F.col("event_type") == "error", "d").otherwise("i").alias("op"),
        F.col("props").alias("o"),
    )
    fields = changed_fields(F.col("op"), F.col("o"))
    return ev.select(
        "event_id",
        message_json(F.col("op"), F.col("event_id").cast("string"), fields).alias("msg"),
    )


SQL_MESSAGE_JSON = """
SELECT event_id,
  '{"e":"' || (CASE WHEN event_type='error' THEN 'r' ELSE 'i' END) ||
  '","d":{"_id":"' || event_id::VARCHAR || '"},"f":' ||
  (CASE WHEN event_type='error' THEN '[]'
        ELSE '["' || list_aggregate(json_keys(props), 'string_agg', '","') || '"]' END) ||
  '}' AS msg
FROM events
"""


def q_channels(spark, sf_dir):
    """T8/R2: collection-wide + doc-specific routing channels, exploded."""
    from oplogtoredis_spark.functions.routing import channels

    ev = _ev(spark, sf_dir).select(
        "event_id", F.concat(F.lit("app."), "event_type").alias("ns")
    )
    return ev.select(
        "event_id",
        F.explode(channels(F.col("ns"), F.col("event_id").cast("string"))).alias(
            "channel"
        ),
    )


SQL_CHANNELS = """
SELECT event_id, unnest(['app.' || event_type,
                         'app.' || event_type || '::' || event_id::VARCHAR]) AS channel
FROM events
"""


def q_publications(spark, sf_dir):
    """T2-T9 end-to-end (processOplogEntry golden path): raw entries →
    namespace split → typed doc-id (updates read o2) → changed fields →
    wire message → channel fan-out → sha256-LE pkey + shard, with
    unsupported doc ids (every 11th: numeric) excluded to the dead-letter
    side. Zero shuffles — the whole pipeline is one codegen'd map."""
    from oplogtoredis_spark.operators.publications import derive_publications

    eid = F.col("event_id").cast("long")
    sid = F.concat(F.lit('"e'), eid.cast("string"), F.lit('"'))
    oid = F.concat(
        F.lit('{"$oid":"'), F.lpad(F.lower(F.hex(eid)), 24, "0"), F.lit('"}')
    )
    idj = (
        F.when(eid % 11 == 0, eid.cast("string"))  # numeric → unsupported
        .when(eid % 7 == 0, oid)
        .otherwise(sid)
    )
    op = F.when(eid % 3 == 0, F.lit("i")).when(eid % 3 == 1, F.lit("u")).otherwise(F.lit("d"))
    o = (
        F.when(eid % 3 == 1, F.lit('{"$v":1,"$set":{"a":1,"c":3},"$unset":{"z":true}}'))
        .otherwise(F.concat(F.lit('{"_id":'), idj, F.lit(',"a":1,"b":2}')))
    )
    o2 = F.when(eid % 3 == 1, F.concat(F.lit('{"_id":'), idj, F.lit("}")))
    raw = _ev(spark, sf_dir, par=True).select(
        eid.alias("event_id"),
        op.alias("op"),
        F.concat(F.col("event_type"), F.lit(".docs")).alias("ns"),
        o.alias("o"),
        o2.alias("o2"),
    )
    pubs, _dead = derive_publications(raw, n_shards=8)
    return pubs.select("event_id", "channel", "msg", "pkey", "shard")


SQL_PUBLICATIONS = f"""
WITH e AS (SELECT event_id::BIGINT eid, event_type FROM events),
 cls AS (SELECT eid, event_type,
   CASE WHEN eid % 3 = 0 THEN 'i' WHEN eid % 3 = 1 THEN 'u' ELSE 'd' END AS op,
   event_type || '.docs' AS ns,
   CASE WHEN eid % 11 = 0 THEN NULL
        WHEN eid % 7 = 0 THEN lpad(lower(hex(eid)), 24, '0') END AS oid_hex,
   CASE WHEN eid % 11 = 0 THEN NULL
        WHEN eid % 7 = 0 THEN NULL ELSE 'e' || eid::VARCHAR END AS sid
   FROM e),
 ok AS (SELECT * FROM cls WHERE oid_hex IS NOT NULL OR sid IS NOT NULL),
 m AS (SELECT eid, op, ns,
   coalesce(sid, oid_hex) AS id_str,
   '{{"e":"' || (CASE WHEN op = 'd' THEN 'r' ELSE op END) || '","d":{{"_id":' ||
   (CASE WHEN sid IS NOT NULL THEN '"' || sid || '"'
         ELSE '{{"$type":"oid","$value":"' || oid_hex || '"}}' END) ||
   '}},"f":' ||
   (CASE WHEN op = 'i' THEN '["_id","a","b"]'
         WHEN op = 'u' THEN '["a","c","z"]' ELSE '[]' END) || '}}' AS msg,
   sha256(event_type) AS h
   FROM ok),
 k AS (SELECT eid, op, ns, id_str, msg, ('0x' || {_LE_HEX})::UBIGINT u FROM m),
 p AS (SELECT eid AS event_id, ns, id_str, msg, {_SQL_PKEY} AS pkey FROM k)
SELECT event_id, unnest([ns, ns || '::' || id_str]) AS channel, msg, pkey,
       ((pkey % 8) + 8) % 8 AS shard
FROM p
"""


def q_parallelism_key(spark, sf_dir):
    """T9 + R1: sha256-LE int64 ordering key + non-negative shard."""
    # par: 1M sha256 rows otherwise run inside the ONE scan task a
    # single-row-group file allows (measured 3.1 s -> sub-second; the same
    # §2.5 fix envelope_decode got in r6.1)
    ev = _ev(spark, sf_dir, par=True).select("event_id", "event_type")
    return ev.select(
        "event_id",
        sha256_le_int64(F.col("event_type")).alias("pkey"),
    ).withColumn("shard", assign_to_shard(F.col("pkey"), 8))


SQL_PARALLELISM_KEY = f"""
WITH x AS (SELECT event_id, sha256(event_type) h FROM events),
 y AS (SELECT event_id, ('0x' || {_LE_HEX})::UBIGINT u FROM x),
 k AS (SELECT event_id, {_SQL_PKEY} pkey FROM y)
SELECT event_id, pkey, ((pkey % 8) + 8) % 8 AS shard FROM k
"""


def q_dedup_exact(spark, sf_dir):
    """B2 (dedup half): at-most-once per identity (min event per key pair)."""
    return (
        _ev(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event_id"), F.count(F.lit(1)).alias("n"))
    )


SQL_DEDUP_EXACT = """
SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS n
FROM events GROUP BY user_id, event_type
"""


def q_lww_latest_per_user(spark, sf_dir):
    """B2 (ordered-apply half): last-writer-wins state per key via max_by."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.max_by(F.col("event_id"), F.struct(_ts_ms(), F.col("event_id"))).alias(
            "last_event_id"
        ),
        F.max_by(F.round("value", 4), F.struct(_ts_ms(), F.col("event_id"))).alias(
            "last_value"
        ),
    )


SQL_LWW_LATEST = """
SELECT user_id, event_id AS last_event_id, round(value,4) AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) = 1
"""


def q_metrics_counts(spark, sf_dir):
    """M1: per-label counters + value stats (observe()-style aggregates)."""
    return (
        _ev(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
    )


SQL_METRICS_COUNTS = """
SELECT event_type, count(*) AS n, round(avg(value),4) AS avg_value,
       round(max(value),4) AS max_value
FROM events GROUP BY event_type
"""


def q_metrics_histogram(spark, sf_dir):
    """M1 (histogram half): entry-size distribution with the reference's
    exponential buckets 8B -> 2GB (prometheus.ExponentialBuckets(8,2,29),
    lib/oplog/tail.go:71-137) over the event payload bytes — ONE chained-
    CASE bucket expression + one hash aggregate; the same expression rides
    the streaming merge's observe pass (lake.py) per micro-batch."""
    from oplogtoredis_spark.functions.histograms import exp_bucket_le

    ev = _ev(spark, sf_dir).select(F.octet_length("props").alias("sz"))
    return (
        ev.groupBy(exp_bucket_le(F.col("sz")).alias("bucket_le"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _sql_metrics_histogram() -> str:
    from oplogtoredis_spark.functions.histograms import exp_bucket_le_sql

    bucket = exp_bucket_le_sql("octet_length(encode(props))")
    return f"""
SELECT ({bucket}) AS bucket_le, count(*) AS n FROM events GROUP BY 1
"""


SQL_METRICS_HISTOGRAM = _sql_metrics_histogram()


def q_interval_max(spark, sf_dir):
    """M2: interval-max metric with the reference's completed-interval
    reporting discipline (interval_max_metric.go:18-315): per-minute maxima,
    withholding the final PARTIAL interval (reporting clock = the log's max
    ts). In streaming this discipline is a tumbling window in append mode
    (operators/interval_max.py docstring)."""
    from oplogtoredis_spark.operators.interval_max import interval_maxima

    ev = _ev(spark, sf_dir).select(_ts_ms().alias("ts_ms"), F.col("value"))
    per = interval_maxima(ev, F.col("ts_ms"), F.col("value"), 60_000)
    now = ev.agg(F.max("ts_ms").alias("now_ms"))
    return (
        per.join(F.broadcast(now))
        .where(F.col("interval_start_ms") + 60_000 <= F.col("now_ms"))
        .select(
            "interval_start_ms", F.round(F.col("max_value"), 4).alias("max_value")
        )
    )


SQL_INTERVAL_MAX = """
WITH e AS (SELECT epoch_ms(ts) AS ts_ms, value FROM events),
 per AS (SELECT (ts_ms // 60000) * 60000 AS interval_start_ms,
                round(max(value), 4) AS max_value
         FROM e GROUP BY 1),
 n AS (SELECT max(ts_ms) AS now_ms FROM e)
SELECT interval_start_ms, max_value FROM per, n
WHERE interval_start_ms + 60000 <= now_ms
"""


def q_asof_join_events(spark, sf_dir):
    """As-of (point-in-time) join — each click joined to the user's latest
    purchase at-or-before it (operators/asof.py): the canonical lookup over
    a per-key-ordered CDC feed (the ordering guarantee the reference's
    publisher exists to provide, lib/redispub/publisher.go). Spark has no
    ASOF join; the operator is the union + carry-forward formulation (ONE
    Exchange on the key, O(L+R) per key, no inequality join) — the oracle
    is DuckDB's NATIVE `ASOF LEFT JOIN`, with the right side deduped per
    (key, ts) to the greatest event_id exactly as the operator's tiebreak
    resolves it."""
    from oplogtoredis_spark.operators.asof import asof_join

    ev = _ev(spark, sf_dir, par=True)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", _ts_ms().alias("ts_ms")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        _ts_ms().alias("ts_ms"),
        F.round("value", 4).alias("value"),
    )
    return asof_join(
        clicks, purchases, on="user_id", right_tiebreak="event_id", prefix="p_"
    )


SQL_ASOF_JOIN = """
WITH e AS (SELECT user_id, event_id, event_type, round(value, 4) AS value,
                  epoch_ms(ts) AS ts_ms FROM events),
 l AS (SELECT user_id, event_id, ts_ms FROM e WHERE event_type = 'click'),
 r AS (SELECT user_id, event_id, ts_ms, value FROM e WHERE event_type = 'purchase'
       QUALIFY row_number() OVER (PARTITION BY user_id, ts_ms
                                  ORDER BY event_id DESC) = 1)
SELECT l.user_id, l.event_id, l.ts_ms,
       r.event_id AS p_event_id, r.ts_ms AS p_ts_ms, r.value AS p_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms
"""


def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization (operators/sessions.py): per-user sessions
    with a 30-minute inactivity gap via the NATIVE session_window aggregate
    (one Exchange, in-partition window merge — and the identical expression
    runs under Structured Streaming with a watermark,
    tests/test_sessions.py). Event times are truncated to epoch millis
    before windowing so the oracle's integer gap arithmetic is exact;
    value sums are e4 fixed-point (order-independent across engines)."""
    from oplogtoredis_spark.operators.sessions import sessionize

    ev = _ev(spark, sf_dir, par=True).withColumn(
        "ts_t", F.timestamp_millis(_ts_ms())
    )
    return sessionize(
        ev,
        ["user_id"],
        "ts_t",
        "30 minutes",
        aggs=[
            F.sum(F.round(F.col("value") * 10000, 0).cast("long")).alias(
                "sum_value_e4"
            )
        ],
    )


SQL_SESSIONS = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms,
                  CAST(round(value * 10000, 0) AS BIGINT) AS v4 FROM events),
 o AS (SELECT *, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) AS p FROM e),
 f AS (SELECT *, CASE WHEN p IS NULL OR ts_ms - p > 1800000 THEN 1 ELSE 0 END AS brk
       FROM o),
 s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
                                ROWS UNBOUNDED PRECEDING) AS sid FROM f)
SELECT user_id, min(ts_ms) AS session_start_ms, max(ts_ms) AS session_last_ms,
       count(*) AS n_events, CAST(sum(v4) AS BIGINT) AS sum_value_e4
FROM s GROUP BY user_id, sid
"""


def q_range_join_events(spark, sf_dir):
    """Range (interval-overlap) join — each click attributed to every
    purchase whose trailing 1-hour window contains it, per user
    (operators/rangejoin.py). Spark plans `BETWEEN` containment as a
    nested-loop join (all-pairs per key); the operator buckets the time
    axis (15-min buckets here, so each window explodes to <=5 bucket rows)
    and joins on EQUALITY (user_id, bucket) + exact post-filter — the plan
    is nested-loop-free (pinned in tests/test_rangejoin.py). Oracle is the
    plain theta join, exact at this scale."""
    from oplogtoredis_spark.operators.rangejoin import range_join

    ev = _ev(spark, sf_dir, par=True)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", _ts_ms().alias("ts_ms")
    )
    windows = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (_ts_ms() - F.lit(3_600_000)).alias("start_ms"),
        _ts_ms().alias("end_ms"),
    )
    return range_join(
        clicks,
        windows,
        on=["user_id"],
        bucket_ms=900_000,
        prefix="w_",
    )


SQL_RANGE_JOIN = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
 c AS (SELECT user_id, event_id, ts_ms FROM e WHERE event_type = 'click'),
 p AS (SELECT user_id, event_id AS w_purchase_id, ts_ms - 3600000 AS w_start_ms,
              ts_ms AS w_end_ms FROM e WHERE event_type = 'purchase')
SELECT c.user_id, c.event_id, c.ts_ms, p.w_purchase_id, p.w_start_ms, p.w_end_ms
FROM c JOIN p ON c.user_id = p.user_id
             AND c.ts_ms BETWEEN p.w_start_ms AND p.w_end_ms
"""


def q_scd2_user_history(spark, sf_dir):
    """SCD2 history derivation (operators/scd.py) — the warehouse-side
    complement of the as-of join: the events feed folded into per-user
    validity intervals over the tracked attribute (event_type), with
    'error' acting as the delete op (closes the open interval, emits no
    row; re-inserts after it always open a new version) and unchanged-
    attribute compression on (single Exchange + lag/lead windows, no
    self-join). Oracle mirrors with lag-based keep + lead close."""
    from oplogtoredis_spark.operators.scd import scd2_history

    ev = _ev(spark, sf_dir, par=True).select(
        "user_id",
        F.col("event_id").alias("seq"),
        _ts_ms().alias("ts_ms"),
        "event_type",
        F.when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
    )
    h = scd2_history(
        ev,
        keys="user_id",
        attrs=["event_type"],
        ts="ts_ms",
        tiebreak="seq",
        op="op",
    )
    return h.withColumn("is_current", F.col("is_current").cast("int"))


SQL_SCD2 = """
WITH e AS (SELECT user_id, event_id AS seq, epoch_ms(ts) AS ts_ms, event_type,
                  CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op
           FROM events),
 o AS (SELECT *, lag(op) OVER w AS p_op, lag(event_type) OVER w AS p_attr
       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, seq)),
 kept AS (SELECT * FROM o WHERE op = 'd' OR p_op IS NULL OR p_op = 'd'
                             OR p_attr IS DISTINCT FROM event_type),
 iv AS (SELECT *, lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, seq)
                  AS valid_to
        FROM kept)
SELECT user_id, event_type, ts_ms AS valid_from, valid_to,
       CAST(valid_to IS NULL AS INT) AS is_current
FROM iv WHERE op <> 'd'
"""


def q_scd2_stream_history(spark, sf_dir):
    """Streaming SCD2 maintenance (streaming/history.py): the events feed
    is replayed through the REAL history applier as TWO foreachBatch
    epochs (split per key at rank 2 — (ts, event_id)-ordered, so the
    cross-epoch per-key ordering contract holds by construction), with the
    lake as the open tail and the append-only log holding closed
    intervals; 'error' acts as the delete op. The oracle is the BATCH
    recompute — scd2 with compress=False is just lead-close over every
    change — which is exactly the invariant the incremental fold
    maintains."""
    import tempfile

    from pyspark.sql.window import Window

    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.history import (
        make_history_applier,
        read_history,
    )
    from oplogtoredis_spark.streaming.lake import LakeTable

    ev = _ev(spark, sf_dir, par=True)
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(_ts_ms(), "event_id")
    )
    env = ev.select(
        F.lit("users").alias("repo"),
        F.col("user_id").cast("string").alias("path"),
        _ts_ms().alias("ts"),
        F.col("event_id").cast("int").alias("tx_idx"),
        F.when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
        F.col("event_type").alias("commit"),
        F.lit("en").alias("lang"),
        F.round(F.col("value") * 10000, 0).cast("long").cast("string").alias(
            "content"
        ),
        rn.alias("rn"),
    )
    base = _scratch_dir(prefix="otr_hist_")
    # bucket count = core count (parameterised): at or above the epoch
    # width it lets the merge take the single-payload-shuffle branch
    # (lake.py one_shuffle) — and 1M rows over 8 buckets was an artificial
    # width cap anyway
    t = LakeTable.create(
        base + "/tbl", TARGET_SCHEMA,
        n_buckets=spark.sparkContext.defaultParallelism,
    )
    # dense fixture: the batch's user_id keys cover every bucket, so the
    # affected-bucket discovery pass prunes nothing (guide §2.4 — remove
    # the shuffle/job outright; same rationale as bench.py merge_prune)
    applier = make_history_applier(t.path, base + "/hist", prune=False)
    # the rank-2 split feeds both epochs from ONE windowed pass: without
    # the persist, each applier epoch re-runs the 1M-row ranking window
    # (scan + full shuffle) just to slice its half (guide §2.4). Epochs run
    # at data-scaled reduce width (the _epoch_shuffle_scale discipline —
    # ~50 MB per epoch across 128 reduce tasks was pure task-launch
    # overhead; scoped to the session's core count, never a constant).
    env = env.persist()
    try:
        with _stream_state_parallelism(spark):
            applier(env.where("rn <= 2").drop("rn"), 0)
            applier(env.where("rn > 2").drop("rn"), 1)
    finally:
        env.unpersist()
    out = read_history(spark, t.path, base + "/hist")
    return out.select(
        F.col("path").alias("user_id"),
        F.col("commit").alias("event_type"),
        F.col("content").cast("long").alias("value_e4"),
        "valid_from",
        "valid_to",
        F.col("is_current").cast("int").alias("is_current"),
    )


SQL_SCD2_STREAM = """
WITH e AS (SELECT CAST(user_id AS VARCHAR) AS user_id, event_id AS seq,
                  epoch_ms(ts) AS ts_ms, event_type,
                  CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
                  CAST(round(value * 10000, 0) AS BIGINT) AS v4
           FROM events),
 iv AS (SELECT *, lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, seq)
                  AS valid_to
        FROM e)
SELECT user_id, event_type, v4 AS value_e4, ts_ms AS valid_from, valid_to,
       CAST(valid_to IS NULL AS INT) AS is_current
FROM iv WHERE op <> 'd'
"""


def q_enrich_stream_events(spark, sf_dir):
    """Stream enrichment against the CDC lake (streaming/enrich.py): the
    lake is the materialized per-user latest-purchase state (built through
    TWO real merge_batch commits — even event_ids then odd, so LWW
    resolution across commits is exercised, not just a single write), and
    a click micro-batch is enriched through the REAL foreachBatch applier
    `make_enrich_applier` — per-epoch snapshot pinning, broadcast decision
    and all. s_version pins read-your-commits (the epoch sees v2, the
    state AFTER both commits); the value rides the lake's string content
    column as e4 fixed-point so cross-engine float formatting never
    appears. Oracle: latest purchase per user (ts, then event_id) left-
    joined to clicks."""
    import tempfile

    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.enrich import make_enrich_applier
    from oplogtoredis_spark.streaming.lake import LakeTable

    ev = _ev(spark, sf_dir, par=True)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").cast("int").alias("event_id"),
        _ts_ms().alias("ts_ms"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("v4"),
    )

    def env(df):
        return df.select(
            F.lit("users").alias("repo"),
            F.col("user_id").cast("string").alias("path"),
            F.col("ts_ms").alias("ts"),
            F.col("event_id").alias("tx_idx"),
            F.lit("u").alias("op"),
            F.lit("c").alias("commit"),
            F.lit("en").alias("lang"),
            F.col("v4").cast("string").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_enrich_") + "/tbl", TARGET_SCHEMA,
        n_buckets=spark.sparkContext.defaultParallelism,
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(env(purchases.where(F.col("event_id") % 2 == 0)), 0,
                      prune=False)
        t.merge_batch(env(purchases.where(F.col("event_id") % 2 == 1)), 1,
                      prune=False)

        clicks = ev.where(F.col("event_type") == "click").select(
            F.lit("users").alias("repo"),
            F.col("user_id").cast("string").alias("path"),
            "user_id",
            "event_id",
            _ts_ms().alias("ts_ms"),
        )
        out = {}
        applier = make_enrich_applier(
            t.path, lambda df, bid: out.__setitem__(bid, df), on=["repo", "path"]
        )
        applier(clicks, 0)
    return out[0].select(
        "user_id",
        "event_id",
        "ts_ms",
        F.col("s_content").cast("long").alias("s_value_e4"),
        F.col("s_version").cast("long").alias("s_version"),
    )


SQL_ENRICH_STREAM = """
WITH e AS (SELECT user_id, event_id, event_type,
                  CAST(round(value * 10000, 0) AS BIGINT) AS v4,
                  epoch_ms(ts) AS ts_ms FROM events),
 c AS (SELECT user_id, event_id, ts_ms FROM e WHERE event_type = 'click'),
 p AS (SELECT user_id, v4 FROM e WHERE event_type = 'purchase'
       QUALIFY row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_ms DESC, event_id DESC) = 1)
SELECT c.user_id, c.event_id, c.ts_ms, p.v4 AS s_value_e4,
       CAST(2 AS BIGINT) AS s_version
FROM c LEFT JOIN p ON c.user_id = p.user_id
"""


# ---------------------------------------------------------------------------
# training-data operators over `documents` / `embeddings`
# ---------------------------------------------------------------------------
def q_dedup_exact_docs(spark, sf_dir, par=True):
    from oplogtoredis_spark.operators.dedup import content_hash_dedup

    return content_hash_dedup(_docs(spark, sf_dir), "doc_id", "text")


SQL_DEDUP_EXACT_DOCS = """
SELECT sha256(text) AS content_sha256, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1
"""


def q_text_profile(spark, sf_dir):
    from oplogtoredis_spark.operators.text import text_profile

    return text_profile(_docs(spark, sf_dir, par=True).select("doc_id", "text"))


def q_hash_split(spark, sf_dir):
    """Deterministic disjoint train/eval/test assignment from the portable
    key hash (operators/sampling.py hash_split): membership is a pure
    function of doc_id, so corpus growth never migrates a document between
    splits (the train/eval-leakage guarantee). Map-only — no shuffle."""
    from oplogtoredis_spark.operators.sampling import hash_split

    return hash_split(
        _docs(spark, sf_dir, par=True), "doc_id"
    ).select("doc_id", "split")


def _sql_hash_split() -> str:
    from oplogtoredis_spark.operators.sampling import sample_hash_sql

    h = sample_hash_sql("doc_id", "")
    return f"""
SELECT doc_id,
  CASE WHEN h < 900000 THEN 'train'
       WHEN h < 950000 THEN 'eval'
       ELSE 'test' END AS split
FROM (SELECT doc_id, {h} AS h FROM documents)
"""


SQL_HASH_SPLIT = _sql_hash_split()


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum top-k in hash order (operators/sampling.py
    stratified_sample) — the reproducible reservoir analogue: at most k
    docs per (lang, source) stratum whatever the stratum skew; Spark's
    WindowGroupLimit bounds the shuffle to k rows per stratum per map
    task."""
    from oplogtoredis_spark.operators.sampling import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir, par=True), ("lang", "source"), k=2,
        key_col="doc_id",
    ).select("lang", "source", "doc_id", "rk")


def _sql_stratified_sample() -> str:
    from oplogtoredis_spark.operators.sampling import sample_hash_sql

    h = sample_hash_sql("doc_id", "")
    return f"""
SELECT lang, source, doc_id, rk FROM (
  SELECT lang, source, doc_id,
    row_number() OVER (PARTITION BY lang, source ORDER BY {h}, doc_id) AS rk
  FROM documents)
WHERE rk <= 2
"""


SQL_STRATIFIED_SAMPLE = _sql_stratified_sample()


def q_lm_perplexity(spark, sf_dir):
    """Corpus-trained character-trigram LM self-perplexity (operators/lm.py
    — the CCNet/KenLM quality-filter posture): integer n-gram counts (ONE
    partial-agg'd shuffle, alphabet-bounded result), add-1-smoothed
    per-gram costs e4-fixed BEFORE the per-doc sum (order-independent,
    engine-exact), the model side broadcast so documents never shuffle for
    scoring. High avg_nll = out-of-distribution text (garbage, boilerplate,
    wrong language)."""
    from oplogtoredis_spark.operators.lm import lm_perplexity

    return lm_perplexity(
        _docs(spark, sf_dir, par=True).select("doc_id", "text"), n=3, k=1.0
    )


def _sql_lm_perplexity(n: int = 3, k: float = 1.0) -> str:
    return f"""
WITH g AS (
  SELECT doc_id, substr(text, i, {n - 1}) AS ctx,
         substr(text, i + {n - 1}, 1) AS nxt
  FROM documents, unnest(range(1, length(text) - {n} + 2)) AS u(i)
  WHERE length(text) >= {n}
), cnt AS (
  SELECT ctx, nxt, COUNT(*)::BIGINT AS c FROM g GROUP BY ctx, nxt
), ctxt AS (
  SELECT ctx, CAST(SUM(c) AS BIGINT) AS ctx_c FROM cnt GROUP BY ctx
), voc AS (
  SELECT COUNT(DISTINCT nxt)::BIGINT AS v FROM cnt
), s AS (
  SELECT g.doc_id,
    CAST(floor(-ln((COALESCE(c.c, 0) + {float(k)!r})
                   / (COALESCE(t.ctx_c, 0) + {float(k)!r} * voc.v))
               * 10000.0 + 0.5) AS BIGINT) AS cost
  FROM g
  LEFT JOIN cnt c USING (ctx, nxt)
  LEFT JOIN ctxt t USING (ctx)
  CROSS JOIN voc
)
SELECT doc_id, n_grams, nll_e4,
       ROUND(nll_e4 / (n_grams * 10000.0), 4) AS avg_nll
FROM (
  SELECT doc_id, COUNT(*)::BIGINT AS n_grams,
         CAST(SUM(cost) AS BIGINT) AS nll_e4
  FROM s GROUP BY doc_id
)
"""


SQL_LM_PERPLEXITY = _sql_lm_perplexity()


#: target language mixture for the resampling query — 'es' deliberately
#: unlisted (dropped: no target share); masses are characters (n_chars)
_MIX_WEIGHTS = {"en": 0.5, "zh": 0.2, "de": 0.15, "fr": 0.15}


def q_mixture_resample(spark, sf_dir):
    """Resample the corpus to TARGET language proportions (operators/
    sampling.py mixture_resample) — the static-mixture reweighting step of
    an LLM data pipeline: per-domain rate = w_d · total_mass / mass_d, each
    doc emitted floor(rate)+Bernoulli(frac) times with the draw from the
    portable key hash, so the expected output char mass hits the target
    shares exactly and the sample is reproducible on any engine/cluster
    size. Plan: one partial-agg'd stats shuffle (dimension-sized result)
    broadcast back + a map-only explode — the corpus itself never
    shuffles."""
    from oplogtoredis_spark.operators.sampling import mixture_resample

    return mixture_resample(
        _docs(spark, sf_dir, par=True), "lang", _MIX_WEIGHTS,
        key_col="doc_id", size_col="n_chars",
    ).select("doc_id", "lang", "copy")


def _sql_mixture_resample() -> str:
    from oplogtoredis_spark.operators.sampling import resample_copies_sql

    doms = ", ".join(f"'{d}'" for d in _MIX_WEIGHTS)
    # the weight literals must be the SAME doubles Spark folds into its
    # plan (F.lit(float(scale*w))): render via repr, cast once
    case = (
        "CASE _dom "
        + " ".join(
            f"WHEN '{d}' THEN CAST({1.0 * w!r} AS DOUBLE)"
            for d, w in _MIX_WEIGHTS.items()
        )
        + " END"
    )
    copies = resample_copies_sql("r.rate", "d.doc_id", "")
    # integer masses end-to-end (order-independent sums); doubles only in
    # the single rate expression — mirrors mixture_resample exactly
    return f"""
WITH mass AS (
  SELECT lang AS _dom, CAST(SUM(n_chars) AS BIGINT) AS _m
  FROM documents WHERE lang IN ({doms}) GROUP BY lang
), tot AS (
  SELECT CAST(SUM(_m) AS BIGINT) AS _t FROM mass
), rates AS (
  SELECT _dom, ({case}) * CAST(_t AS DOUBLE) / CAST(_m AS DOUBLE) AS rate
  FROM mass CROSS JOIN tot
), c AS (
  SELECT d.doc_id, d.lang, {copies} AS copies
  FROM documents d JOIN rates r ON d.lang = r._dom
)
SELECT doc_id, lang, CAST(unnest(range(copies)) AS INT) AS copy
FROM c WHERE copies >= 1
"""


SQL_MIXTURE_RESAMPLE = _sql_mixture_resample()


def q_bpe_tokens(spark, sf_dir):
    """Deterministic subword BPE token counts (operators/text.py
    bpe_token_counts): a real fixed-merge-table BPE — words tokenized to
    characters and folded by 24 ranked merges — expressed entirely as
    string expressions (JVM-side in Spark; the DuckDB oracle runs the
    byte-identical replace chain). Training-faithful counts, unlike the
    regex-piece estimate text_profile also carries."""
    from oplogtoredis_spark.operators.text import bpe_token_counts

    return bpe_token_counts(_docs(spark, sf_dir, par=True))


def _sql_bpe_tokens() -> str:
    from oplogtoredis_spark.operators.text import bpe_count_expr

    cnt = bpe_count_expr("w", "duckdb")
    return f"""
SELECT doc_id,
  CAST(coalesce(list_sum(list_transform(
        regexp_extract_all(lower(text), '[a-z0-9]+'),
        w -> CAST({cnt} AS BIGINT))), 0) AS BIGINT) AS n_tokens_bpe
FROM documents
"""


SQL_BPE_TOKENS = _sql_bpe_tokens()


_BPE_TRAIN_MERGES = 8


def q_bpe_train_docs(spark, sf_dir):
    """BPE TRAINING over the corpus (operators/text.py train_bpe): LEARN
    the merge table instead of applying a fixed one — classic byte-pair
    training as ONE declarative plan: corpus collapses to a word histogram
    (the only corpus-wide shuffle; every round then touches vocabulary
    rows only, 10^6-10^8 at 100 TB not the corpus), each round
    pair-counts adjacent symbols (zip_with against the 1-shifted array),
    argmaxes with a (count DESC, lhs, rhs) tie-break, and applies the
    winner as one separator-guarded replace. Deterministic — integer
    counts, lexicographic ties — so the DuckDB oracle (the same 8 rounds
    unrolled as CTEs) and any two cluster sizes learn the identical
    table."""
    from oplogtoredis_spark.operators.text import train_bpe

    return train_bpe(
        _docs(spark, sf_dir, par=True).select("text"),
        n_merges=_BPE_TRAIN_MERGES,
    )


def _sql_bpe_train(n: int = _BPE_TRAIN_MERGES) -> str:
    """The identical training rounds unrolled as DuckDB CTEs: same word
    regex, same double-unit-separator encoding, same non-overlapping
    left-to-right replace, same tie-break."""
    parts = [
        """WITH hist AS (
  SELECT word, count(*)::BIGINT AS cnt
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents)
  GROUP BY word
), enc1 AS (
  SELECT chr(31) || chr(31) ||
         regexp_replace(word, '(.)', '\\1' || chr(31) || chr(31), 'g') AS enc,
         cnt
  FROM hist
)"""
    ]
    for i in range(1, n + 1):
        parts.append(f""", pairs{i} AS (
  SELECT syms[u.i] AS lhs, syms[u.i + 1] AS rhs, cnt
  FROM (SELECT cnt, list_filter(str_split(enc, chr(31) || chr(31)),
                                x -> x <> '') AS syms
        FROM enc{i}) s,
       unnest(generate_series(1, len(s.syms) - 1)) AS u(i)
), best{i} AS (
  SELECT {i} AS merge_rank, lhs, rhs, sum(cnt)::BIGINT AS pair_count
  FROM pairs{i} GROUP BY lhs, rhs
  ORDER BY pair_count DESC, lhs, rhs LIMIT 1
)""")
        if i < n:
            parts.append(f""", enc{i + 1} AS (
  SELECT replace(enc,
                 chr(31) || lhs || chr(31) || chr(31) || rhs || chr(31),
                 chr(31) || lhs || rhs || chr(31)) AS enc, cnt
  FROM enc{i}, best{i}
)""")
    parts.append(
        "\n"
        + "\nUNION ALL\n".join(f"SELECT * FROM best{i}" for i in range(1, n + 1))
    )
    return "".join(parts)


SQL_BPE_TRAIN = _sql_bpe_train()


SQL_TEXT_PROFILE = f"""
WITH t AS (SELECT doc_id, text, {_TOKS.format(x='text')} AS toks FROM documents),
 feat AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|\\d+|[^\\sA-Za-z\\d]')) AS n_subword_tokens,
    len(list_intersect(list_distinct({_TOKS.format(x='lower(text)')}), {_EN_STOP})) AS en_stopword_hits,
    round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) AS alpha_ratio,
    (list_sum(list_transform(toks, (w,i) -> ({_H31.format(x='w')} * i) % {MERSENNE31})) % {MERSENNE31})::BIGINT AS fingerprint
  FROM t)
SELECT doc_id, n_tokens, n_subword_tokens, en_stopword_hits,
  CASE WHEN en_stopword_hits >= 2 THEN 'en' ELSE 'unk' END AS lang_guess,
  alpha_ratio,
  round(0.4 * least(n_tokens / 200.0, 1.0) + 0.4 * alpha_ratio
        + 0.2 * least(en_stopword_hits / 5.0, 1.0), 4) AS quality,
  fingerprint
FROM feat
"""


def q_quality_filter(spark, sf_dir):
    """Composed corpus quality gate (operators/text.quality_filter): one
    verdict per document — 'kept' or the FIRST failing rule (too_short →
    low_alpha → low_quality → wrong_lang). The per-reason aggregability is
    the production corpus-filter report shape."""
    from oplogtoredis_spark.operators.text import quality_filter

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text")
    kept, rejected = quality_filter(
        docs, min_tokens=20, min_alpha_ratio=0.55, min_quality=0.5, langs=("en",)
    )
    return kept.select("doc_id", F.lit("kept").alias("verdict")).unionByName(
        rejected.select("doc_id", F.col("reject_reason").alias("verdict"))
    )


SQL_QUALITY_FILTER = f"""
WITH t AS (SELECT doc_id, text, {_TOKS.format(x='text')} AS toks FROM documents),
 feat AS (SELECT doc_id,
    len(toks) AS n_tokens,
    len(list_intersect(list_distinct({_TOKS.format(x='lower(text)')}), {_EN_STOP})) AS hits,
    round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) AS alpha
  FROM t),
 q AS (SELECT doc_id, n_tokens, hits, alpha,
    round(0.4 * least(n_tokens / 200.0, 1.0) + 0.4 * alpha
          + 0.2 * least(hits / 5.0, 1.0), 4) AS quality
  FROM feat)
SELECT doc_id,
  CASE WHEN n_tokens < 20 THEN 'too_short'
       WHEN alpha < 0.55 THEN 'low_alpha'
       WHEN quality < 0.5 THEN 'low_quality'
       WHEN (CASE WHEN hits >= 2 THEN 'en' ELSE 'unk' END) != 'en' THEN 'wrong_lang'
       ELSE 'kept' END AS verdict
FROM q
"""


def q_chunk_documents(spark, sf_dir):
    """Token-window chunking (40-token chunks, 8 overlap — sized so the
    fixture corpus actually fans out) — the standard training-data chunking
    step; map-side explode, no shuffle."""
    from oplogtoredis_spark.operators.text import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir, par=True).select("doc_id", "text"),
        chunk_tokens=40, overlap=8,
    )


SQL_CHUNK_DOCUMENTS = f"""
WITH t AS (SELECT doc_id, {_TOKS.format(x='text')} AS toks FROM documents),
 n AS (SELECT doc_id, toks, len(toks) AS n,
              greatest(CAST(ceil((len(toks) - 8) / 32.0) AS INT), 1) AS n_chunks
       FROM t),
 e AS (SELECT doc_id, toks, unnest(range(n_chunks))::INT AS chunk_idx FROM n),
 c AS (SELECT doc_id, chunk_idx,
              toks[chunk_idx * 32 + 1 : chunk_idx * 32 + 40] AS piece
       FROM e)
SELECT doc_id, chunk_idx, array_to_string(piece, ' ') AS chunk_text,
       len(piece) AS n_tokens
FROM c
"""


def q_span_dedup_docs(spark, sf_dir):
    """Cross-document repeated-SPAN removal (operators/spandedup.py — the
    C4 'discard repeated text' posture at word-span granularity): every
    repeated 3-word span keeps only its corpus-wide first occurrence
    (winner = smallest (doc_id, span_idx), a deterministic total order),
    documents reassemble from their surviving spans in order, and documents
    reduced to nothing drop entirely. Two well-keyed shuffles over
    span-level rows (span window + per-doc regroup), no join, no UDF; the
    value hash covers the REASSEMBLED text byte-for-byte."""
    from oplogtoredis_spark.operators.spandedup import span_dedup

    return span_dedup(
        _docs(spark, sf_dir, par=True).select("doc_id", "text"),
        span_words=3,
    )


SQL_SPAN_DEDUP = f"""
WITH t AS (SELECT doc_id, {_TOKS.format(x='text')} AS toks FROM documents),
 n AS (SELECT doc_id, toks, greatest(CAST(ceil(len(toks)/3.0) AS INT), 1) AS ns
       FROM t),
 e AS (SELECT doc_id, toks, unnest(range(ns))::INT AS span_idx FROM n),
 s AS (SELECT doc_id, span_idx,
              array_to_string(toks[span_idx*3+1 : span_idx*3+3], ' ') AS span
       FROM e),
 k AS (SELECT doc_id, span_idx, span,
              row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) = 1
                  AS keep
       FROM s)
SELECT doc_id,
       array_to_string(list(span ORDER BY span_idx) FILTER (WHERE keep), ' ')
           AS text,
       count(*)::BIGINT AS n_spans,
       (count(*) - count(*) FILTER (WHERE keep))::BIGINT AS n_spans_dropped
FROM k GROUP BY doc_id
HAVING count(*) FILTER (WHERE keep) > 0
"""


def q_pack_chunks_docs(spark, sf_dir):
    """Deterministic sequence packing (operators/packing.py): chunks are
    assigned to fixed token-budget training shards by the portable hash
    (greedy bin packing is a sequential fold — the one unparallelizable
    shape — so shards get the budget in EXPECTATION instead, stated not
    hidden), then positioned (pack_pos) and offset (token_offset) within
    their shard by a bounded per-shard window. One count job + one window
    shuffle; reproducible at any parallelism."""
    from oplogtoredis_spark.operators.packing import pack_chunks
    from oplogtoredis_spark.operators.text import chunk_documents

    chunks = chunk_documents(
        _docs(spark, sf_dir, par=True).select("doc_id", "text"),
        chunk_tokens=40, overlap=8,
    )
    return pack_chunks(chunks, budget=4000).select(
        "doc_id", "chunk_idx", "n_tokens", "shard_id", "pack_pos",
        "token_offset",
    )


SQL_PACK_CHUNKS = f"""
WITH c AS ({SQL_CHUNK_DOCUMENTS}),
 tot AS (SELECT greatest(1, CAST((sum(n_tokens) + 3999) // 4000 AS INT)) AS ns
         FROM c),
 h AS (SELECT doc_id, chunk_idx, n_tokens,
              ('0x' || substr(sha256(
                  concat_ws('|', doc_id::VARCHAR, chunk_idx::VARCHAR) || ''
              ), 1, 15))::BIGINT AS hv
       FROM c),
 s AS (SELECT doc_id, chunk_idx, n_tokens, hv, (hv % ns)::INT AS shard_id
       FROM h, tot)
SELECT doc_id, chunk_idx, n_tokens, shard_id,
       (row_number() OVER w - 1)::INT AS pack_pos,
       COALESCE(sum(n_tokens) OVER (
           PARTITION BY shard_id ORDER BY hv, doc_id, chunk_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS token_offset
FROM s
WINDOW w AS (PARTITION BY shard_id ORDER BY hv, doc_id, chunk_idx)
"""


def q_fuzzy_dedup_pipeline(spark, sf_dir):
    """The NEAR-duplicate end of the composed pipeline: exact n-gram
    Jaccard pairs → connected components (alternating star rounds) → keep
    only each cluster's canonical survivor (smallest doc id) → chunk →
    deterministic split. Complements corpus_pipeline (which dedups
    exactly): together they are the two dedup postures of a real corpus
    build, both value-oracled end-to-end (this one through the recursive
    transitive closure)."""
    from oplogtoredis_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )
    from oplogtoredis_spark.operators.sampling import hash_split
    from oplogtoredis_spark.operators.text import chunk_documents

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=2, threshold=0.9, max_shingle_freq=50
    )
    clusters = dedup_clusters(pairs, docs, id_col="doc_id")
    survivors = clusters.where(F.col("doc_id") == F.col("cluster_id"))
    deduped = docs.join(survivors.select("doc_id"), "doc_id")
    chunks = chunk_documents(deduped, chunk_tokens=40, overlap=8)
    return hash_split(chunks, "doc_id").select(
        "doc_id", "split", "chunk_idx", "n_tokens"
    )


def _sql_fuzzy_dedup_pipeline() -> str:
    from oplogtoredis_spark.operators.sampling import sample_hash_sql

    h = sample_hash_sql("doc_id", "")
    return f"""
WITH clusters AS ({{clusters}}),
 surv AS (SELECT doc_id FROM clusters WHERE doc_id = cluster_id),
 t AS (SELECT d.doc_id, {_TOKS.format(x='d.text')} AS toks
       FROM documents d JOIN surv USING (doc_id)),
 n AS (SELECT doc_id, toks,
              greatest(CAST(ceil((len(toks) - 8) / 32.0) AS INT), 1) AS n_chunks
       FROM t),
 e AS (SELECT doc_id, toks, unnest(range(n_chunks))::INT AS chunk_idx FROM n),
 c AS (SELECT doc_id, chunk_idx,
              toks[chunk_idx * 32 + 1 : chunk_idx * 32 + 40] AS piece
       FROM e)
SELECT doc_id,
  CASE WHEN {h} < 900000 THEN 'train'
       WHEN {h} < 950000 THEN 'eval'
       ELSE 'test' END AS split,
  chunk_idx, len(piece) AS n_tokens
FROM c
"""


def q_corpus_pipeline(spark, sf_dir):
    """The composed training-data golden path, end to end in ONE plan:
    quality gate (keep) → exact dedup (smallest-id survivor per content
    hash) → token-window chunking → deterministic train/eval/test split.
    Everything after the gate is a narrow projection or a single
    content-hash aggregate; the split needs NO join because membership is a
    pure function of doc_id (operators/sampling.py). This is the query a
    reference user actually runs nightly — the per-operator queries are its
    unit tests."""
    from pyspark.sql import functions as F

    from oplogtoredis_spark.operators.sampling import hash_split
    from oplogtoredis_spark.operators.text import chunk_documents, quality_filter

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text")
    kept, _rej = quality_filter(
        docs, min_tokens=20, min_alpha_ratio=0.55, min_quality=0.5, langs=("en",)
    )
    survivors = kept.groupBy(F.sha2(F.col("text"), 256).alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = kept.join(survivors.select("doc_id"), "doc_id")
    chunks = chunk_documents(deduped, chunk_tokens=40, overlap=8)
    return hash_split(chunks, "doc_id").select(
        "doc_id", "split", "chunk_idx", "n_tokens"
    )


def _sql_corpus_pipeline() -> str:
    from oplogtoredis_spark.operators.sampling import sample_hash_sql

    h = sample_hash_sql("doc_id", "")
    return f"""
WITH t AS (SELECT doc_id, text, {_TOKS.format(x='text')} AS toks FROM documents),
 feat AS (SELECT doc_id,
    len(toks) AS n_tokens,
    len(list_intersect(list_distinct({_TOKS.format(x='lower(text)')}), {_EN_STOP})) AS hits,
    round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) AS alpha
  FROM t),
 q AS (SELECT doc_id, n_tokens, hits, alpha,
    round(0.4 * least(n_tokens / 200.0, 1.0) + 0.4 * alpha
          + 0.2 * least(hits / 5.0, 1.0), 4) AS quality
  FROM feat),
 kept AS (SELECT t.doc_id, t.text, t.toks FROM t JOIN q USING (doc_id)
  WHERE n_tokens >= 20 AND alpha >= 0.55 AND quality >= 0.5 AND hits >= 2),
 surv AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY sha256(text)),
 dd AS (SELECT k.doc_id, k.toks FROM kept k JOIN surv USING (doc_id)),
 n AS (SELECT doc_id, toks,
              greatest(CAST(ceil((len(toks) - 8) / 32.0) AS INT), 1) AS n_chunks
       FROM dd),
 e AS (SELECT doc_id, toks, unnest(range(n_chunks))::INT AS chunk_idx FROM n),
 c AS (SELECT doc_id, chunk_idx,
              toks[chunk_idx * 32 + 1 : chunk_idx * 32 + 40] AS piece
       FROM e)
SELECT doc_id,
  CASE WHEN {h} < 900000 THEN 'train'
       WHEN {h} < 950000 THEN 'eval'
       ELSE 'test' END AS split,
  chunk_idx, len(piece) AS n_tokens
FROM c
"""


SQL_CORPUS_PIPELINE = _sql_corpus_pipeline()


def q_incremental_corpus_pipeline(spark, sf_dir):
    """The INCREMENTAL corpus build (VERDICT r4 #5,
    operators/incremental_corpus.py): the documents table is replayed as
    three insert epochs (doc_id mod 3 — later epochs carry smaller ids, so
    exact-dedup survivor seats genuinely flip mid-stream and the earlier
    survivor's chunks are retired); each epoch's work is bounded by its
    affected hash groups, state lives as LWW delta logs, and the final
    chunk state must equal the batch recompute — the oracle IS
    corpus_pipeline's full-recompute SQL, unchanged."""
    import tempfile

    from oplogtoredis_spark.operators.incremental_corpus import IncrementalCorpus

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text")
    state = IncrementalCorpus(
        _scratch_dir(prefix="otr_inc_corpus_"),
        min_tokens=20, min_alpha_ratio=0.55, min_quality=0.5, langs=("en",),
        chunk_tokens=40, overlap=8,
    )
    for e in range(3):
        batch = (
            docs.where(F.col("doc_id") % 3 == e)
            .select("doc_id", "text", F.lit("u").alias("op"))
        )
        state.apply_epoch(spark, batch, e)
    return state.chunks(spark).select("doc_id", "split", "chunk_idx", "n_tokens")


def q_lake_changes(spark, sf_dir):
    """LakeTable.changes(): the NET changelog scan between two snapshots
    (Delta CDF / Iceberg changelog analogue; the reference's downstream
    contract is the per-op Redis publication stream,
    lib/redispub/publisher.go:41-62 — this serves "what changed" from the
    table itself). The events table is replayed as two CDC epochs into a
    REAL lake (epoch 1 = even event_ids, epoch 2 = odd; 'error' events are
    deletes), and the output is the net diff of the two committed
    snapshots: insert / delete / update_preimage+postimage rows. The
    manifest diff prunes the comparison to buckets the second epoch
    touched. The oracle recomputes both snapshot states as window
    functions over the same split and classifies identically."""
    import tempfile

    from oplogtoredis_spark.streaming.lake import LakeTable
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA

    ev = _ev(spark, sf_dir, par=True).select(
        F.concat(F.lit("r"), (F.col("user_id") % 8).cast("string")).alias("repo"),
        F.col("user_id").cast("string").alias("path"),
        _ts_ms().alias("ts"),
        F.col("event_id").cast("int").alias("tx_idx"),
        F.when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
        F.col("event_id").cast("string").alias("commit"),
        F.lit("en").alias("lang"),
        F.col("event_type").alias("content"),
        F.col("event_id"),
    )
    t = LakeTable.create(
        _scratch_dir(prefix="otr_lake_changes_") + "/tbl",
        TARGET_SCHEMA,
        n_buckets=8,
    )
    env_cols = ["repo", "path", "ts", "tx_idx", "op", "commit", "lang", "content"]
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(ev.where(F.col("event_id") % 2 == 0).select(env_cols), 0,
                      prune=False)
        v1 = t.current_version()
        t.merge_batch(ev.where(F.col("event_id") % 2 == 1).select(env_cols), 1,
                      prune=False)
    return t.changes(spark, v1).select(
        "repo",
        "path",
        F.col("_change_type").alias("change_type"),
        "commit",
        "content",
        F.col("last_ts").alias("last_ts_ms"),
        F.col("last_tx_idx").cast("long").alias("last_tx"),
    )


SQL_LAKE_CHANGES = """
WITH e AS (SELECT 'r' || (user_id % 8)::VARCHAR AS repo, user_id::VARCHAR AS path,
    epoch_ms(ts) AS ts_ms, event_id,
    CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
    event_id::VARCHAR AS commit, event_type AS content,
    event_id % 2 AS ep FROM events),
 s1 AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
          ORDER BY ts_ms DESC, event_id DESC) rn FROM e WHERE ep = 0) WHERE rn = 1),
 s2 AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
          ORDER BY ts_ms DESC, event_id DESC) rn FROM e) WHERE rn = 1),
 j AS (SELECT coalesce(s1.repo, s2.repo) AS repo, coalesce(s1.path, s2.path) AS path,
        s1.op AS op1, s1.event_id AS id1, s1.commit AS c1, s1.content AS t1, s1.ts_ms AS m1,
        s2.op AS op2, s2.event_id AS id2, s2.commit AS c2, s2.content AS t2, s2.ts_ms AS m2
      FROM s1 FULL OUTER JOIN s2 ON s1.repo = s2.repo AND s1.path = s2.path),
 cls AS (SELECT *, (op1 IS NOT NULL AND op1 != 'd') AS live1,
                   (op2 IS NOT NULL AND op2 != 'd') AS live2 FROM j),
 typed AS (SELECT * FROM (SELECT *, CASE
        WHEN NOT live1 AND live2 THEN 'insert'
        WHEN live1 AND NOT live2 THEN 'delete'
        WHEN live1 AND live2 AND id1 != id2 THEN 'update' END AS ct FROM cls)
      WHERE ct IS NOT NULL)
SELECT repo, path,
       CASE WHEN ct = 'delete' THEN 'delete' ELSE 'update_preimage' END AS change_type,
       c1 AS commit, t1 AS content, m1 AS last_ts_ms, id1 AS last_tx
FROM typed WHERE ct != 'insert'
UNION ALL
SELECT repo, path,
       CASE WHEN ct = 'insert' THEN 'insert' ELSE 'update_postimage' END AS change_type,
       c2 AS commit, t2 AS content, m2 AS last_ts_ms, id2 AS last_tx
FROM typed WHERE ct != 'delete'
"""


def q_agg_view_lake(spark, sf_dir):
    """Retraction-maintained aggregate view over the CDC lake
    (operators/aggview.py IncrementalAggView): the materialized
    ``SELECT lang, count(*), sum(length(content)) GROUP BY lang`` follows
    the lake's net changelog across two commits — the second commit's
    update_preimage rows RETRACT the drafts' inflated lengths and the
    deletes retract the extra docs, so the final view equals the batch
    aggregate over the final live state (== the documents table) without
    ever rescanning the lake. Fold is union + ONE groupBy, no join."""
    import tempfile

    from oplogtoredis_spark.operators.aggview import IncrementalAggView
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text", "lang")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_aggv_") + "/tbl", TARGET_SCHEMA,
        n_buckets=spark.sparkContext.defaultParallelism,
    )
    view = IncrementalAggView(
        _scratch_dir(prefix="otr_aggv_v_"),
        group_cols=("lang",),
        value_expr="length(content)",
    )
    first = docs.where(F.col("doc_id") % 3 != 0)
    drafts = first.where(F.col("doc_id") % 5 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz draft pending zz"))
    )
    extras = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(
            env(first.where(F.col("doc_id") % 5 != 0).unionByName(drafts)
                .unionByName(extras), 1),
            0,
            prune=False,
        )
        view.follow_lake(spark, t)
        upserts = docs.where((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 5 == 0))
        t.merge_batch(env(upserts, 2).unionByName(env(extras, 2, op="d")), 1,
                      prune=False)
        view.follow_lake(spark, t)
    return view.summary(spark)


SQL_AGG_VIEW = """
SELECT lang, count(*) AS n_rows,
       CAST(sum(CAST(floor(length(text) * 10000.0 + 0.5) AS BIGINT))
            AS BIGINT) / 10000.0 AS value_sum
FROM documents GROUP BY lang
"""


def q_distinct_view_lake(spark, sf_dir):
    """Exact COUNT(DISTINCT) maintained incrementally over the lake
    (operators/aggview.py IncrementalDistinctView): per-(group, value)
    REFERENCE COUNTS — the textbook mechanism, because aggregate
    retraction alone cannot maintain DISTINCT (a leaving value may still
    be carried by another row; exercised here: the second commit retracts
    ONE of two rows sharing a length). Same two-commit draft/delete
    recipe as agg_view_lake; final state == documents, so the oracle is
    the plain batch COUNT(DISTINCT)."""
    import tempfile

    from oplogtoredis_spark.operators.aggview import IncrementalDistinctView
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text", "lang")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_dv_") + "/tbl", TARGET_SCHEMA,
        n_buckets=spark.sparkContext.defaultParallelism,
    )
    view = IncrementalDistinctView(
        _scratch_dir(prefix="otr_dv_v_"),
        group_cols=("lang",),
        distinct_expr="length(content)",
    )
    first = docs.where(F.col("doc_id") % 3 != 0)
    drafts = first.where(F.col("doc_id") % 5 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz draft pending zz"))
    )
    extras = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(
            env(first.where(F.col("doc_id") % 5 != 0).unionByName(drafts)
                .unionByName(extras), 1),
            0,
            prune=False,
        )
        view.follow_lake(spark, t)
        upserts = docs.where((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 5 == 0))
        t.merge_batch(env(upserts, 2).unionByName(env(extras, 2, op="d")), 1,
                      prune=False)
        view.follow_lake(spark, t)
    return view.read(spark)


SQL_DISTINCT_VIEW = """
SELECT lang, count(DISTINCT length(text)) AS n_distinct
FROM documents GROUP BY lang
"""


def q_lake_read_clustered(spark, sf_dir):
    """Clustered rewrite + footer-stats file skipping (streaming/lake.py
    rewrite_clustered / read_pruned — the Iceberg rewrite_data_files-with-
    sort-order + manifest-column-stats-pruning posture): the documents ride
    a lake as change envelopes (drafts updated, extras deleted, so the live
    set == the documents table), the table is re-clustered on ``lang``
    within its hash buckets, and the read prunes base FILES whose footer
    min/max can't intersect lang='en' — touching a fraction of the bytes
    while returning exactly ``read().where(lang = 'en')``. Sound because a
    base file holds at most one row per key (the LWW collapse wrote it) and
    delta-carrying buckets are read whole."""
    import tempfile

    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text", "lang")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_clus_") + "/tbl", TARGET_SCHEMA,
        n_buckets=spark.sparkContext.defaultParallelism,
    )
    first = docs.where(F.col("doc_id") % 3 != 0)
    drafts = first.where(F.col("doc_id") % 5 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz draft pending zz"))
    )
    extras = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(
            env(first.where(F.col("doc_id") % 5 != 0).unionByName(drafts)
                .unionByName(extras), 1),
            0,
            prune=False,
        )
        upserts = docs.where((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 5 == 0))
        t.merge_batch(env(upserts, 2).unionByName(env(extras, 2, op="d")), 1,
                      prune=False)
        t.rewrite_clustered(spark, ["lang"], files_per_bucket=4)
    return t.read_pruned(spark, "lang", "en", "en").select(
        "path",
        "lang",
        F.length("content").alias("content_len"),
    )


SQL_LAKE_READ_CLUSTERED = """
SELECT doc_id::VARCHAR AS path, lang, length(text) AS content_len
FROM documents WHERE lang = 'en'
"""


_POINT_LOOKUP_IDS = (11, 77, 123, 200, 301, 444)


def q_lake_point_lookup(spark, sf_dir):
    """File-level Bloom-index point lookups (streaming/lake.py
    rewrite_clustered(bloom_cols=...) / read_pruned(eq=...) — the
    parquet/Iceberg bloom-filter-index posture): the same lake recipe as
    lake_read_clustered, re-clustered on ``lang`` with a per-file Bloom
    bitmap on ``path``. A point lookup on path is exactly what min/max
    stats CANNOT prune on this layout (every file spans nearly the full
    path range — the sort order is lang), and what the bitmap prunes to
    ~one file per probe. Six lookups are unioned; each pruned read equals
    ``read().where(path = v)`` bit-for-bit (no false negatives; false
    positives only keep files; the exact predicate re-applies). The query
    fails loudly if the bloom never skipped a file — the mechanism, not
    just the values, is what it pins."""
    import tempfile

    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text", "lang")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_bloom_") + "/tbl", TARGET_SCHEMA,
        n_buckets=spark.sparkContext.defaultParallelism,
    )
    first = docs.where(F.col("doc_id") % 3 != 0)
    drafts = first.where(F.col("doc_id") % 5 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz draft pending zz"))
    )
    extras = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(
            env(first.where(F.col("doc_id") % 5 != 0).unionByName(drafts)
                .unionByName(extras), 1),
            0,
            prune=False,
        )
        upserts = docs.where((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 5 == 0))
        t.merge_batch(env(upserts, 2).unionByName(env(extras, 2, op="d")), 1,
                      prune=False)
        t.rewrite_clustered(
            spark, ["lang"], files_per_bucket=4, bloom_cols=["path"]
        )
        skipped = 0
        out = None
        for i in _POINT_LOOKUP_IDS:
            plan = t.prune_plan("path", eq=str(i), spark=spark)
            skipped += plan["files_skipped"]
            part = t.read_pruned(spark, "path", eq=str(i)).select(
                "path", "lang", F.length("content").alias("content_len")
            )
            out = part if out is None else out.unionByName(part)
        if skipped == 0:
            raise RuntimeError("bloom index never skipped a file")
    return out


SQL_LAKE_POINT_LOOKUP = f"""
SELECT doc_id::VARCHAR AS path, lang, length(text) AS content_len
FROM documents
WHERE doc_id IN ({", ".join(str(i) for i in _POINT_LOOKUP_IDS)})
"""


def q_rebucket_lake(spark, sf_dir):
    """Bucket-count EVOLUTION end-to-end (streaming/lake.py rebucket — the
    Iceberg partition-spec-evolution posture): a lake born at 4 buckets
    grows to 16 mid-stream, and the epochs AFTER the flip upsert keys
    written BEFORE it — the exact pattern a mixed-modulus bug turns into
    duplicate live keys, which the value-exact oracle would catch as a
    row-count/hash mismatch. Epoch 1 writes the % 3 != 0 docs plus extras;
    the table rebuckets 4 -> 16; epoch 2 (now hashing under the new
    modulus) inserts the % 3 == 0 docs, REPLACES the % 5 == 0 docs, and
    deletes the extras — final live set == documents exactly, each row
    carrying the commit of its last writer."""
    import tempfile

    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text", "lang")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_rebucket_") + "/tbl", TARGET_SCHEMA,
        n_buckets=4,
    )
    extras = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(
            env(docs.where(F.col("doc_id") % 3 != 0).unionByName(extras), 1), 0
        )
        st = t.rebucket(spark, 16)
        if not (st["rebucketed"] and st["from_n_buckets"] == 4 and st["n_buckets"] == 16):
            raise RuntimeError(f"rebucket did not flip the modulus: {st}")
        upserts = docs.where(
            (F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 5 == 0)
        )
        t.merge_batch(env(upserts, 2).unionByName(env(extras, 2, op="d")), 1,
                      prune=False)
    return t.read(spark).select(
        "path",
        "lang",
        F.col("commit").alias("last_commit"),
        F.length("content").alias("content_len"),
    )


SQL_REBUCKET_LAKE = """
SELECT doc_id::VARCHAR AS path, lang,
  CASE WHEN doc_id % 3 = 0 OR doc_id % 5 = 0 THEN 'c2' ELSE 'c1' END
    AS last_commit,
  length(text) AS content_len
FROM documents
"""


def q_schema_evolution_lake(spark, sf_dir):
    """Schema evolution through the lake (streaming/lake.py merge_schemas /
    conformed reads — the north rule's added-column case as an ORACLED
    query): commit 1 writes envelopes WITHOUT ``stars``; commit 2's
    envelopes carry the new column, evolving the table schema in the merge
    loop. The final read conforms every bucket to the current schema —
    rows last written by commit 1 surface ``stars`` as NULL, commit-2
    rows carry the value. Same draft/delete recipe as the other lake
    queries, so the live set == documents and the oracle derives stars
    from which commit last wrote each row."""
    import tempfile

    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text", "lang")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_evo_") + "/tbl", TARGET_SCHEMA,
        n_buckets=spark.sparkContext.defaultParallelism,
    )
    first = docs.where(F.col("doc_id") % 3 != 0)
    drafts = first.where(F.col("doc_id") % 5 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz draft pending zz"))
    )
    extras = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(
            env(first.where(F.col("doc_id") % 5 != 0).unionByName(drafts)
                .unionByName(extras), 1),
            0,
            prune=False,
        )
        upserts = docs.where((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 5 == 0))
        b2 = (
            env(upserts, 2)
            .withColumn("stars", (F.col("tx_idx") % 5).cast("long"))
            .unionByName(
                env(extras, 2, op="d").withColumn(
                    "stars", F.lit(None).cast("long")
                )
            )
        )
        t.merge_batch(b2, 1, extra_payload_cols=("stars",), prune=False)
    return t.read(spark).select("path", "lang", "stars")


SQL_SCHEMA_EVOLUTION = """
SELECT doc_id::VARCHAR AS path, lang,
       CASE WHEN doc_id % 3 = 0 OR doc_id % 5 = 0
            THEN CAST(doc_id % 5 AS BIGINT) END AS stars
FROM documents
"""


def q_lake_read_tagged(spark, sf_dir):
    """Snapshot TAGS + ROLLBACK through the lake (streaming/lake.py
    create_tag / rollback / tag-pinned expire_snapshots — Iceberg's
    create_tag + rollback_to_snapshot semantics): commit 1 loads the corpus
    (drafts carry a ' zz draft pending zz' suffix on doc_id%5, extra docs on
    doc_id%7 under doc_id+1000000) and is tagged ``pre_incident``; commit 2
    is an INCIDENT that deletes every even doc; ``rollback`` restores the
    tagged snapshot (state AND replay ledger — the changelog across the
    rollback is the inverse diff); commit 3 applies the real fix (clean
    drafts, drop extras); ``expire_snapshots`` then reclaims the incident's
    dirs while the tag pins commit 1's. The result unions the CURRENT state
    (== documents exactly) with the tag read (commit-1 state, readable
    after expiry), so one value hash verifies rollback correctness and
    ref-pinned time travel together."""
    import tempfile

    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text", "lang")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_tag_") + "/tbl", TARGET_SCHEMA,
        n_buckets=spark.sparkContext.defaultParallelism,
    )
    drafts = docs.where(F.col("doc_id") % 5 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz draft pending zz"))
    )
    extras = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(
            env(
                docs.where(F.col("doc_id") % 5 != 0)
                .unionByName(drafts)
                .unionByName(extras),
                1,
            ),
            0,
            prune=False,
        )
        t.create_tag("pre_incident")
        # the incident: a bad job tombstones every even doc
        t.merge_batch(env(docs.where(F.col("doc_id") % 2 == 0), 2, op="d"), 1,
                      prune=False)
        t.rollback(t.resolve_ref("pre_incident"))
        # the real fix, applied on the restored state
        t.merge_batch(
            env(docs.where(F.col("doc_id") % 5 == 0), 3).unionByName(
                env(extras, 3, op="d")
            ),
            2,
            prune=False,
        )
        t.expire_snapshots(keep_last=2)  # reclaims the incident; tag pins c1
        cols = lambda snap: [  # noqa: E731
            F.lit(snap).alias("snapshot"),
            F.col("path"),
            F.col("lang"),
            F.length("content").cast("long").alias("n_chars"),
        ]
    return t.read(spark).select(*cols("current")).unionByName(
        t.read(spark, tag="pre_incident").select(*cols("pre_incident"))
    )


SQL_LAKE_READ_TAGGED = """
SELECT 'current' AS snapshot, doc_id::VARCHAR AS path, lang,
       LENGTH(text)::BIGINT AS n_chars
FROM documents
UNION ALL
SELECT 'pre_incident', doc_id::VARCHAR, lang,
       (LENGTH(text) + CASE WHEN doc_id % 5 = 0 THEN 20 ELSE 0 END)::BIGINT
FROM documents
UNION ALL
SELECT 'pre_incident', (doc_id + 1000000)::VARCHAR, lang, LENGTH(text)::BIGINT
FROM documents WHERE doc_id % 7 = 0
"""


def q_wap_publish_lake(spark, sf_dir):
    """Write-audit-publish merges (streaming/wap.py — Iceberg's WAP staged
    commit composed from merge + expectation audit + tag publish +
    rollback): epoch 0 loads the even docs and publishes; epoch 1 carries a
    poisoned lang ('xx' on doc_id%5) — its audit fails, the merge ROLLS
    BACK, and the ``published`` tag never moves; epoch 2 re-sends the odd
    docs corrected under the SAME batch id (the rolled-back ledger makes
    that legal) and publishes. The result reads through the ``published``
    tag — the consumer boundary that never saw the bad snapshot — and
    equals the documents table exactly."""
    import tempfile

    from oplogtoredis_spark.operators.expectations import (
        accepted_values,
        not_null,
    )
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable
    from oplogtoredis_spark.streaming.wap import WriteAuditError, wap_merge

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text", "lang")
    checks = lambda: [  # noqa: E731 — Columns must be built per call
        not_null("content"),
        accepted_values("lang", ["de", "en", "es", "fr", "zh"]),
    ]

    def env(df, ts):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit("u").alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_wap_") + "/tbl", TARGET_SCHEMA,
        n_buckets=spark.sparkContext.defaultParallelism,
    )
    evens = docs.where(F.col("doc_id") % 2 == 0)
    odds = docs.where(F.col("doc_id") % 2 == 1)
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        wap_merge(t, spark, env(evens, 1), 0, checks(), prune=False)
        poisoned = odds.withColumn(
            "lang",
            F.when(F.col("doc_id") % 5 == 0, F.lit("xx")).otherwise(F.col("lang")),
        )
        try:
            wap_merge(t, spark, env(poisoned, 2), 1, checks(), prune=False)
            raise AssertionError("poisoned epoch must fail its audit")
        except WriteAuditError:
            pass  # rolled back; tag still at epoch 0's snapshot
        wap_merge(t, spark, env(odds, 2), 1, checks(), prune=False)
    return t.read(spark, tag="published").select(
        "path", "lang", F.length("content").cast("long").alias("n_chars")
    )


SQL_WAP_PUBLISH = """
SELECT doc_id::VARCHAR AS path, lang, LENGTH(text)::BIGINT AS n_chars
FROM documents
"""


def q_lake_fsck(spark, sf_dir):
    """Table integrity checker (streaming/lake.py fsck — Delta FSCK /
    Iceberg verify posture): metadata checks (missing/orphan dirs,
    O(manifest)) plus deep checks over one scan — bucket column vs key
    hash, file LOCATION vs bucket column (via _metadata.file_path — the
    corruption the column can't see), duplicate live keys on the collapsed
    reader view. A healthy two-commit lake reports six zeros; the
    corruption-detection arms are pinned in tests/test_fsck.py (duplicated
    file, smuggled cross-bucket file, doctored bucket column, missing
    dirs, orphan dirs)."""
    import tempfile

    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text", "lang")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_fsck_") + "/tbl", TARGET_SCHEMA,
        n_buckets=spark.sparkContext.defaultParallelism,
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(env(docs.where(F.col("doc_id") % 2 == 0), 1), 0,
                      prune=False)
        t.merge_batch(
            env(docs.where(F.col("doc_id") % 2 == 1), 2).unionByName(
                env(docs.where(F.col("doc_id") % 10 == 0), 2, op="d")
            ),
            1,
            prune=False,
        )
    return t.fsck(spark)


SQL_LAKE_FSCK = """
SELECT * FROM (VALUES
    ('fsck:missing_base_dir',   0::BIGINT),
    ('fsck:missing_delta_dir',  0::BIGINT),
    ('fsck:orphan_data_dirs',   0::BIGINT),
    ('fsck:missing_index_sidecar', 0::BIGINT),
    ('fsck:bucket_assignment',  0::BIGINT),
    ('fsck:misplaced_file_row', 0::BIGINT),
    ('fsck:duplicate_live_key', 0::BIGINT)
) AS t("check", n_violations)
"""


def q_index_view_lake(spark, sf_dir):
    """Retraction-maintained INVERTED INDEX over the CDC lake
    (operators/indexview.py IncrementalIndexView): the postings follow the
    lake's net changelog across two commits — the second commit's
    update_preimage rows DE-INDEX the drafts' extra tokens ('zz', 'draft',
    'pending') and the deletes de-index the extra docs, so the final index
    equals the batch inverted index over the final live state (== the
    documents table) without ever re-tokenizing the lake. Fold is union +
    ONE groupBy, no join; tokenization is byte-identical to
    operators/retrieval.py, so the oracle is SQL_INVERTED_INDEX unchanged."""
    import tempfile

    from oplogtoredis_spark.operators.indexview import IncrementalIndexView
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text", "lang")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_idxv_") + "/tbl", TARGET_SCHEMA, n_buckets=8
    )
    view = IncrementalIndexView(_scratch_dir(prefix="otr_idxv_v_"))
    first = docs.where(F.col("doc_id") % 3 != 0)
    drafts = first.where(F.col("doc_id") % 5 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz draft pending zz"))
    )
    extras = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(
            env(first.where(F.col("doc_id") % 5 != 0).unionByName(drafts)
                .unionByName(extras), 1),
            0,
            prune=False,
        )
        view.follow_lake(spark, t)
        upserts = docs.where((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 5 == 0))
        t.merge_batch(env(upserts, 2).unionByName(env(extras, 2, op="d")), 1,
                      prune=False)
        view.follow_lake(spark, t)
    return view.stats(spark)


def q_follow_lake_corpus(spark, sf_dir):
    """The full CDC-lake → training-corpus composition
    (IncrementalCorpus.follow_lake + LakeTable.changes): documents ride a
    REAL lake as change envelopes across two commits — epoch 1 inserts
    two-thirds of the corpus (with every 5th doc as a DRAFT text that will
    be updated) plus extra docs that will be deleted; epoch 2 inserts the
    remaining third, overwrites the drafts with their final text, and
    deletes the extras. The corpus follows each snapshot via the net
    changelog (insert/update_postimage → upsert, delete → delete), so the
    second follow's work is bounded by the changed documents — no rescan of
    either side. Final live set == the documents table exactly, so the
    oracle is corpus_pipeline's full-recompute SQL, UNCHANGED: convergence
    through real lake commits is the assertion."""
    import tempfile

    from oplogtoredis_spark.operators.incremental_corpus import IncrementalCorpus
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "text")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("docs").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            F.col("doc_id").cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.lit("en").alias("lang"),
            F.col("text").alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_follow_") + "/tbl", TARGET_SCHEMA, n_buckets=8
    )
    corpus = IncrementalCorpus(
        _scratch_dir(prefix="otr_follow_c_"),
        min_tokens=20, min_alpha_ratio=0.55, min_quality=0.5, langs=("en",),
        chunk_tokens=40, overlap=8,
    )
    first = docs.where(F.col("doc_id") % 3 != 0)
    drafts = first.where(F.col("doc_id") % 5 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz draft pending zz"))
    )
    extras = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(
            env(first.where(F.col("doc_id") % 5 != 0).unionByName(drafts)
                .unionByName(extras), 1),
            0,
            prune=False,
        )
        corpus.follow_lake(spark, t, repo="docs")
        upserts = docs.where((F.col("doc_id") % 3 == 0) | (F.col("doc_id") % 5 == 0))
        t.merge_batch(env(upserts, 2).unionByName(env(extras, 2, op="d")), 1,
                      prune=False)
        corpus.follow_lake(spark, t, repo="docs")
    return corpus.chunks(spark).select("doc_id", "split", "chunk_idx", "n_tokens")


# ---------------------------------------------------------------------------
# corpus hygiene: decontamination, repetition, PII; event analytics
# ---------------------------------------------------------------------------
def q_decontaminate_ngram(spark, sf_dir):
    """Benchmark decontamination (operators/decontam.py): every training
    document flagged/counted for word-n-gram overlap with the benchmark
    side (here the deterministic doc_id % 37 == 0 subset standing in for
    an eval set — no external data). n=4 instead of the GPT-3 default 13
    because the synthetic corpus draws from a ~30-word vocabulary; the
    semantics are n-invariant. Plan: map-side gram explode + broadcast
    left join (eval grams are tiny at any corpus scale) + ONE partial-
    agg'd groupBy(doc_id)."""
    from oplogtoredis_spark.operators.decontam import decontaminate

    docs = _docs(spark, sf_dir, par=True)
    return decontaminate(
        docs.where(F.col("doc_id") % 37 != 0),
        docs.where(F.col("doc_id") % 37 == 0),
        n=4,
    )


SQL_DECONTAMINATE = r"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
              FROM documents),
grams AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + 3), ' ') AS gram
  FROM toks,
       UNNEST(CASE WHEN len(t) >= 4 THEN range(1, len(t) - 4 + 2)
              ELSE [] END) AS u(i)
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 37 = 0),
hits AS (
  SELECT g.doc_id, count(DISTINCT b.gram) AS n
  FROM grams g JOIN bench b USING (gram)
  WHERE g.doc_id % 37 <> 0 GROUP BY 1
)
SELECT d.doc_id, coalesce(h.n, 0) AS n_hit_ngrams,
       coalesce(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 37 <> 0
"""


def q_doc_repetition(spark, sf_dir):
    """Gopher-style repetition/boilerplate signals (operators/text.py
    repetition_signals): dup-token ratio map-only; top-bigram share via
    two partial-agg'd doc-keyed aggregations."""
    from oplogtoredis_spark.operators.text import repetition_signals

    return repetition_signals(_docs(spark, sf_dir, par=True))


SQL_DOC_REPETITION = r"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
              FROM documents),
base AS (SELECT doc_id, len(t) AS n_tokens,
                round(1 - len(list_distinct(t)) / len(t), 4)
                  AS dup_token_ratio, t
         FROM toks),
bg AS (SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS bigram
       FROM base,
            UNNEST(CASE WHEN n_tokens >= 2 THEN range(1, n_tokens)
                   ELSE [] END) AS u(i)),
cnts AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2),
top AS (SELECT doc_id, max(cnt) AS top_bigram_count,
               CAST(sum(cnt) AS BIGINT) AS bigram_total
        FROM cnts GROUP BY 1)
SELECT b.doc_id, b.n_tokens, b.dup_token_ratio,
       coalesce(t.top_bigram_count, 0) AS top_bigram_count,
       coalesce(t.bigram_total, 0) AS bigram_total,
       round(coalesce(t.top_bigram_count / t.bigram_total, 0.0), 4)
         AS top_bigram_frac
FROM base b LEFT JOIN top t USING (doc_id)
"""


def _pii_line():
    """Deterministic PII-bearing text built ONLY from table columns (the
    corpus itself carries no PII, so the redaction query would otherwise be
    vacuous): 40 chars of real text + a synthetic contact line. The DuckDB
    oracle builds the byte-identical string."""
    did = F.col("doc_id")
    return F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example."),
        F.when(did % 2 == 0, F.lit("com")).otherwise(F.lit("org")),
        F.lit(" tel 415-555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."),
        (did % 200).cast("string"),
        F.lit(".0."),
        (did % 250 + 1).cast("string"),
    )


def q_pii_redact(spark, sf_dir):
    """PII scrubbing (operators/pii.py): staged email→IPv4→phone regex
    redaction with per-rule counters, all JVM-side regexp expressions —
    map-only, runs inside the scan stage at any corpus size."""
    from oplogtoredis_spark.operators.pii import redact_pii

    src = _docs(spark, sf_dir, par=True).select(
        "doc_id", _pii_line().alias("text")
    )
    return redact_pii(src)


def _sql_pii_redact() -> str:
    from oplogtoredis_spark.operators.pii import pii_rules_sql

    redacted, counters = pii_rules_sql("t")
    cols = ",\n       ".join(counters)
    return f"""
WITH src AS (
  SELECT doc_id,
         substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@example.' || CASE WHEN doc_id % 2 = 0 THEN 'com'
                                  ELSE 'org' END
           || ' tel 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           || ' ip 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.'
           || CAST(doc_id % 250 + 1 AS VARCHAR) AS t
  FROM documents)
SELECT doc_id, redacted, n_email, n_ipv4, n_phone,
       n_email + n_ipv4 + n_phone AS n_pii
FROM (SELECT doc_id, {redacted} AS redacted,
       {cols}
      FROM src)
"""


SQL_PII_REDACT = _sql_pii_redact()


def q_funnel_stages(spark, sf_dir):
    """Ordered funnel signup→click→purchase (operators/analytics.py): per
    user, stage k's timestamp = min event time of stage k's type at-or-
    after stage k-1's resolved time. ONE Exchange (collect per user +
    higher-order array mins) — the naive form is one self-join per stage;
    the oracle IS that naive nested-min form."""
    from oplogtoredis_spark.operators.analytics import funnel

    return funnel(_ev(spark, sf_dir, par=True), ("signup", "click", "purchase"))


SQL_FUNNEL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (SELECT user_id, min(epoch_ms(ts)) AS t1 FROM events
       WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t2
       FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND epoch_ms(e.ts) >= s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t3
       FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= s2.t2 GROUP BY 1)
SELECT u.user_id, s1.t1 AS t_signup_ms, s2.t2 AS t_click_ms,
       s3.t3 AS t_purchase_ms,
       CASE WHEN s3.t3 IS NOT NULL THEN 3
            WHEN s2.t2 IS NOT NULL THEN 2
            WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       LEFT JOIN s3 USING (user_id)
"""


def q_event_value_percentiles(spark, sf_dir):
    """Per-event-type value quantiles (operators/analytics.py): exact
    interpolated percentile for oracle parity; the operator's
    exact=False flag is the 100 TB path (approx_percentile's mergeable
    sketch, map-side partial agg)."""
    from oplogtoredis_spark.operators.analytics import value_quantiles

    return value_quantiles(
        _ev(spark, sf_dir, par=True), ("event_type",), "value"
    )


SQL_EVENT_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY 1
"""


def q_hopping_window_counts(spark, sf_dir):
    """Hopping-window rates (operators/analytics.py hopping_window_agg):
    per event_type, 6 h windows sliding every 2 h via the NATIVE window()
    expression — map-side window expansion, partial agg before the one
    Exchange, and the identical expression runs under Structured
    Streaming with a watermark (pinned in test_analytics.py). The oracle
    enumerates each event's duration/slide covering windows by integer
    arithmetic."""
    from oplogtoredis_spark.operators.analytics import hopping_window_agg

    return hopping_window_agg(
        _ev(spark, sf_dir, par=True),
        "ts",
        duration_ms=6 * 3600 * 1000,
        slide_ms=2 * 3600 * 1000,
        keys=("event_type",),
    )


SQL_HOPPING_WINDOWS = """
WITH e AS (SELECT event_type, epoch_ms(ts) AS ts_ms FROM events),
cov AS (
  SELECT event_type,
         (ts_ms // 7200000 - i) * 7200000 AS w_start_ms
  FROM e, UNNEST(range(0, 3)) AS u(i)
)
SELECT w_start_ms, w_start_ms + 21600000 AS w_end_ms, event_type,
       count(*) AS n_events
FROM cov GROUP BY 1, 2, 3
"""


def q_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention (operators/analytics.py retention_cohorts):
    users bucketed by first-event week, counted per later active week.
    ONE user-keyed shuffle does the work (min + collect_set of week
    indices per user, then explode over the tiny (cohort, offset) space);
    the oracle is the naive two-pass join-back form."""
    from oplogtoredis_spark.operators.analytics import retention_cohorts

    return retention_cohorts(_ev(spark, sf_dir, par=True))


SQL_RETENTION = """
WITH w AS (SELECT user_id, epoch_ms(ts) // 604800000 AS wk FROM events),
f AS (SELECT user_id, min(wk) AS cohort_period FROM w GROUP BY 1),
a AS (SELECT DISTINCT w.user_id, f.cohort_period, w.wk
      FROM w JOIN f USING (user_id))
SELECT cohort_period, wk - cohort_period AS period_offset,
       count(*) AS n_users
FROM a GROUP BY 1, 2
"""


def q_distinct_users_by_type(spark, sf_dir):
    """Per-event-type distinct-user cardinality (operators/analytics.py
    distinct_count): exact count_distinct for the oracle; exact=False is
    the 100 TB path (approx_count_distinct = HyperLogLog++, mergeable
    map-side sketch — cardinality without carrying distinct sets through
    the shuffle)."""
    from oplogtoredis_spark.operators.analytics import distinct_count

    return distinct_count(
        _ev(spark, sf_dir, par=True), ("event_type",), "user_id"
    )


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY 1
"""


def q_stream_interval_join_events(spark, sf_dir):
    """Watermarked STREAM-STREAM interval join (streaming/joins.py): two
    live feeds (clicks, purchases) correlated per user within a 6 h
    window, driven through REAL availableNow streams — each side split
    into two time-ordered files so cross-batch matches exercise both
    state stores. The watermark delay exceeds the data's span, so nothing
    is late and the emitted set equals the batch theta join (the oracle)
    EXACTLY; tests pin the bounded-state/late-drop behavior under tight
    watermarks (tests/test_stream_joins.py)."""
    import tempfile

    from oplogtoredis_spark.streaming.joins import interval_join

    ev = _ev(spark, sf_dir)
    base = _scratch_dir(prefix="otr_ssj_")

    clicks = _dump_split_stream_dir(
        ev.where(F.col("event_type") == "click").select(
            "user_id", "event_id", _ts_ms().alias("ts_ms")
        ),
        base,
        "clicks",
        "ts_ms",
    )
    purchases = _dump_split_stream_dir(
        ev.where(F.col("event_type") == "purchase").select(
            "user_id",
            "event_id",
            _ts_ms().alias("ts_ms"),
            F.round("value", 4).alias("value"),
        ),
        base,
        "purchases",
        "ts_ms",
    )
    ls = (
        spark.readStream.schema("user_id long, event_id long, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(clicks)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
        .drop("ts_ms")
    )
    rs = (
        spark.readStream.schema(
            "user_id long, event_id long, ts_ms long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(purchases)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
        .drop("ts_ms")
    )
    out = interval_join(
        ls, rs, on="user_id", left_ts="ts", right_ts="ts",
        lower_ms=0, upper_ms=6 * 3600 * 1000,
        watermark_delay="90 days", prefix="p_",
    )
    # parquet file sink (guide §5): the memory sink collected every join
    # match (~1M rows at sf1.0) into the driver per run; a file sink keeps
    # the output distributed and the read-back is a plain scan — the same
    # change stream_dedup_events got in r6.1
    out_dir = f"{base}/out"
    with _stream_state_parallelism(
        spark, width=_stateful_width(spark, clicks, purchases)
    ):
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    t = spark.read.parquet(out_dir)
    return t.select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "p_event_id",
        F.unix_millis("p_ts").alias("p_ts_ms"),
        "p_value",
    )


SQL_STREAM_INTERVAL_JOIN = """
WITH c AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
           WHERE event_type = 'click'),
 p AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
              round(value, 4) AS value FROM events
       WHERE event_type = 'purchase')
SELECT c.user_id, c.event_id, c.ts_ms,
       p.event_id AS p_event_id, p.ts_ms AS p_ts_ms, p.value AS p_value
FROM c JOIN p ON c.user_id = p.user_id
             AND p.ts_ms >= c.ts_ms AND p.ts_ms <= c.ts_ms + 21600000
"""


def q_topk_users_by_type(spark, sf_dir):
    """Top-3 users by total value per event type (operators/analytics.py
    topk_per_group): rank-over-window compiles to WindowGroupLimit — map
    tasks pre-prune to k rows per group BEFORE the shuffle, so a skewed
    group ships O(k x map_tasks) rows (the stratified_sample mechanism,
    demonstrated here on an aggregate)."""
    from oplogtoredis_spark.operators.analytics import topk_per_group

    totals = (
        _ev(spark, sf_dir, par=True)
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(F.round(F.col("value") * 10000, 0).cast("long")).alias(
                "total_value_e4"
            )
        )
    )
    return topk_per_group(
        totals, ("event_type",), "total_value_e4", k=3, tiebreak="user_id"
    )


SQL_TOPK_USERS = """
WITH t AS (
  SELECT event_type, user_id,
         CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT)
           AS total_value_e4
  FROM events GROUP BY 1, 2)
SELECT * FROM (
  SELECT event_type, user_id, total_value_e4,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY total_value_e4 DESC, user_id)
           AS rk
  FROM t)
WHERE rk <= 3
"""


def q_props_field_histogram(spark, sf_dir):
    """JSON payload field extraction + histogram (operators/analytics.py
    json_field_stats): get_json_object is a JVM-side expression running
    inside the scan stage — the downstream CDC-consumer pattern for
    payloads the envelope keeps opaque (sources/envelope.py)."""
    from oplogtoredis_spark.operators.analytics import json_field_stats

    return json_field_stats(
        _ev(spark, sf_dir, par=True), "props", "k", keys=("event_type",)
    )


SQL_PROPS_HISTOGRAM = """
WITH v AS (SELECT event_type,
                  CAST(json_extract(props, '$.k') AS BIGINT) AS _v
           FROM events)
SELECT event_type, _v % 10 AS bucket, count(*) AS n_events,
       min(_v) AS min_v, max(_v) AS max_v
FROM v WHERE _v IS NOT NULL GROUP BY 1, 2
"""


def q_weighted_sample_docs(spark, sf_dir):
    """Deterministic weighted sampling (operators/sampling.py
    weighted_sample): Efraimidis–Spirakis reservoir as a rank window —
    inclusion probability proportional to n_chars, at most 3 docs per
    lang, reproducible on any engine/cluster size because the uniform
    draw is the portable hash, not an RNG. WindowGroupLimit prunes to k
    per stratum map-side (the stratified_sample plan shape)."""
    from oplogtoredis_spark.operators.sampling import weighted_sample

    docs = _docs(spark, sf_dir, par=True).select("doc_id", "lang", "n_chars")
    return weighted_sample(
        docs, key_col="doc_id", weight_col="n_chars", k=3,
        strata_cols=("lang",),
    )


def _sql_weighted_sample() -> str:
    from oplogtoredis_spark.operators.sampling import weighted_score_sql

    score = weighted_score_sql("doc_id", "n_chars")
    return f"""
WITH elig AS (SELECT doc_id, lang, n_chars FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 0),
r AS (SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {score} DESC, doc_id) AS rk
      FROM elig)
SELECT doc_id, lang, n_chars, rk FROM r WHERE rk <= 3
"""


def q_value_trend_by_type(spark, sf_dir):
    """Per-event-type OLS trend of value over time (operators/analytics.py
    linear_trend): the five sufficient statistics are exact integer sums
    (x = day index, y at e4), combined in DECIMAL(38,0), divided in
    doubles only at the end — deterministic under any partitioning,
    unlike float-accumulating regr_slope. Zero-x-variance keys yield
    NULL, not inf."""
    from oplogtoredis_spark.operators.analytics import linear_trend

    ev = _ev(spark, sf_dir, par=True)
    day = F.expr("unix_millis(cast(ts as timestamp)) div 86400000")
    return linear_trend(
        ev.select("event_type", day.alias("day"), "value"),
        ["event_type"],
        "day",
        "value",
    )


SQL_VALUE_TREND = """
WITH b AS (SELECT event_type, epoch_ms(ts) // 86400000 AS x,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS y
           FROM events),
g AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM b GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round((CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) <> 0.0
              THEN CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) END) / 10000.0, 4)
         AS slope,
       round(((CAST(sy AS DOUBLE)
               - (CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) <> 0.0
                  THEN CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) END)
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) / 10000.0, 4)
         AS intercept
FROM g
"""


def q_resample_value_by_type(spark, sf_dir):
    """Gap-filled hourly resampling per event type (operators/analytics.py
    resample_gapfill): the fact table shuffles ONCE into the sparse
    (type, hour) aggregate; the dense hour spine explodes from one
    sequence() per type and the gaps carry the last observed sum forward
    with a running last(ignorenulls) window — timescale's
    time_bucket_gapfill posture with no self-join against the facts.
    Integer bucketing (ms − ms % step) and e4 fixed-point sums keep both
    engines bit-identical."""
    from oplogtoredis_spark.operators.analytics import resample_gapfill

    return resample_gapfill(
        _ev(spark, sf_dir, par=True).select(
            "event_type", F.col("ts").cast("timestamp").alias("ts"), "value"
        ),
        ["event_type"],
        step_ms=3_600_000,
        fill="carry",
    )


SQL_RESAMPLE = """
WITH sparse AS (
  SELECT event_type,
         epoch_ms(ts) - epoch_ms(ts) % 3600000 AS bucket_ms,
         count(*) AS n_events,
         sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS s
  FROM events GROUP BY 1, 2),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, 3600000)) AS bucket_ms
  FROM (SELECT event_type, min(bucket_ms) AS lo, max(bucket_ms) AS hi
        FROM sparse GROUP BY 1)),
dense AS (
  SELECT sp.event_type, sp.bucket_ms,
         coalesce(s.n_events, 0) AS n_events, s.s AS s
  FROM spine sp LEFT JOIN sparse s USING (event_type, bucket_ms))
SELECT event_type, bucket_ms, n_events,
       (last_value(s IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY bucket_ms
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) / 10000.0
         AS value_sum
FROM dense
"""


def q_zscore_anomalies_events(spark, sf_dir):
    """Per-event-type z-score outliers (operators/analytics.py
    zscore_anomalies): mean/stddev come from exact integer sufficient
    statistics (n, Σv, Σv² at e4, combined in DECIMAL(38,0) — the
    linear_trend discipline), then BROADCAST back onto the fact rows, so
    the facts never shuffle. |z| > 3 rows survive; zero-variance or
    singleton keys yield nothing (z undefined, never ±inf)."""
    from oplogtoredis_spark.operators.analytics import zscore_anomalies

    ev = _ev(spark, sf_dir, par=True).select("event_id", "event_type", "value")
    return zscore_anomalies(ev, ["event_type"], threshold=3.0)


SQL_ZSCORE = """
WITH v AS (SELECT event_id, event_type, value,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4
           FROM events),
st AS (SELECT event_type,
              CAST(count(*) AS DECIMAL(38,0)) AS n,
              CAST(sum(v4) AS DECIMAL(38,0)) AS s,
              CAST(sum(CAST(v4 AS DECIMAL(38,0)) * v4) AS DECIMAL(38,0)) AS ss
       FROM v GROUP BY 1 HAVING count(*) >= 2),
j AS (SELECT v.event_id, v.event_type, v.value, v.v4, st.n, st.s, st.ss
      FROM v JOIN st USING (event_type)),
z AS (SELECT event_id, event_type, value,
             CASE WHEN sqrt(CAST(n * ss - s * s AS DOUBLE)
                            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                       > 0.0
                  THEN (CAST(v4 AS DOUBLE)
                        - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       / sqrt(CAST(n * ss - s * s AS DOUBLE)
                              / (CAST(n AS DOUBLE)
                                 * (CAST(n AS DOUBLE) - 1.0)))
             END AS zz
      FROM j)
SELECT event_id, event_type, value, round(zz, 4) AS z
FROM z WHERE abs(zz) > 3.0
"""


def q_rolling_value_by_user(spark, sf_dir):
    """Per-event trailing 1-hour window aggregate (operators/analytics.py
    rolling_window_sum): ONE Exchange on the user key, RANGE-frame
    streaming window (frame-bounded buffering, hot keys spill) — RANGE not
    ROWS so duplicate timestamps share a frame end and the result is
    partition-order-independent; e4 fixed-point frame sums."""
    from oplogtoredis_spark.operators.analytics import rolling_window_sum

    ev = _ev(spark, sf_dir, par=True).select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    return rolling_window_sum(
        ev, ["user_id"], "ts", "value", window_ms=3_600_000
    ).select("event_id", "user_id", "ms", "trailing_n", "trailing_sum")


SQL_ROLLING = """
WITH v AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4
           FROM events)
SELECT event_id, user_id, ms,
       count(*) OVER w AS trailing_n,
       (sum(v4) OVER w) / 10000.0 AS trailing_sum
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY ms
             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
"""


def q_editdist_dup_pairs(spark, sf_dir):
    """Exact edit-distance near-dup pairs over a 16-char normalized prefix
    (operators/editdist.py): FastSS deletion-neighborhood candidates (map-
    side explode, fan-out len+1 at k=1) → equality self-join on the variant
    string → one pair-dedup shuffle → threshold-bounded levenshtein verify.
    Complete by the FastSS theorem; never a Cartesian product (plan-pinned
    in tests)."""
    from oplogtoredis_spark.operators.editdist import edit_distance_pairs

    docs = _docs(spark, sf_dir, par=True).select(
        "doc_id", F.substring(F.lower("text"), 1, 16).alias("pfx")
    )
    return edit_distance_pairs(docs, "doc_id", "pfx", k=1).select(
        "id_a", "id_b", "dist"
    )


SQL_EDITDIST = """
WITH kk AS (SELECT doc_id, substr(lower(text), 1, 16) AS pfx FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.pfx, b.pfx) AS dist
FROM kk a JOIN kk b ON a.doc_id < b.doc_id
WHERE abs(length(a.pfx) - length(b.pfx)) <= 1
  AND levenshtein(a.pfx, b.pfx) <= 1
"""


def q_mad_anomalies_events(spark, sf_dir):
    """Robust per-type outliers (operators/analytics.py mad_anomalies):
    |v − median| > 3.5 × MAD — the 50%-breakdown sibling of the z-score
    query (one extreme row can't mask itself by inflating the stddev).
    Exact interpolated percentiles over e4 integers (partition-order-
    independent); two aggregate-sized broadcasts, the facts never
    shuffle."""
    from oplogtoredis_spark.operators.analytics import mad_anomalies

    ev = _ev(spark, sf_dir, par=True).select("event_id", "event_type", "value")
    return mad_anomalies(ev, ["event_type"], threshold=3.5)


SQL_MAD = """
WITH v AS (SELECT event_id, event_type, value,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4
           FROM events),
md AS (SELECT event_type, quantile_cont(v4, 0.5) AS med4
       FROM v GROUP BY 1),
dv AS (SELECT v.*, md.med4, abs(CAST(v.v4 AS DOUBLE) - md.med4) AS dev
       FROM v JOIN md USING (event_type)),
mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad4
        FROM dv GROUP BY 1 HAVING quantile_cont(dev, 0.5) > 0.0)
SELECT dv.event_id, dv.event_type, dv.value,
       round(dv.med4 / 10000.0, 4) AS med,
       round(mad.mad4 / 10000.0, 4) AS mad,
       round(dv.dev / mad.mad4, 4) AS rscore
FROM dv JOIN mad USING (event_type)
WHERE dv.dev > 3.5 * mad.mad4
"""


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences
    (operators/analytics.py transition_matrix): ONE corpus-sized Exchange
    (the lead() window on user_id, tie-broken by event_id so duplicate
    timestamps stay deterministic), then a partial-agg'd pair groupBy and
    a |states|²-sized normalization window."""
    from oplogtoredis_spark.operators.analytics import transition_matrix

    ev = _ev(spark, sf_dir, par=True).select(
        "event_id", "user_id", "ts", "event_type"
    )
    return transition_matrix(ev)


SQL_TRANSITIONS = """
WITH s AS (SELECT event_type AS state,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS next_state
           FROM events),
c AS (SELECT state, next_state, count(*) AS n
      FROM s WHERE next_state IS NOT NULL GROUP BY 1, 2)
SELECT state, next_state, n,
       round(n / (sum(n) OVER (PARTITION BY state)), 4) AS p
FROM c
"""


def q_ab_test_value(spark, sf_dir):
    """Per-event-type Welch two-sample test over a deterministic hash-
    assigned 50/50 user split (operators/analytics.py ab_test): exact
    integer sufficient statistics per arm as conditional aggregates — ONE
    partial-agg'd shuffle, no pivot join; the portable sample hash makes
    the assignment oracle-reproducible."""
    from oplogtoredis_spark.operators.analytics import ab_test

    ev = _ev(spark, sf_dir, par=True).select("user_id", "event_type", "value")
    return ab_test(ev, "user_id", "value", keys=["event_type"], salt="exp1")


def _sql_ab_test() -> str:
    from oplogtoredis_spark.operators.sampling import _D, sample_hash_sql

    h = sample_hash_sql("user_id", "exp1")
    return f"""
WITH v AS (SELECT event_type,
                  CASE WHEN {h} < {_D // 2} THEN 0 ELSE 1 END AS arm,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v4
           FROM events),
st AS (SELECT event_type,
              CAST(count(*) FILTER (arm = 0) AS DECIMAL(38,0)) AS na,
              CAST(count(*) FILTER (arm = 1) AS DECIMAL(38,0)) AS nb,
              CAST(sum(v4) FILTER (arm = 0) AS DECIMAL(38,0)) AS sa,
              CAST(sum(v4) FILTER (arm = 1) AS DECIMAL(38,0)) AS sb,
              CAST(sum(CAST(v4 AS DECIMAL(38,0)) * v4) FILTER (arm = 0)
                   AS DECIMAL(38,0)) AS ssa,
              CAST(sum(CAST(v4 AS DECIMAL(38,0)) * v4) FILTER (arm = 1)
                   AS DECIMAL(38,0)) AS ssb
       FROM v GROUP BY 1
       HAVING count(*) FILTER (arm = 0) >= 2
          AND count(*) FILTER (arm = 1) >= 2),
w AS (SELECT event_type,
             CAST(na AS DOUBLE) AS dna, CAST(nb AS DOUBLE) AS dnb,
             CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
             CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
             CAST(na * ssa - sa * sa AS DOUBLE)
               / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)) AS va,
             CAST(nb * ssb - sb * sb AS DOUBLE)
               / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)) AS vb,
             na, nb
      FROM st),
f AS (SELECT event_type, na, nb, ma, mb, va, vb, dna, dnb,
             va / dna + vb / dnb AS se2
      FROM w)
SELECT event_type,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(ma / 10000.0, 4) AS mean_a,
       round(mb / 10000.0, 4) AS mean_b,
       round((ma - mb) / 10000.0, 4) AS diff,
       round((ma - mb) / sqrt(se2), 4) AS t_stat,
       round((se2 * se2) / ((va / dna) * (va / dna) / (dna - 1.0)
                            + (vb / dnb) * (vb / dnb) / (dnb - 1.0)),
             4) AS df_welch
FROM f WHERE se2 > 0.0
"""


SQL_AB_TEST = _sql_ab_test()


def q_dq_expectations(spark, sf_dir):
    """Declarative data-quality gate (operators/expectations.py) over the
    orders/lineitem/customer relational tables: all row-local checks fold
    into ONE aggregate per table (one scan each), uniqueness is one
    partial-agg'd shuffle, and referential integrity is a null-safe LEFT
    ANTI join — customer broadcasts (dimension), orders does not
    (fact-sized parent, shuffled anti join). The accepted_values check
    deliberately excludes status 'P' so the report demonstrably counts
    (the other checks hold at zero on this corpus)."""
    from oplogtoredis_spark.operators.expectations import (
        accepted_values,
        foreign_key,
        in_range,
        not_null,
        run_expectations,
        unique,
    )

    _ensure_shipped(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o_rep = run_expectations(
        orders,
        [
            not_null("o_orderkey"),
            unique(["o_orderkey"]),
            in_range("o_totalprice", 0.0, 10000000.0),
            accepted_values("o_orderstatus", ["O", "F"]),
            foreign_key(["o_custkey"], customer, ["c_custkey"]),
        ],
    )
    l_rep = run_expectations(
        lineitem,
        [
            not_null("l_orderkey"),
            in_range("l_discount", 0.0, 0.1),
            in_range("l_quantity", 1.0, 50.0),
            foreign_key(
                ["l_orderkey"], orders, ["o_orderkey"], broadcast=False
            ),
        ],
    )
    return o_rep.withColumn("tbl", F.lit("orders")).unionByName(
        l_rep.withColumn("tbl", F.lit("lineitem"))
    )


SQL_DQ = """
SELECT 'orders' AS tbl, 'not_null:o_orderkey' AS "check",
       CAST(count(*) AS BIGINT) AS n_violations
FROM orders WHERE o_orderkey IS NULL
UNION ALL
SELECT 'orders', 'unique:o_orderkey',
       CAST(coalesce(sum(n - 1), 0) AS BIGINT)
FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey
      HAVING count(*) > 1)
UNION ALL
SELECT 'orders', 'in_range:o_totalprice[0.0,10000000.0]',
       CAST(count(*) AS BIGINT)
FROM orders
WHERE o_totalprice IS NOT NULL
  AND o_totalprice NOT BETWEEN 0.0 AND 10000000.0
UNION ALL
SELECT 'orders', 'accepted_values:o_orderstatus', CAST(count(*) AS BIGINT)
FROM orders
WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F')
UNION ALL
SELECT 'orders', 'foreign_key:o_custkey', CAST(count(*) AS BIGINT)
FROM orders
WHERE o_custkey IS NOT NULL
  AND o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'lineitem', 'not_null:l_orderkey', CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_orderkey IS NULL
UNION ALL
SELECT 'lineitem', 'in_range:l_discount[0.0,0.1]', CAST(count(*) AS BIGINT)
FROM lineitem
WHERE l_discount IS NOT NULL AND l_discount NOT BETWEEN 0.0 AND 0.1
UNION ALL
SELECT 'lineitem', 'in_range:l_quantity[1.0,50.0]', CAST(count(*) AS BIGINT)
FROM lineitem
WHERE l_quantity IS NOT NULL AND l_quantity NOT BETWEEN 1.0 AND 50.0
UNION ALL
SELECT 'lineitem', 'foreign_key:l_orderkey', CAST(count(*) AS BIGINT)
FROM lineitem
WHERE l_orderkey IS NOT NULL
  AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
"""


def q_star_revenue_by_nation(spark, sf_dir):
    """Star-schema revenue rollup (the TPC-H Q5 shape): lineitem ⋈ orders
    (both fact-sized — shuffle on the orderkey) ⋈ customer (shuffle on the
    custkey at real scale; AQE may broadcast at bench SF) ⋈ nation ⋈
    region (explicit broadcasts — constant-size dims). Filters (order-date
    year, region name) are pushed to the scans; revenue sums in e4 fixed
    point carried as DECIMAL(38,0) — Σ(price·1e4) of trillions of rows
    exceeds int64, and a double sum is partition-order-dependent."""
    _ensure_shipped(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").where(
        F.col("r_name") == "ASIA"
    )
    rev4 = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        * F.lit(10000.0)
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(rev4).cast("double") / F.lit(10000.0), 4
            ).alias("revenue"),
        )
    )


SQL_STAR_REVENUE = """
SELECT n_name, CAST(count(*) AS BIGINT) AS n_items,
       round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                 * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 10000.0, 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_bloom_semi_join_events(spark, sf_dir):
    """Explicit Bloom-pruned semi join (operators/bloomjoin.py): purchase
    events of users who ever produced a high-value error. The dimension's
    keys build a 2^20-bit bitmap (one partial-agg'd shuffle over the
    DIMENSION only); the fact side is pruned map-side by codegen'd bit
    tests against the broadcast single-row bitmap BEFORE the exact semi
    join removes the false positives — shuffle volume ∝ matches, not
    corpus. Result equals the plain semi join bit-for-bit (no false
    negatives), which is exactly what the oracle computes."""
    from oplogtoredis_spark.operators.bloomjoin import bloom_semi_join

    ev = _ev(spark, sf_dir, par=True)
    dim = (
        ev.where((F.col("event_type") == "error") & (F.col("value") > 95))
        .select("user_id")
        .distinct()
    )
    big = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )
    return bloom_semi_join(big, dim, "user_id")


SQL_BLOOM_SEMI_JOIN = """
SELECT event_id, user_id, value FROM events
WHERE event_type = 'purchase' AND user_id IN (
  SELECT user_id FROM events WHERE event_type = 'error' AND value > 95)
"""


def q_salted_join_events(spark, sf_dir):
    """Hot-key salted join (operators/skew.py): events join their
    per-type counts — event_type has only 5 values, so every reducer of a
    plain shuffled join handles a fifth of the table (the north rule's
    hot-repo regime in miniature). The fact side gets a row-unique salt,
    the dimension replicates ×8, the join runs on (key, salt): the hot
    key's reduce work spreads over 8 reducers while the RESULT equals the
    plain join row-for-row (salt assignment can't change multiplicities —
    each fact row meets exactly its own salt's replica), which is what
    the oracle computes."""
    from oplogtoredis_spark.operators.skew import salted_join

    ev = _ev(spark, sf_dir, par=True)
    dim = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_count")
    )
    return salted_join(
        ev.select("event_id", "event_type"), dim, ["event_type"], n_salts=8
    )


SQL_SALTED_JOIN = """
SELECT e.event_type, e.event_id, c.type_count
FROM events e JOIN (SELECT event_type, count(*) AS type_count
                    FROM events GROUP BY 1) c USING (event_type)
"""


def q_pagerank_user_graph(spark, sf_dir):
    """Fixed-iteration PageRank (operators/graph.py) over a deterministic
    click-referral graph derived from events: src = user, dst = (user +
    floor(value)) % 500. Ranks are e9 fixed-point LONGS — every iteration
    is pure integer multiply/divide, so the per-node sums are
    order-independent and the oracle replays all 3 iterations
    bit-identically (float PageRank is partition-order-dependent). Leaky
    dangling variant, documented in the operator. One join + one agg
    shuffle per iteration; the edge subtree canonicalizes equal across
    iterations so AQE materializes it once."""
    from oplogtoredis_spark.operators.graph import pagerank

    ev = _ev(spark, sf_dir, par=True)
    edges = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("src"),
        (
            (F.col("user_id") + F.floor(F.col("value")).cast("long")) % 500
        ).alias("dst"),
    )
    return pagerank(edges, iters=3, damping_pct=85).select(
        "node", "rank_e9"
    )


def _sql_pagerank(iters: int = 3, d_pct: int = 85) -> str:
    """The identical integer recurrence unrolled as chained CTEs."""
    sql = """
WITH edges AS (SELECT DISTINCT user_id AS src,
        (user_id + CAST(floor(value) AS BIGINT)) % 500 AS dst
   FROM events WHERE event_type = 'click'),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
r0 AS (SELECT node,
       CAST(1000000000 // (SELECT count(*) FROM nodes) AS BIGINT) AS rank_e9
       FROM nodes)"""
    base = (
        f"(CAST({100 - d_pct} AS BIGINT) * 1000000000"
        f" // (100 * (SELECT count(*) FROM nodes)))"
    )
    for i in range(1, iters + 1):
        sql += f""",
r{i} AS (SELECT n.node,
         CAST({base} + coalesce(s.c, 0) AS BIGINT) AS rank_e9
         FROM nodes n LEFT JOIN (
           SELECT e.dst AS node,
                  sum((r.rank_e9 * {d_pct}) // (d.outdeg * 100)) AS c
           FROM edges e JOIN r{i - 1} r ON e.src = r.node
                        JOIN deg d ON e.src = d.src
           GROUP BY 1) s ON n.node = s.node)"""
    return sql + f"\nSELECT node, rank_e9 FROM r{iters}"


def q_table_profile_events(spark, sf_dir):
    """Ingest-validation table profile (operators/profile.py): per-column
    null counts, exact distinct cardinalities, numeric ranges — ONE pass
    (single scan + one Expand-backed aggregate; exact=False drops the
    Expand for the HLL sketch at 100 TB). min/max populate only for
    numeric columns — the static-schema contract the oracle mirrors."""
    from oplogtoredis_spark.operators.profile import profile_table

    return profile_table(_ev(spark, sf_dir, par=True))


SQL_TABLE_PROFILE = """
SELECT 'event_id' AS "column", count(*) AS n_rows,
       count(*) - count(event_id) AS n_nulls,
       count(DISTINCT event_id) AS n_distinct,
       CAST(min(event_id) AS DOUBLE) AS min_value,
       CAST(max(event_id) AS DOUBLE) AS max_value FROM events
UNION ALL
SELECT 'ts', count(*), count(*) - count(ts), count(DISTINCT ts),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM events
UNION ALL
SELECT 'user_id', count(*), count(*) - count(user_id),
       count(DISTINCT user_id),
       CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE) FROM events
UNION ALL
SELECT 'event_type', count(*), count(*) - count(event_type),
       count(DISTINCT event_type),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM events
UNION ALL
SELECT 'value', count(*), count(*) - count(value), count(DISTINCT value),
       min(value), max(value) FROM events
UNION ALL
SELECT 'props', count(*), count(*) - count(props), count(DISTINCT props),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM events
"""


#: BM25 driver-query term sets, drawn from the synthetic corpus vocabulary.
_BM25_QUERIES = [
    ("q1", "merge join window"),
    ("q2", "fast hash scan table"),
    ("q3", "stream batch batch"),
]


def q_inverted_index_stats(spark, sf_dir):
    """Inverted-index summary (operators/retrieval.py): per-token posting
    list size and total term frequency. The corpus shuffles exactly once
    (the postings aggregation); the stats are a small re-aggregation over
    the postings, never over the corpus."""
    from oplogtoredis_spark.operators.retrieval import index_stats, postings

    return index_stats(postings(_docs(spark, sf_dir, par=True)))


SQL_INVERTED_INDEX = r"""
WITH toks AS (SELECT doc_id,
                     list_filter(string_split_regex(trim(lower(text)),
                                                    '\s+'),
                                 x -> x <> '') AS t
              FROM documents),
post AS (SELECT doc_id, u.token, count(*) AS tf
         FROM toks, UNNEST(t) AS u(token) GROUP BY 1, 2)
SELECT token, count(*) AS n_docs, CAST(sum(tf) AS BIGINT) AS total_tf
FROM post GROUP BY 1
"""


def q_bm25_topk_docs(spark, sf_dir):
    """BM25 lexical top-k retrieval (operators/retrieval.py bm25_topk):
    three fixed term queries against the documents corpus, k=5. Per-term
    contributions are e4 fixed-point before summation so the score is an
    order-independent integer sum the DuckDB oracle reproduces
    bit-identically; ties at the k boundary resolve by doc id. Plan: one
    corpus shuffle (postings), broadcast query-term dimension carrying
    the document frequencies, WindowGroupLimit top-k."""
    from oplogtoredis_spark.operators.retrieval import bm25_topk

    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id string, qtext string")
    return bm25_topk(_docs(spark, sf_dir, par=True), qdf, k=5)


# `2.1999999999999997` / `0.25` are repr(1.2 + 1.0) / repr(1.0 - 0.75): the
# pre-folded double literals the Spark side injects (see bm25_topk), spelled
# so both engines parse the bit-identical value.
SQL_BM25_TOPK = r"""
WITH toks AS (SELECT doc_id,
                     list_filter(string_split_regex(trim(lower(text)),
                                                    '\s+'),
                                 x -> x <> '') AS t
              FROM documents),
post AS (SELECT doc_id, len(t) AS dl, u.token, count(*) AS tf
         FROM toks, UNNEST(t) AS u(token) GROUP BY 1, 2, 3),
dft AS (SELECT token, count(*) AS dfreq FROM post GROUP BY 1),
stats AS (SELECT count(DISTINCT doc_id) AS n_docs,
                 CAST(sum(tf) AS DOUBLE) / count(DISTINCT doc_id) AS avgdl
          FROM post),
qs(query_id, qtext) AS (VALUES ('q1', 'merge join window'),
                               ('q2', 'fast hash scan table'),
                               ('q3', 'stream batch batch')),
qt AS (SELECT DISTINCT query_id, u.token
       FROM (SELECT query_id,
                    list_filter(string_split_regex(trim(lower(qtext)),
                                                   '\s+'),
                                x -> x <> '') AS t
             FROM qs) q,
            UNNEST(t) AS u(token)),
terms AS (
  SELECT q.query_id, p.doc_id,
         CAST(floor(
           ln(1.0 + (s.n_docs - d.dfreq + 0.5) / (d.dfreq + 0.5))
           * ((p.tf * 2.1999999999999997)
              / (p.tf + 1.2 * (0.25 + (0.75 * p.dl) / s.avgdl)))
           * 10000.0 + 0.5) AS BIGINT) AS term_e4
  FROM post p JOIN qt q USING (token) JOIN dft d USING (token), stats s
),
scored AS (SELECT query_id, doc_id, CAST(sum(term_e4) AS BIGINT) AS score_e4
           FROM terms GROUP BY 1, 2),
ranked AS (SELECT query_id, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score_e4 DESC, doc_id) AS rank,
                  score_e4 / 10000.0 AS score
           FROM scored)
SELECT query_id, doc_id, rank, score FROM ranked WHERE rank <= 5
"""


def q_funnel_stream_events(spark, sf_dir):
    """LIVE funnel tracking (streaming/stateful.py funnel_stream): the
    batch funnel's state machine carried across micro-batches with
    applyInPandasWithState — one emission per key per batch it advanced,
    stage strictly increasing, O(keys) fixed-width state. Driven through a
    REAL availableNow stream over two time-ordered files (the engine's
    B2 per-key ordered-delivery contract, which the fold builds on); the
    latest emission per user + the stage-0 users IS the batch funnel, so
    the oracle is SQL_FUNNEL — unchanged by design."""
    import tempfile
    import uuid

    from oplogtoredis_spark.streaming.stateful import funnel_stream

    ev = _ev(spark, sf_dir)
    base = _scratch_dir(prefix="otr_fst_")
    src = _dump_split_stream_dir(
        ev.select("user_id", _ts_ms().alias("ts_ms"), "event_type"),
        base,
        "events",
        "ts_ms",
    )
    stages = ("signup", "click", "purchase")
    stream = (
        spark.readStream.schema(
            "user_id long, ts_ms long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"fst_{uuid.uuid4().hex[:8]}"
    # core-count width, NOT the feed-scaled width the JVM state stores
    # want: this stream's state lives in applyInPandasWithState Python
    # workers, where width = fold parallelism (16 parts measured 8.7 s vs
    # 6.5 s at 32 on the same host)
    with _stream_state_parallelism(spark):
        q = (
            funnel_stream(stream, stages)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    ts_cols = [f"t_{s}_ms" for s in stages]
    latest = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("stage").alias("stage"),
            *[F.max_by(c, "stage").alias(c) for c in ts_cols],
        )
    )
    users = _ev(spark, sf_dir, par=True).select("user_id").distinct()
    return users.join(latest, "user_id", "left").select(
        "user_id",
        *ts_cols,
        F.coalesce("stage", F.lit(0)).alias("stage"),
    )


def q_heavy_hitters_stream_events(spark, sf_dir):
    """LIVE heavy hitters (streaming/stateful.py heavy_hitters_stream):
    space-saving summaries per hash partition carried across micro-batches
    — here over event_type with capacity 8 ≥ the 5-type domain, the EXACT
    regime, so the union of the partitions' latest summaries equals the
    batch GROUP BY to the row (the oracle). The stream is a REAL
    availableNow run over two time-split files (cross-batch count
    accumulation exercised, not single-batch)."""
    import tempfile
    import uuid

    from oplogtoredis_spark.streaming.stateful import heavy_hitters_stream

    base = _scratch_dir(prefix="otr_hh_")
    # split on event_id (the r5 fixture's order); files carry the extra
    # event_id column, which the readStream schema projection drops
    src = _dump_split_stream_dir(
        _ev(spark, sf_dir).select("event_id", "event_type"),
        base,
        "events",
        "event_id",
    )
    stream = (
        spark.readStream.schema("event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"hh_{uuid.uuid4().hex[:8]}"
    with _stream_state_parallelism(spark, width=_stateful_width(spark, src)):
        q = (
            heavy_hitters_stream(
                stream, "event_type", capacity=8, n_partitions=4
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    summaries = spark.table(name)
    return (
        summaries.groupBy("pid", "item")
        .agg(F.max_by("n", "ver").alias("n"))
        .groupBy(F.col("item").alias("event_type"))
        .agg(F.sum("n").alias("n_events"))
    )


SQL_HEAVY_HITTERS = """
SELECT event_type, count(*) AS n_events FROM events GROUP BY 1
"""


def q_stream_dedup_events(spark, sf_dir):
    """Streaming exact-once absorption of at-least-once delivery via
    native dropDuplicatesWithinWatermark: every third event is DELIVERED
    TWICE — once in each of the two time-ordered micro-batch files, so
    the duplicate arrives in a LATER batch and only checkpointed dedup
    state can absorb it (state is watermark-bounded: a key is dropped
    once no duplicate can still arrive — the streaming analogue of the
    lake MERGE's replay-window idempotency, which absorbs redeliveries
    relationally instead). The oracle is plain DISTINCT."""
    import tempfile
    import uuid

    ev = _ev(spark, sf_dir)
    base = _scratch_dir(prefix="otr_sdd_")
    feed = ev.select(
        "event_id", "user_id", "event_type", _ts_ms().alias("ts_ms")
    )
    # batch 2 carries a SECOND copy of every dup-subset row: first-half
    # originals are redelivered CROSS-batch (checkpointed state absorbs
    # them), second-half ones intra-batch — both postures exercised
    src = _dump_split_stream_dir(
        feed,
        base,
        "events",
        "ts_ms",
        extra_second=feed.where(F.col("event_id") % 3 == 0),
    )
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts_ms long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
        .withWatermark("ts", "90 days")
    )
    # parquet file sink (guide §5): the r5 memory sink collected the ~1M
    # surviving rows to the driver per run; a file sink on the scratch dir
    # keeps the output distributed and the read-back is a plain scan
    out_dir = f"{base}/out"
    with _stream_state_parallelism(spark, width=_stateful_width(spark, src)):
        q = (
            stream.dropDuplicatesWithinWatermark(["event_id"])
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out_dir).select(
        "event_id", "user_id", "event_type", "ts_ms"
    )


SQL_STREAM_DEDUP = """
SELECT DISTINCT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
FROM events
"""


def q_event_type_pivot(spark, sf_dir):
    """Wide daily activity matrix via native pivot with an EXPLICIT value
    list (day × one count column per event type): the explicit list keeps
    the schema deterministic and skips the extra distinct-values job a
    bare pivot() runs — at 100 TB the pivot is then just one groupBy with
    conditional aggregates (exactly the oracle's FILTER form)."""
    ev = _ev(spark, sf_dir, par=True)
    day = F.expr("unix_millis(cast(ts as timestamp)) div 86400000")
    types = ["click", "view", "signup", "purchase", "error"]
    wide = ev.groupBy(day.alias("day")).pivot("event_type", types).count()
    return wide.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in types
        ],
    )


SQL_EVENT_TYPE_PIVOT = """
SELECT epoch_ms(ts) // 86400000 AS day,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'view') AS n_view,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'error') AS n_error
FROM events GROUP BY 1
"""


def q_rollup_value_by_type_day(spark, sf_dir):
    """Hierarchical subtotals via native ROLLUP (event_type, day): leaf
    rows + per-type subtotals + grand total in ONE pass — Spark expands
    grouping sets inside the aggregate (partial agg still applies), no
    self-union of three groupBys. ``lvl`` is grouping_id so consumers can
    split the levels; sums are e4 fixed-point (order-independent across
    engines)."""
    ev = _ev(spark, sf_dir, par=True)
    day = F.expr("unix_millis(cast(ts as timestamp)) div 86400000")
    return (
        ev.select(
            "event_type",
            day.alias("day"),
            F.round(F.col("value") * 10000, 0).cast("long").alias("v4"),
        )
        .rollup("event_type", "day")
        .agg(
            F.grouping_id("event_type", "day").alias("lvl"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v4").alias("sum_value_e4"),
        )
    )


SQL_ROLLUP_VALUE = """
SELECT event_type, epoch_ms(ts) // 86400000 AS day,
       CAST(grouping(event_type) * 2 + grouping(epoch_ms(ts) // 86400000)
            AS INT) AS lvl,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT)
         AS sum_value_e4
FROM events
GROUP BY ROLLUP (event_type, epoch_ms(ts) // 86400000)
"""


def q_corpus_hygiene_report(spark, sf_dir):
    """The production per-(lang, source) corpus hygiene report — the
    weekly job every training-data pipeline runs, composed from the
    quality gate, repetition signals, and decontamination in ONE plan:
    doc counts, per-reason reject counts, contamination count,
    Gopher-threshold high-repetition count, dup-ratio mass (e4
    fixed-point sum — order-independent across engines, unlike a float
    mean), and total token count. Every join is doc-keyed; the final
    groupBy key space is tiny."""
    from oplogtoredis_spark.operators.decontam import decontaminate
    from oplogtoredis_spark.operators.text import (
        quality_filter,
        repetition_signals,
    )

    docs = _docs(spark, sf_dir, par=True)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    bench = docs.where(F.col("doc_id") % 37 == 0)
    kept, rejected = quality_filter(
        corpus.select("doc_id", "lang", "source", "text"),
        min_tokens=20, min_alpha_ratio=0.55, min_quality=0.5, langs=("en",),
    )
    verdicts = kept.select(
        "doc_id", "lang", "source", F.lit("kept").alias("verdict")
    ).unionByName(
        rejected.select(
            "doc_id", "lang", "source",
            F.col("reject_reason").alias("verdict"),
        )
    )
    rep = repetition_signals(corpus)
    dc = decontaminate(corpus, bench, n=4)

    def n_verdict(v):
        return F.count(F.when(F.col("verdict") == v, 1)).alias(f"n_{v}")

    return (
        verdicts.join(rep, "doc_id")
        .join(dc, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_verdict("kept"),
            n_verdict("too_short"),
            n_verdict("low_alpha"),
            n_verdict("low_quality"),
            n_verdict("wrong_lang"),
            F.sum(F.col("contaminated").cast("long")).alias(
                "n_contaminated"
            ),
            F.sum(
                (F.col("top_bigram_frac") > 0.2).cast("long")
            ).alias("n_high_repetition"),
            F.sum(
                F.round(F.col("dup_token_ratio") * 10000, 0).cast("long")
            ).alias("sum_dup_ratio_e4"),
            F.sum(F.col("n_tokens").cast("long")).alias("n_tokens_total"),
        )
    )


SQL_CORPUS_HYGIENE_REPORT = f"""
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 37 <> 0),
 t AS (SELECT doc_id, lang, source, text,
              {_TOKS.format(x='text')} AS toks FROM corpus),
 feat AS (SELECT doc_id, lang, source,
    len(toks) AS n_tokens,
    len(list_intersect(list_distinct({_TOKS.format(x='lower(text)')}),
        {_EN_STOP})) AS hits,
    round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
          / length(text), 4) AS alpha
  FROM t),
 q AS (SELECT *, round(0.4 * least(n_tokens / 200.0, 1.0) + 0.4 * alpha
          + 0.2 * least(hits / 5.0, 1.0), 4) AS quality FROM feat),
 v AS (SELECT doc_id, lang, source, n_tokens,
    CASE WHEN n_tokens < 20 THEN 'too_short'
         WHEN alpha < 0.55 THEN 'low_alpha'
         WHEN quality < 0.5 THEN 'low_quality'
         WHEN (CASE WHEN hits >= 2 THEN 'en' ELSE 'unk' END) != 'en'
           THEN 'wrong_lang'
         ELSE 'kept' END AS verdict
  FROM q),
 ltoks AS (SELECT doc_id, {_TOKS.format(x='lower(text)')} AS t FROM corpus),
 rbase AS (SELECT doc_id, len(t) AS n_toks,
                  round(1 - len(list_distinct(t)) / len(t), 4)
                    AS dup_token_ratio, t
           FROM ltoks),
 bg AS (SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS bigram
        FROM rbase,
             UNNEST(CASE WHEN n_toks >= 2 THEN range(1, n_toks)
                    ELSE [] END) AS u(i)),
 bcnt AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2),
 rtop AS (SELECT doc_id, max(cnt) AS top_cnt,
                 CAST(sum(cnt) AS BIGINT) AS bg_total
          FROM bcnt GROUP BY 1),
 rep AS (SELECT b.doc_id, b.dup_token_ratio,
                round(coalesce(t.top_cnt / t.bg_total, 0.0), 4)
                  AS top_bigram_frac
         FROM rbase b LEFT JOIN rtop t USING (doc_id)),
 gtoks AS (SELECT doc_id, {_TOKS.format(x='trim(lower(text))')} AS t
           FROM documents),
 grams AS (
   SELECT doc_id, array_to_string(list_slice(t, i, i + 3), ' ') AS gram
   FROM gtoks,
        UNNEST(CASE WHEN len(t) >= 4 THEN range(1, len(t) - 4 + 2)
               ELSE [] END) AS u(i)),
 bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 37 = 0),
 hits2 AS (SELECT g.doc_id, count(DISTINCT b.gram) AS n
           FROM grams g JOIN bench b USING (gram)
           WHERE g.doc_id % 37 <> 0 GROUP BY 1),
 dc AS (SELECT c.doc_id, coalesce(h.n, 0) > 0 AS contaminated
        FROM corpus c LEFT JOIN hits2 h USING (doc_id))
SELECT v.lang, v.source,
  count(*) AS n_docs,
  count(*) FILTER (v.verdict = 'kept') AS n_kept,
  count(*) FILTER (v.verdict = 'too_short') AS n_too_short,
  count(*) FILTER (v.verdict = 'low_alpha') AS n_low_alpha,
  count(*) FILTER (v.verdict = 'low_quality') AS n_low_quality,
  count(*) FILTER (v.verdict = 'wrong_lang') AS n_wrong_lang,
  CAST(sum(CASE WHEN dc.contaminated THEN 1 ELSE 0 END) AS BIGINT)
    AS n_contaminated,
  CAST(sum(CASE WHEN rep.top_bigram_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_high_repetition,
  CAST(sum(CAST(round(rep.dup_token_ratio * 10000, 0) AS BIGINT)) AS BIGINT)
    AS sum_dup_ratio_e4,
  CAST(sum(v.n_tokens) AS BIGINT) AS n_tokens_total
FROM v JOIN rep USING (doc_id) JOIN dc USING (doc_id)
GROUP BY 1, 2
"""


def q_ngram_jaccard_pairs(spark, sf_dir):
    from oplogtoredis_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir, par=True), "doc_id", "text", n=2, threshold=0.9,
        max_shingle_freq=50,
    )


SQL_NGRAM_JACCARD = f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(x='text')} AS t FROM documents),
 sh AS (SELECT DISTINCT doc_id, {_H31.format(x='g')} AS gh FROM (
   SELECT doc_id, unnest(CASE WHEN len(t) >= 2
     THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
     ELSE [] END) AS g FROM toks)),
 sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
 -- hot-shingle cap mirrors the Spark operator's max_shingle_freq=50:
 -- shingles in >50 docs are dropped from candidate generation only
 freq AS (SELECT gh FROM sh GROUP BY gh HAVING count(*) <= 50),
 shf AS (SELECT sh.* FROM sh JOIN freq USING (gh)),
 common AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) c
   FROM shf a JOIN shf b USING (gh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT id_a, id_b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE round(c * 1.0 / (sa.n + sb.n - c), 4) >= 0.9
"""


def q_minhash_signatures(spark, sf_dir):
    from oplogtoredis_spark.operators.dedup import minhash_signature

    return minhash_signature(_docs(spark, sf_dir, par=True), "doc_id", "text", n=2).withColumnRenamed(
        "id", "doc_id"
    )


def _sql_minhash_cols() -> str:
    cols = []
    for i in range(N_MINHASH):
        perm = f"(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MERSENNE31})"
        cols.append(
            f"list_min(list_transform(hs, h -> {perm})) AS m{i}"
        )
    return ",\n  ".join(cols)


SQL_MINHASH_SIGNATURES = f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(x='text')} AS t FROM documents),
 sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 2
     THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
     ELSE [] END) AS grams FROM toks),
 hs AS (SELECT doc_id, list_transform(grams, g -> {_H31.format(x='g')}) AS hs FROM sh)
SELECT doc_id, {_sql_minhash_cols()} FROM hs
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH near-dup pairs — the scale path end-to-end: 16 minhashes
    → 4 bands of 4 → band-bucket equality join → exact-Jaccard verify on
    candidates only. Every hash is the portable sha256-based arithmetic, so
    the oracle mirrors bands AND verify bit-for-bit."""
    from oplogtoredis_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs(spark, sf_dir, par=True), "doc_id", "text", n=2, bands=4,
        verify_threshold=0.7,
    )


def _sql_minhash_lsh(bands: int = 4, verify_threshold: float = 0.7) -> str:
    rows = N_MINHASH // bands
    perms = [
        f"list_min(list_transform(hs, h -> (({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MERSENNE31})))"
        for i in range(N_MINHASH)
    ]
    sig_cols = ",\n   ".join(f"{p} AS m{i}" for i, p in enumerate(perms))
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_no, {h} AS bh FROM sig".format(
            b=b,
            h=_H31.format(
                x="'"
                + str(b)
                + "_' || "
                + " || '_' || ".join(
                    f"m{b * rows + r}::VARCHAR" for r in range(rows)
                )
            ),
        )
        for b in range(bands)
    )
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS.format(x='text')} AS t FROM documents),
 grams AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 2
     THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
     ELSE [] END) AS g FROM toks),
 hs AS (SELECT doc_id, list_transform(g, x -> {_H31.format(x='x')}) AS hs
        FROM grams WHERE len(g) > 0),
 sig AS (SELECT doc_id, {sig_cols} FROM hs),
 bands AS ({band_rows}),
 cand AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
          FROM bands a JOIN bands b ON a.band_no = b.band_no AND a.bh = b.bh
          WHERE a.doc_id < b.doc_id),
 -- exact verify GATED ON THE CANDIDATES (mirrors
 -- dedup.jaccard_verify_candidates): per-doc shingle-hash sets joined to
 -- the candidate pairs, intersection per pair — O(candidates), no
 -- corpus-wide pair enumeration anywhere
 sets AS (SELECT doc_id, list_distinct(list_transform(g, x -> {_H31.format(x='x')})) AS hs
          FROM grams),
 sized AS (SELECT doc_id, hs, len(hs) AS n FROM sets),
 j AS (SELECT c.id_a, c.id_b,
              len(list_intersect(sa.hs, sb.hs)) AS ncom, sa.n AS na, sb.n AS nb
       FROM cand c JOIN sized sa ON sa.doc_id = c.id_a
                   JOIN sized sb ON sb.doc_id = c.id_b)
SELECT id_a, id_b, round(ncom * 1.0 / (na + nb - ncom), 4) AS jaccard
FROM j WHERE round(ncom * 1.0 / (na + nb - ncom), 4) >= {verify_threshold}
"""


SQL_MINHASH_LSH_PAIRS = _sql_minhash_lsh()


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER resolution: n-gram-Jaccard pairs (tau=0.9) resolved
    into connected components by iterative min-label propagation — the
    canonical post-pair dedup step (cluster_id = smallest member = the
    survivor). Oracle: DuckDB recursive CTE transitive closure."""
    from oplogtoredis_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs

    docs = _docs(spark, sf_dir, par=True)
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.9,
                                max_shingle_freq=50)
    return dedup_clusters(pairs, docs, id_col="doc_id")


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE toks AS (SELECT doc_id, {_TOKS.format(x='text')} AS t FROM documents),
 sh AS (SELECT DISTINCT doc_id, {_H31.format(x='g')} AS gh FROM (
   SELECT doc_id, unnest(CASE WHEN len(t) >= 2
     THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
     ELSE [] END) AS g FROM toks)),
 sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
 freq AS (SELECT gh FROM sh GROUP BY gh HAVING count(*) <= 50),
 shf AS (SELECT sh.* FROM sh JOIN freq USING (gh)),
 common AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) c
   FROM shf a JOIN shf b USING (gh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
 pairs AS (SELECT id_a, id_b
   FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
   WHERE round(c * 1.0 / (sa.n + sb.n - c), 4) >= 0.9),
 edges AS (SELECT id_a s, id_b d FROM pairs UNION SELECT id_b, id_a FROM pairs),
 reach (id, label) AS (
   SELECT doc_id, doc_id FROM documents
   UNION
   SELECT e.s, r.label FROM edges e JOIN reach r ON r.id = e.d
 )
SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id
"""

SQL_FUZZY_DEDUP_PIPELINE = _sql_fuzzy_dedup_pipeline().format(
    clusters=SQL_DEDUP_CLUSTERS
)



def q_simhash(spark, sf_dir):
    from oplogtoredis_spark.operators.dedup import simhash16

    return simhash16(_docs(spark, sf_dir, par=True), "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )


def _sql_simhash() -> str:
    sums = ",\n    ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(16)
    )
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS.format(x='text')}) AS w FROM documents),
 h AS (SELECT doc_id, {_H31.format(x='w')} AS h FROM tok),
 bits AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
SELECT doc_id, ({fp})::BIGINT AS simhash FROM bits
"""


SQL_SIMHASH = _sql_simhash()


def q_embedding_dup_pairs(spark, sf_dir):
    """Embedding near-dup pairs via the LSH-bucketed scale path (equality
    joins on (table, sign-bucket), exact cosine verify on candidates only —
    no all-pairs product; plan pinned in tests/test_dedup.py). Brute force
    (embedding_cosine_pairs) remains the pytest recall baseline only."""
    from oplogtoredis_spark.operators.dedup import embedding_dup_pairs_lsh

    return embedding_dup_pairs_lsh(
        _emb(spark, sf_dir), "vec_id", "embedding",
        threshold=0.4, n_planes=4, n_tables=8,
    )


def q_ann_bruteforce_topk(spark, sf_dir):
    from oplogtoredis_spark.operators.similarity import cosine_topk_bruteforce

    emb = _emb(spark, sf_dir)
    return cosine_topk_bruteforce(emb, emb.where(F.col("vec_id") < 3), k=5)


SQL_ANN_BRUTEFORCE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
 q AS (SELECT * FROM v WHERE vec_id < 3),
 s AS (SELECT q.vec_id query_id, v.vec_id neighbor_id,
   round(list_dot_product(q.e, v.e) /
         (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(v.e, v.e))), 4) cosine
   FROM v, q WHERE v.vec_id != q.vec_id)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) rank
  FROM s) WHERE rank <= 5
"""


def q_ann_lsh_topk(spark, sf_dir):
    """Multi-table LSH ANN — the 100 TB scale path. The LCG hyperplane
    arithmetic (operators/similarity.py:21-24) is portable integer math, so
    the DuckDB oracle below reproduces buckets, candidates, and the exact
    re-rank bit-for-bit; tests/test_similarity.py additionally pins recall
    vs brute force."""
    from oplogtoredis_spark.operators.similarity import ann_lsh_bucketed

    emb = _emb(spark, sf_dir)
    return ann_lsh_bucketed(
        emb, emb.where(F.col("vec_id") < 3), k=5, n_planes=4, n_tables=8
    )


def _sql_lsh_buckets(n_planes: int, n_tables: int) -> str:
    """Shared DuckDB CTEs (v, tb, bk) mirroring lsh_bucket: same LCG plane
    weights w(p,d) = ((1103515245*(p*1024+d)+12345) % 2000)/1000.0 - 1.0
    (all operands positive, so BIGINT % matches Spark's long %), same
    sign-bit bucket per table. DuckDB list_transform indices are 1-based →
    (i-1) is the Spark dim d; list_sum folds left like F.aggregate, so the
    proj sign matches."""

    def proj(p_expr: str) -> str:
        w = f"((((1103515245::BIGINT * (({p_expr}) * 1024 + (i - 1)) + 12345) % 2000) / 1000.0) - 1.0)"
        return f"list_sum(list_transform(e, (x, i) -> x * {w}))"

    bucket = " + ".join(
        f"(CASE WHEN {proj(f'tbl * {n_planes} + {p}')} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"""
 v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
 tb AS (SELECT vec_id, e, unnest(range({n_tables})) AS tbl FROM v),
 bk AS (SELECT vec_id, e, tbl, ({bucket})::BIGINT AS bkt FROM tb)"""


SQL_EMBEDDING_DUP_PAIRS = f"""
WITH {_sql_lsh_buckets(n_planes=4, n_tables=8)},
 cand AS (SELECT DISTINCT a.vec_id id_a, b.vec_id id_b
          FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bkt = b.bkt
          WHERE a.vec_id < b.vec_id),
 s AS (SELECT id_a, id_b,
   round(list_dot_product(va.e, vb.e) /
         (sqrt(list_dot_product(va.e, va.e)) * sqrt(list_dot_product(vb.e, vb.e))), 4) AS cosine
   FROM cand JOIN v va ON va.vec_id = id_a JOIN v vb ON vb.vec_id = id_b)
SELECT * FROM s WHERE cosine >= 0.4
"""


def _sql_ann_lsh(n_planes: int = 4, n_tables: int = 8, k: int = 5) -> str:
    """DuckDB mirror of ann_lsh_bucketed: shared bucket CTEs + candidate
    equality-join + exact cosine re-rank with (cosine DESC, id ASC) ties."""
    return f"""
WITH {_sql_lsh_buckets(n_planes, n_tables)},
 q AS (SELECT * FROM bk WHERE vec_id < 3),
 cand AS (SELECT DISTINCT q.vec_id qid, c.vec_id nid
          FROM bk c JOIN q ON c.tbl = q.tbl AND c.bkt = q.bkt
          WHERE c.vec_id != q.vec_id),
 scored AS (SELECT qid query_id, nid neighbor_id,
    round(list_dot_product(qv.e, cv.e) /
          (sqrt(list_dot_product(qv.e, qv.e)) * sqrt(list_dot_product(cv.e, cv.e))), 4) AS cosine
   FROM cand JOIN v qv ON qv.vec_id = cand.qid JOIN v cv ON cv.vec_id = cand.nid)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored) WHERE rank <= {k}
"""


SQL_ANN_LSH = _sql_ann_lsh()


def q_embedding_clusters(spark, sf_dir):
    """K-means-style clustering of the whole embedding corpus
    (operators/similarity.py embedding_clusters — the SemDeDup /
    corpus-organization primitive): deterministic sampled-Lloyd centroids
    (bounded build, no RNG), every vector assigned to its nearest centroid
    via a broadcast + map-side partial max_by; the corpus's only shuffle is
    the per-vector aggregation. Oracle = the IVF oracle's build+assignment
    prefix, so Spark and DuckDB produce identical cluster ids."""
    from oplogtoredis_spark.operators.similarity import embedding_clusters

    return embedding_clusters(
        _emb(spark, sf_dir), n_centroids=8, sample_per_centroid=32
    )


#: the IVF oracle's centroid-build + full-assignment prefix, reused
#: verbatim (same CTE names) with the assignment as the result
SQL_EMBEDDING_CLUSTERS = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
 vn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v),
 smp AS (SELECT * FROM vn ORDER BY vec_id LIMIT 256),
 seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce,
                  nrm AS cenorm
           FROM smp ORDER BY vec_id LIMIT 8),
 a1 AS (SELECT vec_id, cid FROM (
    SELECT smp.vec_id, s.cid,
      row_number() OVER (PARTITION BY smp.vec_id
        ORDER BY round(list_dot_product(smp.e, s.ce) / (smp.nrm * s.cenorm), 4)
          DESC, s.cid ASC) rn
    FROM smp, seeds s) WHERE rn = 1),
 ex AS (SELECT vec_id, u.d AS d, u.x AS x FROM (
    SELECT vec_id,
           unnest(list_transform(e, (x, i) -> struct_pack(d := i - 1, x := x))) u
    FROM smp)),
 mm AS (SELECT cid, d, avg(x) mx FROM ex JOIN a1 USING (vec_id) GROUP BY cid, d),
 cents AS (SELECT cid, list(mx ORDER BY d) ce FROM mm GROUP BY cid),
 cn AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) cenorm FROM cents)
SELECT vec_id, cid FROM (
    SELECT vn.vec_id, c.cid,
      row_number() OVER (PARTITION BY vn.vec_id
        ORDER BY round(list_dot_product(vn.e, c.ce) / (vn.nrm * c.cenorm), 4)
          DESC, c.cid ASC) rn
    FROM vn, cn c) WHERE rn = 1
"""


def q_semdedup_keep(spark, sf_dir):
    """SemDeDup semantic dedup (operators/dedup.py semdedup_keep, after
    Abbas et al. 2023): cluster the embedding corpus with the deterministic
    sampled-Lloyd build, then prune — within each cluster only — every
    vector with a smaller-id cluster-mate at rounded cosine >= 0.4; the
    pairwise check is an equality self-join on cid (Σ|cluster|², never n²).
    Oracle = the clusters SQL + the same within-cluster anti-join."""
    from oplogtoredis_spark.operators.dedup import semdedup_keep

    return semdedup_keep(
        _emb(spark, sf_dir), threshold=0.4, n_centroids=8,
        sample_per_centroid=32,
    )


#: the embedding_clusters oracle with the assignment as a CTE, plus the
#: within-cluster smaller-id-wins prune (rounded cosine, same as Spark)
SQL_SEMDEDUP_KEEP = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
 vn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v),
 smp AS (SELECT * FROM vn ORDER BY vec_id LIMIT 256),
 seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce,
                  nrm AS cenorm
           FROM smp ORDER BY vec_id LIMIT 8),
 a1 AS (SELECT vec_id, cid FROM (
    SELECT smp.vec_id, s.cid,
      row_number() OVER (PARTITION BY smp.vec_id
        ORDER BY round(list_dot_product(smp.e, s.ce) / (smp.nrm * s.cenorm), 4)
          DESC, s.cid ASC) rn
    FROM smp, seeds s) WHERE rn = 1),
 ex AS (SELECT vec_id, u.d AS d, u.x AS x FROM (
    SELECT vec_id,
           unnest(list_transform(e, (x, i) -> struct_pack(d := i - 1, x := x))) u
    FROM smp)),
 mm AS (SELECT cid, d, avg(x) mx FROM ex JOIN a1 USING (vec_id) GROUP BY cid, d),
 cents AS (SELECT cid, list(mx ORDER BY d) ce FROM mm GROUP BY cid),
 cn AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) cenorm FROM cents),
 asg AS (SELECT vec_id, cid FROM (
    SELECT vn.vec_id, c.cid,
      row_number() OVER (PARTITION BY vn.vec_id
        ORDER BY round(list_dot_product(vn.e, c.ce) / (vn.nrm * c.cenorm), 4)
          DESC, c.cid ASC) rn
    FROM vn, cn c) WHERE rn = 1),
 dups AS (SELECT DISTINCT b.vec_id FROM asg a JOIN asg b USING (cid)
    JOIN vn x ON x.vec_id = a.vec_id JOIN vn y ON y.vec_id = b.vec_id
    WHERE a.vec_id < b.vec_id
      AND round(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 4) >= 0.4)
SELECT vec_id, cid FROM asg ANTI JOIN dups USING (vec_id)
"""


def q_cluster_balanced_sample(spark, sf_dir):
    """Cluster-balanced corpus selection — the curriculum/diversity-cap
    composition SemDeDup-style pipelines end with: cluster the embedding
    corpus (embedding_clusters, deterministic), join each document to its
    semantic cluster, keep the top 16 per cluster by length (ties to the
    smaller doc_id). topk_per_group compiles to WindowGroupLimit, so each
    map task pre-prunes to k rows per cluster BEFORE the shuffle — a
    skewed cluster ships O(k × map_tasks) rows, never its cardinality."""
    from oplogtoredis_spark.operators.analytics import topk_per_group
    from oplogtoredis_spark.operators.similarity import embedding_clusters

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    cl = embedding_clusters(
        _emb(spark, sf_dir), n_centroids=8, sample_per_centroid=32
    ).withColumnRenamed("vec_id", "doc_id")
    return topk_per_group(
        docs.join(cl, "doc_id"), ["cid"], "n_chars", 16, "doc_id"
    ).select("doc_id", "cid", "n_chars", "rk")


#: the embedding_clusters oracle as a CTE + documents join + per-cluster
#: top-16 by (n_chars DESC, doc_id ASC)
SQL_CLUSTER_BALANCED_SAMPLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
 vn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v),
 smp AS (SELECT * FROM vn ORDER BY vec_id LIMIT 256),
 seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce,
                  nrm AS cenorm
           FROM smp ORDER BY vec_id LIMIT 8),
 a1 AS (SELECT vec_id, cid FROM (
    SELECT smp.vec_id, s.cid,
      row_number() OVER (PARTITION BY smp.vec_id
        ORDER BY round(list_dot_product(smp.e, s.ce) / (smp.nrm * s.cenorm), 4)
          DESC, s.cid ASC) rn
    FROM smp, seeds s) WHERE rn = 1),
 ex AS (SELECT vec_id, u.d AS d, u.x AS x FROM (
    SELECT vec_id,
           unnest(list_transform(e, (x, i) -> struct_pack(d := i - 1, x := x))) u
    FROM smp)),
 mm AS (SELECT cid, d, avg(x) mx FROM ex JOIN a1 USING (vec_id) GROUP BY cid, d),
 cents AS (SELECT cid, list(mx ORDER BY d) ce FROM mm GROUP BY cid),
 cn AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) cenorm FROM cents),
 asg AS (SELECT vec_id, cid FROM (
    SELECT vn.vec_id, c.cid,
      row_number() OVER (PARTITION BY vn.vec_id
        ORDER BY round(list_dot_product(vn.e, c.ce) / (vn.nrm * c.cenorm), 4)
          DESC, c.cid ASC) rn
    FROM vn, cn c) WHERE rn = 1)
SELECT doc_id, cid, n_chars, rk FROM (
  SELECT d.doc_id, a.cid, d.n_chars,
    row_number() OVER (PARTITION BY a.cid
      ORDER BY d.n_chars DESC, d.doc_id ASC) rk
  FROM documents d JOIN asg a ON a.vec_id = d.doc_id)
WHERE rk <= 16
"""


def q_incremental_semdedup(spark, sf_dir):
    """INCREMENTAL SemDeDup (operators/semantic_corpus.py SemanticCorpus):
    the embeddings table replayed as three CDC epochs with real churn —
    epoch 1 inserts ids <256 (the centroid sample) plus every id%3==0;
    epoch 2 inserts id%3==1 and DELETES the %3==0,%7==3 subset (deletes
    genuinely promote pruned cluster-mates mid-stream); epoch 3 inserts
    id%3==2 and re-inserts the deleted ids. Keep seats are re-elected only
    within each epoch's affected clusters under the frozen coarse
    quantizer; final live state = the full table, so the oracle is the
    batch semdedup SQL UNCHANGED — value-exact convergence through churn."""
    import tempfile

    from oplogtoredis_spark.operators.semantic_corpus import SemanticCorpus

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    state = SemanticCorpus(
        _scratch_dir(prefix="otr_semdedup_"),
        threshold=0.4, n_centroids=8, sample_per_centroid=32,
    )
    vid = F.col("vec_id")
    deleted = (vid >= 256) & (vid % 3 == 0) & (vid % 7 == 3)
    epochs = [
        emb.where((vid < 256) | (vid % 3 == 0)).select(
            vid.alias("doc_id"), "embedding", F.lit("u").alias("op")
        ),
        emb.where((vid >= 256) & (vid % 3 == 1)).select(
            vid.alias("doc_id"), "embedding", F.lit("u").alias("op")
        ).unionByName(
            emb.where(deleted).select(
                vid.alias("doc_id"),
                F.lit(None).cast("array<double>").alias("embedding"),
                F.lit("d").alias("op"),
            )
        ),
        emb.where(((vid >= 256) & (vid % 3 == 2)) | deleted).select(
            vid.alias("doc_id"), "embedding", F.lit("u").alias("op")
        ),
    ]
    for e, batch in enumerate(epochs, start=1):
        state.apply_epoch(spark, batch, e)
    return state.kept(spark).select(F.col("doc_id").alias("vec_id"), "cid")


def q_follow_lake_semdedup(spark, sf_dir):
    """The full CDC-lake → SEMANTIC-dedup composition
    (SemanticCorpus.follow_lake + LakeTable.changes): embeddings ride a
    REAL lake as JSON change envelopes across two commits — commit 1
    inserts the centroid sample (ids <256) plus every id%3==0, with a
    SIGN-FLIPPED draft vector for the %7==3 subset (wrong-direction
    embeddings that will be re-embedded) and extra ids that will be
    deleted; commit 2 inserts the rest, overwrites the drafts with their
    true vectors (cluster moves + keep-seat re-elections), and deletes the
    extras. The keep set follows each snapshot via the net changelog under
    the frozen coarse quantizer; final live state = the full embeddings
    table, so the oracle is the batch semdedup SQL UNCHANGED."""
    import tempfile

    from oplogtoredis_spark.operators.semantic_corpus import SemanticCorpus
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    vid = F.col("vec_id")

    def env(df, ts, op="u"):
        return df.select(
            F.lit("emb").alias("repo"),
            vid.cast("string").alias("path"),
            F.lit(ts << 32).cast("long").alias("ts"),
            vid.cast("int").alias("tx_idx"),
            F.lit(op).alias("op"),
            F.lit(f"c{ts}").alias("commit"),
            F.lit("en").alias("lang"),
            F.to_json(F.col("v")).alias("content"),
        )

    t = LakeTable.create(
        _scratch_dir(prefix="otr_flsem_") + "/tbl", TARGET_SCHEMA,
        n_buckets=8,
    )
    state = SemanticCorpus(
        _scratch_dir(prefix="otr_flsem_c_"),
        threshold=0.4, n_centroids=8, sample_per_centroid=32,
    )
    first = emb.where((vid < 256) | (vid % 3 == 0))
    is_draft = (vid >= 256) & (vid % 7 == 3)
    drafts = first.where(is_draft).withColumn(
        "v", F.transform(F.col("v"), lambda x: -x)
    )
    extras = emb.where(vid % 11 == 0).select(
        (vid + 1000000).alias("vec_id"), "v"
    )
    # data-scaled epoch width: MB-scale fixture epochs at the
    # session's 128 analytics reduce width were pure task-launch
    # overhead (the _epoch_shuffle_scale discipline; scoped to the
    # core count, never a constant)
    with _stream_state_parallelism(spark):
        t.merge_batch(
            env(first.where(~is_draft).unionByName(drafts)
                .unionByName(extras), 1),
            0,
            prune=False,
        )
        state.follow_lake(spark, t, repo="emb")
        upserts = emb.where(
            ((vid >= 256) & (vid % 3 != 0)) | ((vid % 3 == 0) & is_draft)
        )
        t.merge_batch(env(upserts, 2).unionByName(env(extras, 2, op="d")), 1,
                      prune=False)
        state.follow_lake(spark, t, repo="emb")
    return state.kept(spark).select(F.col("doc_id").alias("vec_id"), "cid")


def q_ann_ivf_topk(spark, sf_dir):
    """IVF (inverted-file) ANN — the second classic scale path beside LSH:
    deterministic coarse quantizer (seeded k-means over the bounded
    smallest-id 256-vector sample, one relational Lloyd round), inverted
    lists as the partitioning, n_probe lists re-ranked exactly per query
    (operators/similarity.py ann_ivf_topk). Everything is seeded
    integer/rounded-double math over a deterministic sample, so the DuckDB
    oracle rebuilds the same centroids, lists, probes, and ranks."""
    from oplogtoredis_spark.operators.similarity import ann_ivf_topk

    emb = _emb(spark, sf_dir)
    return ann_ivf_topk(
        emb, emb.where(F.col("vec_id") < 3), k=5, n_centroids=8, n_probe=3,
        sample_per_centroid=32,
    )


SQL_ANN_IVF = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
 vn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v),
 smp AS (SELECT * FROM vn ORDER BY vec_id LIMIT 256),
 seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce,
                  nrm AS cenorm
           FROM smp ORDER BY vec_id LIMIT 8),
 a1 AS (SELECT vec_id, cid FROM (
    SELECT smp.vec_id, s.cid,
      row_number() OVER (PARTITION BY smp.vec_id
        ORDER BY round(list_dot_product(smp.e, s.ce) / (smp.nrm * s.cenorm), 4)
          DESC, s.cid ASC) rn
    FROM smp, seeds s) WHERE rn = 1),
 ex AS (SELECT vec_id, u.d AS d, u.x AS x FROM (
    SELECT vec_id,
           unnest(list_transform(e, (x, i) -> struct_pack(d := i - 1, x := x))) u
    FROM smp)),
 mm AS (SELECT cid, d, avg(x) mx FROM ex JOIN a1 USING (vec_id) GROUP BY cid, d),
 cents AS (SELECT cid, list(mx ORDER BY d) ce FROM mm GROUP BY cid),
 cn AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) cenorm FROM cents),
 a2 AS (SELECT vec_id AS nid, cid FROM (
    SELECT vn.vec_id, c.cid,
      row_number() OVER (PARTITION BY vn.vec_id
        ORDER BY round(list_dot_product(vn.e, c.ce) / (vn.nrm * c.cenorm), 4)
          DESC, c.cid ASC) rn
    FROM vn, cn c) WHERE rn = 1),
 q AS (SELECT vec_id qid, e qe, nrm qnorm FROM vn WHERE vec_id < 3),
 probes AS (SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
      row_number() OVER (PARTITION BY q.qid
        ORDER BY round(list_dot_product(q.qe, c.ce) / (q.qnorm * c.cenorm), 4)
          DESC, c.cid ASC) pr
    FROM q, cn c) WHERE pr <= 3),
 cand AS (SELECT qid, nid FROM probes JOIN a2 USING (cid) WHERE nid != qid),
 scored AS (SELECT qid query_id, nid neighbor_id,
    round(list_dot_product(qv.e, cv.e) / (qv.nrm * cv.nrm), 4) cosine
   FROM cand JOIN vn qv ON qv.vec_id = cand.qid JOIN vn cv ON cv.vec_id = cand.nid)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, neighbor_id ASC) rank
  FROM scored) WHERE rank <= 5
"""


def q_ann_quantized_topk(spark, sf_dir):
    """int8 scalar quantization + asymmetric top-k
    (operators/similarity.py): the ANN storage path — per-dimension
    (min, max) codebook from the bounded smallest-id 256-vector sample,
    codes in [0,255] (4-8x smaller than float vectors), exact cosine of
    float queries against DEQUANTIZED corpus vectors. Integer codes +
    identical double formulas make the whole path value-reproducible in
    DuckDB."""
    from oplogtoredis_spark.operators.similarity import ann_quantized_topk

    emb = _emb(spark, sf_dir)
    return ann_quantized_topk(
        emb, emb.where(F.col("vec_id") < 3), k=5, sample_k=256
    )


SQL_ANN_QUANTIZED = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
 smp AS (SELECT * FROM v ORDER BY vec_id LIMIT 256),
 ex AS (SELECT u.d AS d, u.x AS x FROM (
    SELECT unnest(list_transform(e, (x, i) -> struct_pack(d := i - 1, x := x))) u
    FROM smp)),
 per_d AS (SELECT d, min(x) AS mn, max(x) AS mx FROM ex GROUP BY d),
 st AS (SELECT list(mn ORDER BY d) AS mins, list(mx ORDER BY d) AS maxs FROM per_d),
 qz AS (SELECT vec_id AS nid,
          list_transform(v.e, (x, i) -> CASE WHEN st.maxs[i] - st.mins[i] = 0 THEN 0
            ELSE least(greatest(CAST(round((x - st.mins[i]) * 255.0
                     / (st.maxs[i] - st.mins[i]), 0) AS INT), 0), 255) END) AS qv
        FROM v, st),
 dq AS (SELECT nid,
          list_transform(qv, (q, i) -> st.mins[i]
              + q * (st.maxs[i] - st.mins[i]) / 255.0) AS cv
        FROM qz, st),
 dn AS (SELECT nid, cv, sqrt(list_dot_product(cv, cv)) AS cnorm FROM dq),
 qq AS (SELECT vec_id AS qid, e AS qe, sqrt(list_dot_product(e, e)) AS qnorm
        FROM v WHERE vec_id < 3),
 sc AS (SELECT qid AS query_id, nid AS neighbor_id,
          round(list_dot_product(qe, cv) / (qnorm * cnorm), 4) AS cosine_q
        FROM dn, qq WHERE nid != qid)
SELECT query_id, neighbor_id, rank, cosine_q FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine_q DESC, neighbor_id ASC) AS rank
  FROM sc) WHERE rank <= 5
"""


def q_ann_ivf_quantized_topk(spark, sf_dir):
    """IVF x int8 quantization (operators/similarity.py
    ann_ivf_quantized_topk) — the IVF-PQ-shaped 100 TB ANN posture
    (VERDICT r4 #4): inverted lists store int8 codes (4-8x smaller, so the
    probed lists stay executor-resident at 10^9 vectors), routing at ingest
    uses the float vector, and query-time scoring is asymmetric (float
    query x dequantized candidate). Both the coarse quantizer and the
    codebook come from the bounded smallest-id 256-vector sample, so the
    DuckDB oracle rebuilds the identical centroids, lists, codes, probes,
    and ranks."""
    from oplogtoredis_spark.operators.similarity import ann_ivf_quantized_topk

    emb = _emb(spark, sf_dir)
    return ann_ivf_quantized_topk(
        emb, emb.where(F.col("vec_id") < 3), k=5, n_centroids=8, n_probe=3,
        sample_per_centroid=32, sample_k=256,
    )


SQL_ANN_IVF_QUANTIZED = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
 vn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v),
 smp AS (SELECT * FROM vn ORDER BY vec_id LIMIT 256),
 seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce,
                  nrm AS cenorm
           FROM smp ORDER BY vec_id LIMIT 8),
 a1 AS (SELECT vec_id, cid FROM (
    SELECT smp.vec_id, s.cid,
      row_number() OVER (PARTITION BY smp.vec_id
        ORDER BY round(list_dot_product(smp.e, s.ce) / (smp.nrm * s.cenorm), 4)
          DESC, s.cid ASC) rn
    FROM smp, seeds s) WHERE rn = 1),
 ex AS (SELECT vec_id, u.d AS d, u.x AS x FROM (
    SELECT vec_id,
           unnest(list_transform(e, (x, i) -> struct_pack(d := i - 1, x := x))) u
    FROM smp)),
 mm AS (SELECT cid, d, avg(x) mx FROM ex JOIN a1 USING (vec_id) GROUP BY cid, d),
 cents AS (SELECT cid, list(mx ORDER BY d) ce FROM mm GROUP BY cid),
 cn AS (SELECT cid, ce, sqrt(list_dot_product(ce, ce)) cenorm FROM cents),
 a2 AS (SELECT vec_id AS nid, cid FROM (
    SELECT vn.vec_id, c.cid,
      row_number() OVER (PARTITION BY vn.vec_id
        ORDER BY round(list_dot_product(vn.e, c.ce) / (vn.nrm * c.cenorm), 4)
          DESC, c.cid ASC) rn
    FROM vn, cn c) WHERE rn = 1),
 per_d AS (SELECT u.d AS d, min(u.x) AS mn, max(u.x) AS mx FROM (
    SELECT unnest(list_transform(e, (x, i) -> struct_pack(d := i - 1, x := x))) u
    FROM smp) GROUP BY u.d),
 st AS (SELECT list(mn ORDER BY d) AS mins, list(mx ORDER BY d) AS maxs FROM per_d),
 qz AS (SELECT vec_id AS nid,
          list_transform(v.e, (x, i) -> CASE WHEN st.maxs[i] - st.mins[i] = 0 THEN 0
            ELSE least(greatest(CAST(round((x - st.mins[i]) * 255.0
                     / (st.maxs[i] - st.mins[i]), 0) AS INT), 0), 255) END) AS qv
        FROM v, st),
 dq AS (SELECT nid,
          list_transform(qv, (q, i) -> st.mins[i]
              + q * (st.maxs[i] - st.mins[i]) / 255.0) AS cv
        FROM qz, st),
 dn AS (SELECT nid, cv, sqrt(list_dot_product(cv, cv)) AS cnorm FROM dq),
 q AS (SELECT vec_id qid, e qe, nrm qnorm FROM vn WHERE vec_id < 3),
 probes AS (SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
      row_number() OVER (PARTITION BY q.qid
        ORDER BY round(list_dot_product(q.qe, c.ce) / (q.qnorm * c.cenorm), 4)
          DESC, c.cid ASC) pr
    FROM q, cn c) WHERE pr <= 3),
 cand AS (SELECT qid, nid FROM probes JOIN a2 USING (cid) WHERE nid != qid),
 scored AS (SELECT cand.qid query_id, cand.nid neighbor_id,
    round(list_dot_product(qv.qe, cv.cv) / (qv.qnorm * cv.cnorm), 4) cosine_q
   FROM cand JOIN q qv ON qv.qid = cand.qid JOIN dn cv ON cv.nid = cand.nid)
SELECT query_id, neighbor_id, rank, cosine_q FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine_q DESC, neighbor_id ASC) rank
  FROM scored) WHERE rank <= 5
"""


def q_simhash_dup_pairs(spark, sf_dir):
    """SimHash near-dup pairs over the production-width 60-bit fingerprint
    (two portable 31-bit hash lanes — operators/dedup.py simhash60): banded
    equality joins on 15-bit fingerprint slices (pigeonhole: hamming <= 3
    guarantees a shared slice), then ONE bit_count(xor) verify per
    candidate — O(candidates), the SimHash analogue of minhash_lsh_pairs."""
    from oplogtoredis_spark.operators.dedup import simhash_dup_pairs

    return simhash_dup_pairs(
        _docs(spark, sf_dir, par=True), "doc_id", "text", max_hamming=3, bands=4
    )


def _sql_simhash60() -> str:
    """DuckDB mirror of simhash60: bit b < 30 from lane h1, else lane h2."""
    sums = ",\n    ".join(
        f"sum(CASE WHEN ({'h1' if b < 30 else 'h2'} >> {b % 30}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS s{b}"
        for b in range(60)
    )
    fp = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(60)
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS.format(x='text')}) AS w FROM documents),
 h AS (SELECT doc_id, {_H31.format(x='w')} AS h1,
              {_H31.format(x="'s2#' || w")} AS h2 FROM tok),
 bits AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
SELECT doc_id, ({fp})::BIGINT AS simhash FROM bits
"""


SQL_SIMHASH_PAIRS = f"""
WITH sh AS ({_sql_simhash60()}),
 bands AS (SELECT doc_id, simhash, unnest(range(4)) AS band_no FROM sh),
 sl AS (SELECT doc_id, simhash, band_no,
               (simhash >> (band_no * 15)) & 32767 AS bv FROM bands),
 cand AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b,
                 a.simhash sa, b.simhash sb
          FROM sl a JOIN sl b USING (band_no, bv)
          WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
"""


def q_multimodal_stats(spark, sf_dir):
    """Binary-column plumbing + REAL decode: each document becomes a P6 PPM
    asset (ASCII header, dimensions derived from doc_id, text as payload);
    the zero-copy stats path (octet_length/sha2, native expressions) joins
    the Arrow-batched mapInPandas decode path running the pure-Python PPM
    codec in STRICT mode (no synthetic fallback) — the exact seam where
    PIL/ffmpeg plug in on a real cluster (operators/multimodal.py)."""
    from oplogtoredis_spark.operators.multimodal import asset_stats, decode_assets

    w = (F.col("doc_id") % 64 + 1).cast("int")
    h = (F.col("doc_id") % 32 + 1).cast("int")
    data = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"), F.col("text"),
    ).cast("binary")
    assets = _docs(spark, sf_dir, par=True).select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        data.alias("data"),
        F.lit(None).cast("string").alias("meta"),
    )
    stats = asset_stats(assets)
    dec = decode_assets(assets, strict=True).select(
        "asset_id", "codec", "width", "height", "frames"
    )
    return stats.join(dec, "asset_id")


def q_multimodal_features(spark, sf_dir):
    """REAL feature extraction through the multimodal seam: the same
    synthesized PPM assets as multimodal_stats, run through
    extract_features (operators/multimodal.py) — mean R/G/B computed in
    Python over the raw pixel payload inside the Arrow batch. The DuckDB
    oracle recomputes the byte means from the text payload (all-ASCII
    corpus), so even the pandas-UDF path is VALUE-checked, not just
    row-counted."""
    from oplogtoredis_spark.operators.multimodal import extract_features

    w = (F.col("doc_id") % 64 + 1).cast("int")
    h = (F.col("doc_id") % 32 + 1).cast("int")
    data = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"), F.col("text"),
    ).cast("binary")
    assets = _docs(spark, sf_dir, par=True).select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        data.alias("data"),
        F.lit(None).cast("string").alias("meta"),
    )
    return extract_features(assets, strict=True)


SQL_MULTIMODAL_FEATURES = """
WITH a AS (SELECT doc_id AS asset_id,
                  ((doc_id % 64) + 1)::INT AS w,
                  ((doc_id % 32) + 1)::INT AS h, text FROM documents),
 p AS (SELECT asset_id, least(length(text), w * h * 3)::INT AS plen, text FROM a),
 e AS (SELECT asset_id, plen, unnest(range(plen))::INT AS i, text
       FROM p WHERE plen > 0 AND plen % 3 = 0),
 v AS (SELECT asset_id, plen, i % 3 AS ch, ord(substr(text, i + 1, 1)) AS b FROM e),
 m AS (SELECT asset_id,
         round_even(sum(CASE WHEN ch = 0 THEN b END) * 3.0 / plen, 4) AS mean_r,
         round_even(sum(CASE WHEN ch = 1 THEN b END) * 3.0 / plen, 4) AS mean_g,
         round_even(sum(CASE WHEN ch = 2 THEN b END) * 3.0 / plen, 4) AS mean_b
       FROM v GROUP BY asset_id, plen)
SELECT a.asset_id, 'image' AS kind,
  CASE WHEN m.asset_id IS NOT NULL THEN 'ppm' END AS codec,
  m.mean_r, m.mean_g, m.mean_b,
  CAST(NULL AS DOUBLE) AS rms, CAST(NULL AS DOUBLE) AS duration_s
FROM a LEFT JOIN m USING (asset_id)
"""


SQL_MULTIMODAL_STATS = """
WITH a AS (SELECT doc_id AS asset_id,
  'P6' || chr(10) || (doc_id % 64 + 1)::VARCHAR || ' ' ||
  (doc_id % 32 + 1)::VARCHAR || chr(10) || '255' || chr(10) || text AS s,
  (doc_id % 64 + 1)::INT AS w, (doc_id % 32 + 1)::INT AS h
  FROM documents)
SELECT asset_id, 'image' AS kind, octet_length(encode(s)) AS n_bytes,
       sha256(s) AS data_sha256, 'ppm' AS codec, w AS width, h AS height,
       1 AS frames
FROM a
"""


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the CDC final-state apply
    (filters → LWW per key → routing hash/shard) — the batch expression of
    the engine's streaming MERGE pipeline."""
    return q_cdc_final_state(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_final_state": q_cdc_final_state,
        "source_scan_pushdown": q_source_scan_pushdown,
        "op_filter": q_op_filter,
        "denylist_filter": q_denylist_filter,
        "system_filter": q_system_filter,
        "txn_flatten": q_txn_flatten,
        "envelope_decode": q_envelope_decode,
        "namespace_split": q_namespace_split,
        "doc_id_extract": q_doc_id_extract,
        "changed_fields_v1": q_changed_fields_v1,
        "changed_fields_v2_shallow": q_changed_fields_v2_shallow,
        "changed_fields_v2_deep": q_changed_fields_v2_deep,
        "message_json": q_message_json,
        "channels": q_channels,
        "parallelism_key": q_parallelism_key,
        "publications": q_publications,
        "dedup_exact": q_dedup_exact,
        "lww_latest_per_user": q_lww_latest_per_user,
        "metrics_counts": q_metrics_counts,
        "metrics_histogram": q_metrics_histogram,
        "interval_max": q_interval_max,
        "asof_join_events": q_asof_join_events,
        "sessionize_events": q_sessionize_events,
        "scd2_user_history": q_scd2_user_history,
        "scd2_stream_history": q_scd2_stream_history,
        "enrich_stream_events": q_enrich_stream_events,
        "stream_interval_join_events": q_stream_interval_join_events,
        "funnel_stream_events": q_funnel_stream_events,
        "heavy_hitters_stream_events": q_heavy_hitters_stream_events,
        "dedup_exact_docs": q_dedup_exact_docs,
        "text_profile": q_text_profile,
        "bpe_train_docs": q_bpe_train_docs,
        "quality_filter": q_quality_filter,
        "chunk_documents": q_chunk_documents,
        "corpus_pipeline": q_corpus_pipeline,
        "follow_lake_corpus": q_follow_lake_corpus,
        "agg_view_lake": q_agg_view_lake,
        "wap_publish_lake": q_wap_publish_lake,
        "span_dedup_docs": q_span_dedup_docs,
        "decontaminate_ngram": q_decontaminate_ngram,
        "pii_redact": q_pii_redact,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_dup_pairs": q_simhash_dup_pairs,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "semdedup_keep": q_semdedup_keep,
        "incremental_semdedup": q_incremental_semdedup,
        "ann_ivf_quantized_topk": q_ann_ivf_quantized_topk,
        "bm25_topk_docs": q_bm25_topk_docs,
        "pagerank_user_graph": q_pagerank_user_graph,
        "dq_expectations": q_dq_expectations,
        "range_join_events": q_range_join_events,
        "bpe_tokens": q_bpe_tokens,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
        "mixture_resample_docs": q_mixture_resample,
        "lm_perplexity_docs": q_lm_perplexity,
        "incremental_corpus_pipeline": q_incremental_corpus_pipeline,
        "distinct_view_lake": q_distinct_view_lake,
        "index_view_lake": q_index_view_lake,
        "lake_read_clustered": q_lake_read_clustered,
        "lake_point_lookup": q_lake_point_lookup,
        "rebucket_lake": q_rebucket_lake,
        "schema_evolution_lake": q_schema_evolution_lake,
        "lake_read_tagged": q_lake_read_tagged,
        "lake_fsck": q_lake_fsck,
        "lake_changes": q_lake_changes,
        "fuzzy_dedup_pipeline": q_fuzzy_dedup_pipeline,
        "pack_chunks_docs": q_pack_chunks_docs,
        "doc_repetition": q_doc_repetition,
        "funnel_stages": q_funnel_stages,
        "event_value_percentiles": q_event_value_percentiles,
        "hopping_window_counts": q_hopping_window_counts,
        "retention_cohorts": q_retention_cohorts,
        "distinct_users_by_type": q_distinct_users_by_type,
        "corpus_hygiene_report": q_corpus_hygiene_report,
        "topk_users_by_type": q_topk_users_by_type,
        "props_field_histogram": q_props_field_histogram,
        "table_profile_events": q_table_profile_events,
        "value_trend_by_type": q_value_trend_by_type,
        "resample_value_by_type": q_resample_value_by_type,
        "zscore_anomalies_events": q_zscore_anomalies_events,
        "bloom_semi_join_events": q_bloom_semi_join_events,
        "rolling_value_by_user": q_rolling_value_by_user,
        "editdist_dup_pairs": q_editdist_dup_pairs,
        "mad_anomalies_events": q_mad_anomalies_events,
        "event_transitions": q_event_transitions,
        "ab_test_value": q_ab_test_value,
        "star_revenue_by_nation": q_star_revenue_by_nation,
        "salted_join_events": q_salted_join_events,
        "weighted_sample_docs": q_weighted_sample_docs,
        "inverted_index_stats": q_inverted_index_stats,
        "event_type_pivot": q_event_type_pivot,
        "rollup_value_by_type_day": q_rollup_value_by_type_day,
        "stream_dedup_events": q_stream_dedup_events,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_signatures": q_minhash_signatures,
        "dedup_clusters": q_dedup_clusters,
        "simhash": q_simhash,
        "ann_bruteforce_topk": q_ann_bruteforce_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_clusters": q_embedding_clusters,
        "follow_lake_semdedup": q_follow_lake_semdedup,
        "cluster_balanced_sample": q_cluster_balanced_sample,
        "ann_quantized_topk": q_ann_quantized_topk,
        "multimodal_stats": q_multimodal_stats,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_final_state": SQL_CDC_FINAL_STATE,
        "source_scan_pushdown": SQL_SOURCE_SCAN,
        "op_filter": SQL_OP_FILTER,
        "denylist_filter": SQL_DENYLIST_FILTER,
        "system_filter": SQL_SYSTEM_FILTER,
        "txn_flatten": SQL_TXN_FLATTEN,
        "envelope_decode": SQL_ENVELOPE_DECODE,
        "namespace_split": SQL_NAMESPACE_SPLIT,
        "doc_id_extract": SQL_DOC_ID_EXTRACT,
        "changed_fields_v1": SQL_CHANGED_FIELDS_V1,
        "changed_fields_v2_shallow": SQL_CHANGED_FIELDS_V2_SHALLOW,
        "changed_fields_v2_deep": SQL_CHANGED_FIELDS_V2_DEEP,
        "message_json": SQL_MESSAGE_JSON,
        "channels": SQL_CHANNELS,
        "parallelism_key": SQL_PARALLELISM_KEY,
        "publications": SQL_PUBLICATIONS,
        "dedup_exact": SQL_DEDUP_EXACT,
        "lww_latest_per_user": SQL_LWW_LATEST,
        "metrics_counts": SQL_METRICS_COUNTS,
        "metrics_histogram": SQL_METRICS_HISTOGRAM,
        "interval_max": SQL_INTERVAL_MAX,
        "asof_join_events": SQL_ASOF_JOIN,
        "sessionize_events": SQL_SESSIONS,
        "scd2_user_history": SQL_SCD2,
        "scd2_stream_history": SQL_SCD2_STREAM,
        "enrich_stream_events": SQL_ENRICH_STREAM,
        "stream_interval_join_events": SQL_STREAM_INTERVAL_JOIN,
        "funnel_stream_events": SQL_FUNNEL,
        "heavy_hitters_stream_events": SQL_HEAVY_HITTERS,
        "dedup_exact_docs": SQL_DEDUP_EXACT_DOCS,
        "text_profile": SQL_TEXT_PROFILE,
        "bpe_train_docs": SQL_BPE_TRAIN,
        "quality_filter": SQL_QUALITY_FILTER,
        "chunk_documents": SQL_CHUNK_DOCUMENTS,
        "corpus_pipeline": SQL_CORPUS_PIPELINE,
        "follow_lake_corpus": SQL_CORPUS_PIPELINE,
        "agg_view_lake": SQL_AGG_VIEW,
        "wap_publish_lake": SQL_WAP_PUBLISH,
        "span_dedup_docs": SQL_SPAN_DEDUP,
        "decontaminate_ngram": SQL_DECONTAMINATE,
        "pii_redact": SQL_PII_REDACT,
        "minhash_lsh_pairs": SQL_MINHASH_LSH_PAIRS,
        "simhash_dup_pairs": SQL_SIMHASH_PAIRS,
        "embedding_dup_pairs": SQL_EMBEDDING_DUP_PAIRS,
        "semdedup_keep": SQL_SEMDEDUP_KEEP,
        "incremental_semdedup": SQL_SEMDEDUP_KEEP,
        "ann_ivf_quantized_topk": SQL_ANN_IVF_QUANTIZED,
        "bm25_topk_docs": SQL_BM25_TOPK,
        "pagerank_user_graph": _sql_pagerank(),
        "dq_expectations": SQL_DQ,
        "range_join_events": SQL_RANGE_JOIN,
        "bpe_tokens": SQL_BPE_TOKENS,
        "hash_split": SQL_HASH_SPLIT,
        "stratified_sample": SQL_STRATIFIED_SAMPLE,
        "mixture_resample_docs": SQL_MIXTURE_RESAMPLE,
        "lm_perplexity_docs": SQL_LM_PERPLEXITY,
        "incremental_corpus_pipeline": SQL_CORPUS_PIPELINE,
        "distinct_view_lake": SQL_DISTINCT_VIEW,
        "index_view_lake": SQL_INVERTED_INDEX,
        "lake_read_clustered": SQL_LAKE_READ_CLUSTERED,
        "lake_point_lookup": SQL_LAKE_POINT_LOOKUP,
        "rebucket_lake": SQL_REBUCKET_LAKE,
        "schema_evolution_lake": SQL_SCHEMA_EVOLUTION,
        "lake_read_tagged": SQL_LAKE_READ_TAGGED,
        "lake_fsck": SQL_LAKE_FSCK,
        "lake_changes": SQL_LAKE_CHANGES,
        "fuzzy_dedup_pipeline": SQL_FUZZY_DEDUP_PIPELINE,
        "pack_chunks_docs": SQL_PACK_CHUNKS,
        "doc_repetition": SQL_DOC_REPETITION,
        "funnel_stages": SQL_FUNNEL,
        "event_value_percentiles": SQL_EVENT_PERCENTILES,
        "hopping_window_counts": SQL_HOPPING_WINDOWS,
        "retention_cohorts": SQL_RETENTION,
        "distinct_users_by_type": SQL_DISTINCT_USERS,
        "corpus_hygiene_report": SQL_CORPUS_HYGIENE_REPORT,
        "topk_users_by_type": SQL_TOPK_USERS,
        "props_field_histogram": SQL_PROPS_HISTOGRAM,
        "table_profile_events": SQL_TABLE_PROFILE,
        "value_trend_by_type": SQL_VALUE_TREND,
        "resample_value_by_type": SQL_RESAMPLE,
        "zscore_anomalies_events": SQL_ZSCORE,
        "bloom_semi_join_events": SQL_BLOOM_SEMI_JOIN,
        "rolling_value_by_user": SQL_ROLLING,
        "editdist_dup_pairs": SQL_EDITDIST,
        "mad_anomalies_events": SQL_MAD,
        "event_transitions": SQL_TRANSITIONS,
        "ab_test_value": SQL_AB_TEST,
        "star_revenue_by_nation": SQL_STAR_REVENUE,
        "salted_join_events": SQL_SALTED_JOIN,
        "weighted_sample_docs": _sql_weighted_sample(),
        "inverted_index_stats": SQL_INVERTED_INDEX,
        "event_type_pivot": SQL_EVENT_TYPE_PIVOT,
        "rollup_value_by_type_day": SQL_ROLLUP_VALUE,
        "stream_dedup_events": SQL_STREAM_DEDUP,
        "ngram_jaccard_pairs": SQL_NGRAM_JACCARD,
        "minhash_signatures": SQL_MINHASH_SIGNATURES,
        "dedup_clusters": SQL_DEDUP_CLUSTERS,
        "simhash": SQL_SIMHASH,
        "ann_bruteforce_topk": SQL_ANN_BRUTEFORCE,
        "ann_lsh_topk": SQL_ANN_LSH,
        "ann_ivf_topk": SQL_ANN_IVF,
        "embedding_clusters": SQL_EMBEDDING_CLUSTERS,
        "follow_lake_semdedup": SQL_SEMDEDUP_KEEP,
        "cluster_balanced_sample": SQL_CLUSTER_BALANCED_SAMPLE,
        "ann_quantized_topk": SQL_ANN_QUANTIZED,
        "multimodal_stats": SQL_MULTIMODAL_STATS,
        "multimodal_features": SQL_MULTIMODAL_FEATURES,
    }
