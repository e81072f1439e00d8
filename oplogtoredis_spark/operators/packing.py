"""Deterministic sequence packing: assign chunks to fixed token-budget
training shards and give each chunk its position and token offset within
the shard — the step between a chunked corpus and pretraining data files.

Classic greedy bin packing is a SEQUENTIAL fold (each placement depends on
every earlier one) — the one shape that cannot parallelize; at 100 TB it is
a non-starter. The scalable posture mirrors this repo's sampling design:
derive placement from the portable content hash.

  1. ONE aggregate computes the corpus' total token mass; the shard count
     is ``ceil(total / budget)`` (a single driver-side row, like the bloom
     builder's bounded collect).
  2. ``shard_id = pmod(portable_hash64(id·salt), n_shards)`` — map-side,
     deterministic at any parallelism, reproducible across engines. Shards
     receive ``budget`` tokens in EXPECTATION (variance ~ chunk_size/budget;
     hard-capping would reintroduce the sequential fold — stated, not
     hidden).
  3. Within a shard, position (``pack_pos``) and cumulative token offset
     (``token_offset``) come from a window ordered by the hash draw with
     the id as tiebreak — a total order, so output is partition-order
     invariant. Each window partition is ONE shard ≈ ``budget`` tokens:
     bounded, no global window, hot-key-free by construction.

Plan: one agg job + one window shuffle keyed by shard_id. Null token
counts are caller errors (chunk_documents never emits them) and FAIL
LOUDLY naming the offending id — window SUM would otherwise skip them
silently, producing well-formed but wrong offsets downstream.

Reference scope note: the reference (tulip/oplogtoredis) has no corpus
operators; this belongs to the training-data-pipeline surface the build
brief adds beyond SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import portable_hash64

_INTERNAL = ("_pack_h", "shard_id", "pack_pos", "token_offset")


def pack_chunks(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    id_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    budget: int = 4096,
    salt: str = "",
    n_shards: int | None = None,
) -> DataFrame:
    """Add ``shard_id`` / ``pack_pos`` / ``token_offset`` to a chunk table.

    ``n_shards`` overrides the budget-derived count (pass it when the
    caller already knows the shard layout — e.g. repacking into an existing
    file set); otherwise ONE count job derives it from the total token
    mass. ``salt`` draws an independent packing of the same corpus.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if not id_cols:
        raise ValueError("id_cols must name at least one column")
    clash = [c for c in df.columns if c in _INTERNAL]
    if clash:
        raise ValueError(f"input columns collide with outputs: {clash}")
    if n_shards is None:
        total = df.agg(F.sum(tokens_col)).first()[0] or 0
        n_shards = max(1, -(-int(total) // budget))  # ceil
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    h = portable_hash64(F.concat(key, F.lit(salt)))
    # a NULL token count would be silently SKIPPED by the window sum, and a
    # NEGATIVE one silently folds into it — offsets would come out
    # well-formed but wrong either way; fail naming the chunk (ADVICE r5)
    guarded_tokens = F.when(
        F.col(tokens_col).isNull() | (F.col(tokens_col) < 0),
        F.raise_error(
            F.concat(
                F.lit(f"pack_chunks: NULL/negative {tokens_col} for "), key
            )
        ).cast("long"),
    ).otherwise(F.col(tokens_col))
    # shard_id is LONG: ceil(9e12 tokens / 4096) > INT_MAX — an int cast
    # would CAST_OVERFLOW under ANSI exactly at the scale this targets
    with_shard = df.withColumn(tokens_col, guarded_tokens).withColumn(
        "_pack_h", h
    ).withColumn(
        "shard_id", F.pmod(F.col("_pack_h"), F.lit(n_shards)).cast("long")
    )
    w = Window.partitionBy("shard_id").orderBy(
        F.col("_pack_h"), *[F.col(c) for c in id_cols]
    )
    return (
        with_shard.withColumn(
            "pack_pos", (F.row_number().over(w) - 1).cast("int")
        )
        .withColumn(
            "token_offset",
            F.coalesce(
                F.sum(tokens_col).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .drop("_pack_h")
    )
