"""Last-writer-wins collapse per key — the engine's core reduction (B2).

Reference semantics (SURVEY.md §2.2): all events for one key apply in total
order (ts, tx_idx); identical (key, ts, tx_idx) applies once
(lib/redispub/publisher.go:41-62, key format :315-317). Collapsing a batch to
one winner per key *is* the combination of dedup + ordered apply for
after-image CDC: the winner's state is the state after applying the whole
batch in order.

Scale notes:
  * ``max_by(payload_struct, order_struct)`` is a hash aggregate with
    map-side partial aggregation — each map task emits at most one candidate
    per key, so a hot key receives one row per upstream partition at the
    reducer, not its full event volume.
  * For pathological skew (north_rule demands explicit mitigation) we also
    provide a salted two-phase variant: reduce per (key, salt) first, then per
    key. salt is derived deterministically from the event identity so replay
    is stable.
  * Exact duplicates collapse for free: max_by picks one of the identical
    rows, which is the reference's "apply once" outcome.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..timestamps import total_order_col

#: payload columns carried through the reduction (everything but the key)
_META = ("ts", "tx_idx", "op")


def _payload_cols(df: DataFrame, key: tuple[str, ...]) -> list[str]:
    return [c for c in df.columns if c not in key]


def lww_collapse(
    df: DataFrame, key: tuple[str, ...] = ("repo", "path")
) -> DataFrame:
    """One winning row per key: the event with the greatest (ts, tx_idx).

    Output columns: key..., then the winner's payload columns (same names).
    """
    payload = _payload_cols(df, key)
    order = total_order_col(F.col("ts"), F.col("tx_idx"))
    win = F.max_by(F.struct(*[F.col(c) for c in payload]), order).alias("_w")
    out = df.groupBy(*key).agg(win)
    return out.select(*key, *[F.col(f"_w.{c}").alias(c) for c in payload])


def lww_collapse_salted(
    df: DataFrame,
    key: tuple[str, ...] = ("repo", "path"),
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase LWW for hot keys: reduce per (key, salt), then per key.

    Phase 1 spreads a hot key over ``n_salts`` reducers; phase 2 sees at most
    ``n_salts`` rows per key. The salt is ``pmod(xxhash64(ts, tx_idx), S)`` —
    deterministic per event identity, so a replayed batch salts identically.
    """
    payload = _payload_cols(df, key)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("ts"), F.col("tx_idx")), F.lit(n_salts))
    )
    order = total_order_col(F.col("ts"), F.col("tx_idx"))
    win = F.max_by(F.struct(*[F.col(c) for c in payload]), order).alias("_w")
    phase1 = salted.groupBy(*key, "_salt").agg(win)
    phase1 = phase1.select(*key, *[F.col(f"_w.{c}").alias(c) for c in payload])
    return lww_collapse(phase1, key)


def lww_collapse_broadcast(
    df: DataFrame,
    key: tuple[str, ...] = ("repo", "path"),
    uid_col: str = "seq",
) -> DataFrame:
    """Narrow-shuffle LWW: winners chosen on (key, ts, tx_idx, uid) ONLY,
    then the wide payload rows are recovered with a broadcast semi-join —
    the content column never enters a shuffle.

    ``uid_col`` must be unique per event (log offset / seq); it breaks the
    tie between exact duplicate events so the semi-join returns exactly one
    row per key with no post-dedup. Winner-set size must be broadcastable
    (≤ ~10M keys per micro-batch); above that, fall back to lww_collapse
    (max_by), whose map-side partial agg bounds the wide shuffle instead.
    """
    if uid_col not in df.columns:
        return lww_collapse(df, key)
    narrow = df.select(*key, "ts", "tx_idx", uid_col)
    w = F.max(
        F.struct(F.col("ts"), F.col("tx_idx"), F.col(uid_col).alias("_uid"))
    ).alias("_w")
    winners = (
        narrow.groupBy(*key)
        .agg(w)
        .select(
            *key,
            F.col("_w.ts").alias("ts"),
            F.col("_w.tx_idx").alias("tx_idx"),
            F.col("_w._uid").alias(uid_col),
        )
    )
    out = df.join(F.broadcast(winners), on=[*key, "ts", "tx_idx", uid_col], how="left_semi")
    return out.select(*key, *[c for c in df.columns if c not in key])


def dedup_exact_events(
    df: DataFrame, key: tuple[str, ...] = ("repo", "path")
) -> DataFrame:
    """Standalone at-most-once dedup on the identity (key, ts, tx_idx) —
    the reference's ``processed::<ts>::<txIdx>`` SETEX keys as a relational
    op. LWW already subsumes this; exposed for the driver-contract query and
    for diff-folding paths that must keep every event.
    """
    return df.dropDuplicates([*key, "ts", "tx_idx"])
