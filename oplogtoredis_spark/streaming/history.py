"""Streaming SCD2 history maintenance over the CDC lake.

`operators/scd.py` derives a history table from a COMPLETE changelog; this
module maintains the same table incrementally, one micro-batch at a time,
composed with the lake so no state is kept twice:

  - the LAKE is the open tail: its live row per key (``last_ts``) IS the
    key's current open version — exactly what `merge_batch` already
    maintains for the apply stream;
  - the history log is APPEND-ONLY CLOSED intervals: each epoch appends
    (a) the intra-batch closed versions (a batch with k changes to one key
    closes k-1 of them internally — plain `scd2_history` on the batch) and
    (b) one cross-epoch close per touched key: the pre-epoch open version,
    closed at the key's FIRST in-batch change time. The pre-epoch snapshot
    is pinned to one lake version for the whole epoch (same discipline as
    streaming/enrich.py), so an HA twin committing mid-epoch cannot tear
    the close set.

Per-epoch work is O(batch) + one equality join of the touched-key set
against the pinned snapshot (broadcastable batch side — the touched-key
set is the batch's key count), on top of the merge the stream already
does. Nothing ever rescans or rewrites history: closed intervals are
immutable facts, which is what makes append-only correct.

Replay safety: a redelivered epoch is skipped entirely when the lake
already recorded it (`epoch_applied`); a RETRY of a half-failed epoch
(history written, merge not committed) rewrites the SAME epoch directory
deterministically — the epoch's close set is a pure function of (batch,
pre-epoch snapshot), and the snapshot cannot have advanced if the merge
never committed. History is therefore written BEFORE the merge commits.

Delivery contract: per-key order with AT-LEAST-ONCE delivery — the
reference engine's guarantee (SURVEY.md §2 B2/§2.2; lib/redispub orders
publishes per key, and resume replays a window). Redeliveries are
absorbed exactly the way the lake's MERGE predicate absorbs them: exact
in-batch duplicates collapse, and a cross-epoch arrival at-or-before a
key's open ``(last_ts, last_tx_idx)`` is dropped — it is a replay of an
already-folded change (a genuinely NEW change that arrives that late is
one the lake would ignore too; this fold stays consistent with the state
the lake serves). ``late="error"`` opts into failing loud on any
at-or-before arrival for strictly-ordered feeds. Within a batch, any
arrival order is fine — `scd2_history` sorts.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.scd import scd2_history
from .lake import LakeTable

KEYS = ("repo", "path")
ATTRS = ("commit", "lang", "content")
_EPOCH_DIR = "e{:08d}"


def make_history_applier(
    table_path: str,
    history_dir: str,
    epoch_ns: str = "",
    merge_mode: str = "cow",
    late: str = "absorb",
    compact_min_dirs: int = 0,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch factory: maintain lake + SCD2 history log together.

    Returns an applier that, per micro-batch of envelope rows (repo, path,
    ts, tx_idx, op, commit, lang, content): appends the epoch's closed
    intervals to ``history_dir`` and then merges the batch into the lake.
    Read the combined table with :func:`read_history`.

    ``compact_min_dirs`` > 0 self-compacts the log whenever the live dir
    count reaches the threshold — after the epoch's merge, inside the
    stream's own loop, so the single-compactor discipline holds for free
    (the lake runner's ``compact_min_deltas`` posture).
    """
    lake = LakeTable(table_path)

    if late not in ("absorb", "error"):
        raise ValueError(f"late must be absorb|error: {late!r}")

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if lake.epoch_applied(epoch_ns, batch_id):
            return  # full replay of an applied epoch: history already written
        spark = batch_df.sparkSession
        v = lake.current_version()
        prev = lake.read(spark, version=v).select(
            *KEYS, *ATTRS, "last_ts", "last_tx_idx"
        )

        cols = [*KEYS, "ts", "tx_idx", "op", *ATTRS]
        # At-least-once absorption, mirroring the lake's MERGE predicate:
        # exact in-batch duplicates collapse here; cross-epoch arrivals
        # at-or-before the key's open (last_ts, last_tx_idx) are
        # redeliveries of already-folded changes and are dropped (the lake
        # would not apply them either). late="error" instead fails loud on
        # ANY at-or-before arrival — strict-ordering deployments.
        b = batch_df.select(*cols).dropDuplicates([*KEYS, "ts", "tx_idx"])
        joined = b.join(
            prev.select(*KEYS, "last_ts", "last_tx_idx"),
            on=list(KEYS),
            how="left",
        )
        newer = F.col("last_ts").isNull() | (
            (F.col("ts") > F.col("last_ts"))
            | (
                (F.col("ts") == F.col("last_ts"))
                & (F.col("tx_idx") > F.col("last_tx_idx"))
            )
        )
        if late == "error":
            # embed the guard in the ts projection (a filter would be
            # pushed below it and never evaluate the offending rows)
            eff = joined.withColumn(
                "ts",
                F.when(newer, F.col("ts")).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "history: cross-epoch arrival at-or-before "
                                "the open version of key ("
                            ),
                            *[F.col(k) for k in KEYS],
                            F.lit(
                                ") — late='error' demands strict per-key "
                                "ordered delivery; use late='absorb' (the "
                                "default) for at-least-once feeds"
                            ),
                        )
                    ).cast("long")
                ),
            )
        else:
            eff = joined.where(newer)
        eff = eff.drop("last_ts", "last_tx_idx")

        in_batch = scd2_history(
            eff,
            keys=list(KEYS),
            attrs=list(ATTRS),
            ts="ts",
            tiebreak="tx_idx",
            op="op",
            compress=False,
        ).where(F.col("valid_to").isNotNull())

        first = eff.groupBy(*KEYS).agg(
            F.min(F.struct("ts", "tx_idx")).alias("_f")
        )
        closes = prev.join(first, on=list(KEYS), how="inner").select(
            *KEYS,
            *ATTRS,
            F.col("last_ts").alias("valid_from"),
            F.col("_f.ts").alias("valid_to"),
        )

        closed = in_batch.drop("is_current").unionByName(closes)
        # overwrite (not append): a retried half-failed epoch rewrites the
        # same deterministic rows instead of duplicating them
        closed.write.mode("overwrite").parquet(
            os.path.join(history_dir, _EPOCH_DIR.format(batch_id))
        )
        lake.merge_batch(
            batch_df, batch_id, epoch_ns=epoch_ns, merge_mode=merge_mode
        )
        if compact_min_dirs and len(_live_dirs(history_dir)) >= compact_min_dirs:
            compact_history(spark, history_dir)

    return apply


def _live_dirs(history_dir: str) -> list[str]:
    """The log dirs a reader should scan: the highest-watermark compacted
    dir (``c{lo}_{hi}``) plus every epoch dir above its watermark. Naming
    carries the consistency: a compaction crash between writing the c-dir
    and removing the folded e-dirs leaves BOTH on disk, but readers ignore
    e-dirs at-or-below the c-dir's watermark, so nothing double-counts."""
    try:
        names = os.listdir(history_dir)
    except FileNotFoundError:
        return []
    compacted = sorted(
        (n for n in names if n.startswith("c")),
        key=lambda n: int(n.split("_")[1]),
    )
    hi = -1
    out = []
    if compacted:
        best = compacted[-1]
        hi = int(best.split("_")[1])
        out.append(os.path.join(history_dir, best))
    out += sorted(
        os.path.join(history_dir, n)
        for n in names
        if n.startswith("e") and int(n[1:]) > hi
    )
    return out


def compact_history(spark: SparkSession, history_dir: str) -> int:
    """Fold the log's live dirs into one ``c{lo}_{hi}`` dir and remove the
    folded ones — the small-files bound for a long-running stream (the
    append-only log otherwise accrues one directory per epoch). Closed
    intervals are immutable, so compaction is a pure rewrite: the read
    view is identical before, during, and after (naming discipline in
    :func:`_live_dirs`). Run it BETWEEN epochs from the stream's own loop
    (the lake's maybe_compact posture) — never concurrently with an
    in-flight epoch, whose closes are not yet committed by the merge.
    Also sweeps leftovers of a crashed prior compaction (dirs already
    folded into the live c-dir). Returns the number of dirs folded.

    The fold coalesces to one file — right for the log sizes a single
    stream accrues between compactions; a petabyte deployment would
    target a file size instead (Iceberg's rewrite_data_files posture)."""
    import shutil

    live = _live_dirs(history_dir)
    live_names = {os.path.basename(d) for d in live}
    try:
        for n in os.listdir(history_dir):
            if n[:1] in ("c", "e") and n not in live_names:
                # already folded into the live c-dir by a prior (possibly
                # crashed) compaction — stale, safe to sweep
                shutil.rmtree(os.path.join(history_dir, n))
    except FileNotFoundError:
        pass
    if len(live) < 2:
        return 0
    names = [os.path.basename(d) for d in live]
    lo = int(names[0].split("_")[0][1:]) if names[0][0] == "c" else int(names[0][1:])
    hi = int(names[-1][1:])
    target = os.path.join(history_dir, f"c{lo:08d}_{hi:08d}")
    spark.read.parquet(*live).coalesce(1).write.mode("overwrite").parquet(target)
    for d in live:
        shutil.rmtree(d)
    return len(live)


def read_history(
    spark: SparkSession, table_path: str, history_dir: str
) -> DataFrame:
    """The full SCD2 view: appended closed intervals UNION the lake's live
    rows as the open versions. Equals ``scd2_history(all changes so far,
    compress=False)`` — pinned in tests/test_history.py."""
    lake = LakeTable(table_path)
    open_rows = lake.read(spark).select(
        *KEYS,
        *ATTRS,
        F.col("last_ts").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    dirs = _live_dirs(history_dir)
    if dirs:
        closed = spark.read.parquet(*dirs).select(*open_rows.columns)
        out = closed.unionByName(open_rows)
    else:
        out = open_rows
    return out.withColumn("is_current", F.col("valid_to").isNull())
