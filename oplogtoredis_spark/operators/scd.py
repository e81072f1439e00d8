"""SCD2 history derivation — changelog to validity intervals.

The warehouse-side complement of the as-of join: fold a CDC change feed
(the reference's per-key ordered publishes, SURVEY.md §2 B2 — lib/redispub
orders publishes per key precisely so a consumer can reconstruct per-key
history) into a slowly-changing-dimension type-2 table: one row per
version of each key with ``[valid_from, valid_to)`` and an ``is_current``
flag. Deletes CLOSE the open interval without emitting a row; re-inserts
after a delete open a new version even when the attributes are unchanged.

Scale-first formulation: no self-join, no collect. One Exchange on the
key, one in-partition sort by ``(ts, tiebreak)``, then

  1. (optional compression) ``lag`` over the ordered stream drops a change
     whose tracked attributes null-safely equal the previous change's —
     UNLESS the previous change was a delete (a delete/re-insert boundary
     is always a new version). Equality is transitive, so comparing to the
     previous ROW equals comparing to the previous SURVIVOR within any
     run of non-deletes.
  2. ``lead(ts)`` over the surviving rows assigns each version its close
     timestamp; delete rows are then dropped — their only job was to
     donate a close timestamp to the version before them.

Both windows share the partitioning (and the filter in between preserves
order), so the physical plan carries exactly ONE Exchange; the window
frames are streaming (lag/lead), so hot keys spill instead of OOMing.
Work is O(changes) per key regardless of key heat.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def scd2_history(
    changes: DataFrame,
    keys: str | Sequence[str],
    attrs: Sequence[str],
    ts: str = "ts_ms",
    tiebreak: str | None = None,
    op: str | None = None,
    delete_ops: Sequence[str] = ("d",),
    compress: bool = True,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Fold a changelog into an SCD2 history table.

    ``changes``: one row per change event. ``keys`` identify the entity,
    ``attrs`` are the tracked columns carried into the output (anything
    else is dropped — untracked payload has no well-defined value for a
    compressed version). ``ts`` is the change time (any numeric/orderable
    column; it is emitted verbatim as ``valid_from``/``valid_to``).
    ``tiebreak`` orders same-``ts`` changes (greatest = latest); pass one
    whenever ``(keys, ts)`` is not unique or version order is undefined.

    ``op`` names the op-code column; rows whose op is in ``delete_ops``
    close the current interval and emit nothing. Without ``op`` the feed
    is upsert-only.

    ``compress=True`` (the default) skips versions whose ``attrs`` are
    null-safely unchanged from the previous change — the standard SCD2
    "only write a row when something you track actually changed".

    Output: ``keys + attrs + [valid_from, valid_to, is_current]`` where
    ``valid_to`` is NULL on the open (current) version and ``is_current``
    is a boolean. Same-``ts`` version chains yield zero-length
    ``[t, t)`` intermediate intervals — kept, so the full lineage is
    queryable; filter ``valid_from != valid_to`` downstream if undesired.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    attrs = list(attrs)
    reserved = {"_del", "_keep", "_to"} & set(changes.columns)
    if reserved:
        raise ValueError(
            f"scd2_history: input columns {sorted(reserved)} collide with "
            f"internal temporaries — rename them first"
        )
    order = [F.col(ts).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)

    is_del = F.col(op).isin(*delete_ops) if op is not None else F.lit(False)
    d = changes.withColumn("_del", is_del)

    if compress:
        cur = F.struct(*[F.col(a) for a in attrs])
        prev = F.lag(cur).over(w)
        # First row of a key: lag(_del) is NULL -> coalesce to True ("as
        # if after a delete"), i.e. always keep the first change.
        prev_del = F.coalesce(F.lag("_del").over(w), F.lit(True))
        # window expressions are not allowed in WHERE — materialize first
        d = (
            d.withColumn("_keep", F.col("_del") | prev_del | ~cur.eqNullSafe(prev))
            .where("_keep")
            .drop("_keep")
        )

    d = d.withColumn("_to", F.lead(ts).over(w))
    return d.where(~F.col("_del")).select(
        *key_cols,
        *attrs,
        F.col(ts).alias(valid_from),
        F.col("_to").alias(valid_to),
        F.col("_to").isNull().alias(is_current),
    )
