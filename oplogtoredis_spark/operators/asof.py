"""As-of (point-in-time) join — the CDC-adjacent operator Spark lacks.

For every left row, find the single right row with the greatest
``right_ts <= left_ts`` (backward, inclusive) within the same key — "the
state as of this moment". This is the lookup a CDC consumer runs constantly
(event → last known account state, click → last prior purchase, quote →
trade), and the reference engine's per-key ordered delivery is exactly what
makes it answerable downstream (SURVEY.md §2 B2; lib/redispub orders
publishes per key so subscribers can maintain as-of state).

Scale-first formulation: NOT an inequality join (a theta-join on
``l.ts >= r.ts`` is an all-pairs product per key — O(L·R) rows for a hot
key before the max is taken). Instead the classic union + carry-forward:

  1. tag right rows side=0 carrying their payload, left rows side=1;
  2. one Exchange on the key + one in-partition sort by (ts, side, tiebreak);
  3. ``last(payload, ignorenulls)`` over an UNBOUNDED PRECEDING running
     window carries each right payload forward to every later left row;
  4. keep side=1 rows.

Cost is exactly a sort-merge join's shuffle (one Exchange, one sort), work
is O(L + R) per key regardless of how hot the key is, and the running
``last`` is a streaming frame — SQL window spill handles keys larger than
memory. Equal timestamps match (right sorts before left at the same ts);
several right rows on the same (key, ts) resolve to the greatest
``tiebreak`` — deterministic, and mirrored by deduping the right side in
the DuckDB ``ASOF JOIN`` oracle (__spark_entry__.py SQL_ASOF_JOIN).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts_ms",
    right_ts: str = "ts_ms",
    tolerance_ms: int | None = None,
    right_tiebreak: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Backward inclusive as-of LEFT join of ``left`` to ``right`` on ``on``.

    Output: every left row with its columns unchanged, plus each non-key
    right column as ``prefix + name`` (NULL when no right row at-or-before
    the left timestamp exists — or none within ``tolerance_ms`` when set).

    ``right_tiebreak`` names a right column that breaks ties among right
    rows sharing (key, right_ts): the row with the GREATEST value wins.
    Without it, equal-timestamp right duplicates are resolved arbitrarily —
    pass one whenever the right side is not unique per (key, ts).
    """
    keys = [on] if isinstance(on, str) else list(on)
    r_payload = [c for c in right.columns if c not in keys]

    rp = F.struct(*[F.col(c) for c in r_payload]).alias("_rp")
    rp_type = right.select(rp).schema["_rp"].dataType
    lp = F.struct(*[F.col(c) for c in left.columns]).alias("_lp")
    lp_type = left.select(lp).schema["_lp"].dataType

    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    tb_type = right.select(tb.alias("_tb")).schema["_tb"].dataType

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).cast("long").alias("_ts"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        rp,
        F.lit(None).cast(lp_type).alias("_lp"),
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).cast("long").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(None).cast(rp_type).alias("_rp"),
        lp,
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_m", F.last("_rp", ignorenulls=True).over(w)
    )
    if tolerance_ms is not None:
        carried = carried.withColumn(
            "_m",
            F.when(
                F.col("_ts") - F.col(f"_m.{right_ts}") <= F.lit(tolerance_ms),
                F.col("_m"),
            ),
        )
    out = carried.where(F.col("_side") == 1).select(
        "_lp.*",
        *[F.col(f"_m.{c}").alias(prefix + c) for c in r_payload],
    )
    return out
