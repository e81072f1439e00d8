"""Event-stream analytics over the CDC feed: ordered-funnel progression and
per-group value quantiles.

These are the queries a consumer of the engine's ordered per-key publishes
runs downstream (the reference's publisher exists to make per-key order
usable — lib/redispub/publisher.go); here they run straight on the lake /
events table.

Funnel: a single-shuffle formulation. Events are collected per user into an
array of (ts_ms, type) structs and the stage timestamps are resolved with
higher-order array expressions — stage k's timestamp is the MINIMUM event
time of stage-k's type at-or-after stage k-1's timestamp. One Exchange on
the user key, no self-joins (the naive formulation is one join per stage);
per-user event cardinality is user-activity-bounded, the same assumption
gap-sessionization makes. The fold is order-insensitive (min over a
filtered array), so no sort is needed at all.

Quantiles: ``exact=True`` uses ``percentile`` (linear interpolation —
matches DuckDB's ``quantile_cont``, which the oracle uses) and buffers each
group's values: correct for oracle parity and fine for group-sized data.
The 100 TB path is ``exact=False`` → ``approx_percentile``, Spark's
mergeable KLL/QuantileSummaries sketch: partial-aggregates map-side like
any sum, at a configurable accuracy. Same output schema either way.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def funnel(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered funnel: (user, t_<stage>_ms per stage, stage).

    ``stage`` = number of consecutive stages completed in order (0 = never
    did stages[0]). A later stage counts only at-or-after (>=) the previous
    stage's resolved timestamp — simultaneous events count, matching the
    nested-min SQL rendering the oracle uses.
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    # NTZ parquet timestamps cast to session-tz TIMESTAMP first (session tz
    # is UTC here, so the millis match DuckDB's epoch_ms) — unix_millis
    # rejects TIMESTAMP_NTZ directly.
    evs = df.groupBy(user_col).agg(
        F.collect_list(
            F.struct(
                F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
                F.col(type_col).alias("etype"),
            )
        ).alias("_evs")
    )

    def stage_min(prev: Column | None, etype: str) -> Column:
        cond = lambda e: (  # noqa: E731 — tiny predicate, clearer inline
            (e["etype"] == F.lit(etype))
            if prev is None
            else ((e["etype"] == F.lit(etype)) & (e["ts_ms"] >= prev))
        )
        return F.array_min(
            F.transform(F.filter("_evs", cond), lambda e: e["ts_ms"])
        )

    out = evs
    prev: Column | None = None
    ts_cols = []
    for s in stages:
        c = f"t_{s}_ms"
        out = out.withColumn(c, stage_min(prev, s))
        prev = F.col(c)
        ts_cols.append(c)
    # a later stage's ts is only defined when the earlier stage resolved,
    # so checking the DEEPEST stage first (outermost when) yields the count
    # of consecutive stages completed.
    reached: Column = F.lit(0)
    for i, c in enumerate(ts_cols):
        reached = F.when(F.col(c).isNotNull(), F.lit(i + 1)).otherwise(reached)
    return out.select(user_col, *ts_cols, reached.alias("stage"))


def value_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10000,
    decimals: int = 4,
) -> DataFrame:
    """Per-key quantiles of ``value_col``, one column per requested q
    (``p50``/``p90``/...), rounded for cross-engine value parity.

    exact=False is the corpus-scale path: approx_percentile's sketch is
    mergeable (map-side partial agg), error <= 1/accuracy of rank.
    """
    probs = F.array(*[F.lit(float(q)) for q in qs])
    agg = (
        F.percentile(F.col(value_col), probs)
        if exact
        else F.approx_percentile(F.col(value_col), probs, F.lit(accuracy))
    )
    names = [f"p{str(q)[2:].ljust(2, '0')}" for q in qs]
    out = df.groupBy(*keys).agg(agg.alias("_qs"))
    return out.select(
        *keys,
        *[
            F.round(F.col("_qs")[i], decimals).alias(names[i])
            for i in range(len(qs))
        ],
    )
