"""Range (interval-overlap) join — bucketized, no theta-join by default.

Joins point rows (one timestamp) to interval rows (``[start, end]``,
inclusive both ends) — the attribution/window-containment lookup a CDC
consumer runs over an ordered event feed (click → containing campaign
window, reading → calibration interval). The reference's per-key ordered
delivery (SURVEY.md §2 B2) is what makes the per-key variant answerable
downstream; Spark itself plans ``l.ts BETWEEN r.start AND r.end`` as a
BroadcastNestedLoopJoin (all-pairs per key) — O(P·I) at scale.

Scale-first formulation (the standard range-bin trick, cf. Databricks'
range-join binning and the bucketed overlap joins in genomics engines):

  1. pick a bucket width ``bucket_ms`` (≈ the typical interval length);
  2. a point belongs to exactly ONE bucket: ``floor(ts / bucket_ms)``;
  3. each interval is exploded to the buckets it overlaps
     (``sequence(floor(start/w), floor(end/w))`` — ``span/w + 1`` rows);
  4. EQUALITY join on (keys..., bucket) — a plain shuffled hash/sort-merge
     join Catalyst can plan, AQE can skew-split, and nothing is all-pairs;
  5. exact predicate ``start <= ts <= end`` filters the bucket collisions.

Because the point side has exactly one bucket row, each (point, interval)
pair can meet at most once — no post-join dedup. Cost is
O(P + I·span/w + matches).

Long intervals are the classic failure mode (an interval spanning 10^6
buckets explodes into 10^6 rows). Default posture is FAIL LOUD at runtime
(`raise_error` when an interval spans more than ``max_span_buckets``) so
the default plan stays free of nested-loop joins; callers with a genuine
long tail opt into ``long_intervals="broadcast"``, which routes ONLY the
long rows through a broadcast non-equi join (correct when long intervals
are rare — they are broadcast, never shuffled-exploded).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts_ms",
    start: str = "start_ms",
    end: str = "end_ms",
    on: Sequence[str] = (),
    bucket_ms: int = 3_600_000,
    max_span_buckets: int = 64,
    long_intervals: str = "error",
    prefix: str = "i_",
) -> DataFrame:
    """Inner-join each point to every interval containing it.

    Output: point columns unchanged plus each interval column as
    ``prefix + name`` (keys excluded). Containment is inclusive on both
    ends: ``start <= ts <= end``. ``on`` adds equality key columns shared
    by both sides. Left semantics compose: anti-join the result's point
    ids against ``points``.

    ``long_intervals``: ``"error"`` (default) raises at runtime on any
    interval spanning more than ``max_span_buckets`` buckets — pick
    ``bucket_ms`` near the typical interval length; ``"broadcast"`` routes
    long rows through a broadcast non-equi join instead (use when long
    intervals exist but are RARE — they must fit in a broadcast).
    """
    if long_intervals not in ("error", "broadcast"):
        raise ValueError(f"long_intervals must be error|broadcast: {long_intervals!r}")
    keys = list(on)
    i_payload = [c for c in intervals.columns if c not in keys]

    w = F.lit(int(bucket_ms)).cast("long")
    p = points.withColumn("_pb", (F.col(point_ts).cast("long") / w).cast("long"))

    s_b = (F.col(start).cast("long") / w).cast("long")
    e_b = (F.col(end).cast("long") / w).cast("long")
    span = e_b - s_b + F.lit(1)
    # end < start can satisfy no containment predicate, and would make the
    # bucket sequence() run DESCENDING (wrong buckets) — drop such rows up
    # front, matching the inner-join semantics exactly.
    iv = intervals.where(
        F.col(end).cast("long") >= F.col(start).cast("long")
    ).withColumn("_span", span)

    ip = F.struct(*[F.col(c) for c in i_payload]).alias("_ip")

    if long_intervals == "error":
        guard = F.when(
            F.col("_span") > max_span_buckets,
            F.raise_error(
                F.concat(
                    F.lit(
                        "range_join: interval spans more than "
                        f"{max_span_buckets} buckets of {bucket_ms} ms ("
                    ),
                    F.col("_span"),
                    F.lit(
                        "); raise bucket_ms/max_span_buckets or pass "
                        "long_intervals='broadcast'"
                    ),
                )
            ).cast("long"),
        ).otherwise(s_b)
        short = iv.withColumn("_sb", guard)
        long_part = None
    else:
        short = iv.where(F.col("_span") <= max_span_buckets).withColumn("_sb", s_b)
        long_part = iv.where(F.col("_span") > max_span_buckets)

    exploded = short.select(
        *[F.col(k) for k in keys],
        ip,
        F.explode(F.sequence(F.col("_sb"), e_b)).alias("_pb"),
    )
    out = (
        p.join(exploded, on=[*keys, "_pb"], how="inner")
        .where(
            (F.col(f"_ip.{start}").cast("long") <= F.col(point_ts).cast("long"))
            & (F.col(point_ts).cast("long") <= F.col(f"_ip.{end}").cast("long"))
        )
        .drop("_pb")
    )

    if long_part is not None:
        # Rare long rows only: broadcast them whole; with keys this is a
        # broadcast HASH join on the keys + exact post-filter, without keys
        # a broadcast nested-loop — either way nothing long is exploded or
        # shuffled.
        b = F.broadcast(long_part.select(*keys, ip))
        joined = p.join(b, on=keys, how="inner") if keys else p.crossJoin(b)
        long_out = joined.where(
            (F.col(f"_ip.{start}").cast("long") <= F.col(point_ts).cast("long"))
            & (F.col(point_ts).cast("long") <= F.col(f"_ip.{end}").cast("long"))
        )
        out = out.unionByName(long_out.drop("_pb"))

    return out.select(
        *[F.col(c) for c in points.columns],
        *[F.col(f"_ip.{c}").alias(prefix + c) for c in i_payload],
    )
