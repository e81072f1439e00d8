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
    if len(set(stages)) != len(stages):
        # duplicate names would collide on t_<stage>_ms and silently
        # corrupt the chain (withColumn overwrites the earlier stage)
        raise ValueError(f"duplicate stage names: {list(stages)}")
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


def hopping_window_agg(
    df: DataFrame,
    ts_col: str,
    duration_ms: int,
    slide_ms: int,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Hopping (sliding) time-window aggregation via the NATIVE ``window``
    expression: per (window, keys), default count — the rate/trend query
    over the CDC feed.

    ``duration_ms`` must be an integral multiple of ``slide_ms`` (each
    event lands in exactly duration/slide windows — the oracle enumerates
    them by integer arithmetic). Output carries ``w_start_ms``/``w_end_ms``
    epoch millis, window = [start, end).

    Scale shape: ``window()`` expands map-side (one row per covering
    window, like any explode) and the groupBy partial-aggregates before
    the single Exchange; the IDENTICAL expression runs under Structured
    Streaming with a watermark (pinned in tests) — that is the reason to
    use native window() over a manual explode.
    """
    if duration_ms % slide_ms != 0:
        raise ValueError("duration_ms must be a multiple of slide_ms")
    # Use the column AS-IS when it is already a timestamp: a cast — even a
    # no-op one — strips the event-time watermark metadata, and streaming
    # append-mode aggregation then fails analysis (STREAMING_OUTPUT_MODE).
    from pyspark.sql.types import TimestampType

    if isinstance(df.schema[ts_col].dataType, TimestampType):
        ts = F.col(ts_col)
    else:
        ts = F.col(ts_col).cast("timestamp")
    w = F.window(
        ts, f"{duration_ms} milliseconds", f"{slide_ms} milliseconds"
    )
    out_aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("n_events")]
    grouped = df.groupBy(w.alias("_w"), *keys).agg(*out_aggs)
    return grouped.select(
        F.unix_millis("_w.start").alias("w_start_ms"),
        F.unix_millis("_w.end").alias("w_end_ms"),
        *keys,
        *[c for c in grouped.columns if c not in ("_w", *keys)],
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_ms: int = 7 * 24 * 3600 * 1000,
) -> DataFrame:
    """Cohort retention: users bucketed by the period of their FIRST event
    (the cohort), counted in every later period they were active —
    (cohort_period, period_offset, n_users).

    One shuffle on the user key does all the work: per-user min period and
    distinct active periods come out of a single groupBy (collect_set of
    period indices — bounded: at most total-periods entries per user, a
    few hundred even for years of data); the explode + final groupBy is
    over the tiny (cohort, offset) key space. No join back to the fact
    table, which the naive two-pass formulation (the oracle) needs.
    """
    wk = F.expr(
        f"unix_millis(cast({ts_col} as timestamp)) div {period_ms}"
    )
    per_user = df.groupBy(user_col).agg(
        F.min(wk).alias("cohort_period"),
        F.collect_set(wk).alias("_periods"),
    )
    return (
        per_user.select(
            "cohort_period", F.explode("_periods").alias("_p")
        )
        .groupBy(
            "cohort_period",
            (F.col("_p") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    exact: bool = True,
    rsd: float = 0.01,
) -> DataFrame:
    """Per-key distinct cardinality: (keys..., n_distinct).

    exact=True → real count_distinct (two-phase partial dedup, exact —
    and the oracle). exact=False → approx_count_distinct (HyperLogLog++,
    mergeable map-side sketch at relative error ``rsd``) — the 100 TB
    path: cardinality estimation over billions of keys without carrying
    the distinct sets through the shuffle.
    """
    agg = (
        F.count_distinct(F.col(col))
        if exact
        else F.approx_count_distinct(col, rsd)
    )
    return df.groupBy(*keys).agg(agg.alias("n_distinct"))


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    k: int,
    tiebreak: str,
    ascending: bool = False,
) -> DataFrame:
    """Top-k rows per key group by ``order_col`` (desc by default),
    deterministic via ``tiebreak``: (keys..., rk, original columns).

    Scale shape: rank-over-window compiles to WindowGroupLimit in Spark 4
    — each map task pre-prunes its partition to k rows per group BEFORE
    the shuffle (the same mechanism stratified_sample pins), so a skewed
    group ships O(k × map_tasks) rows, never its full cardinality.
    """
    from pyspark.sql import Window

    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*keys).orderBy(oc, F.col(tiebreak).asc())
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def json_field_stats(
    df: DataFrame,
    json_col: str,
    field: str,
    keys: Sequence[str] = (),
    buckets: int = 10,
) -> DataFrame:
    """Histogram of an integer field inside a JSON-string column:
    (keys..., bucket, n_events, min_v, max_v).

    ``get_json_object`` is a JVM-side expression (no UDF): the extraction
    runs inside the scan stage — the CDC-consumer pattern for payloads the
    envelope keeps opaque (sources/envelope.py leaves the payload as raw
    JSON by design; this is the downstream that picks fields out of it).
    """
    v = F.get_json_object(F.col(json_col), f"$.{field}").cast("long")
    return (
        df.select(*keys, v.alias("_v"))
        .where(F.col("_v").isNotNull())
        .groupBy(*keys, (F.col("_v") % buckets).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_v").alias("min_v"),
            F.max("_v").alias("max_v"),
        )
    )


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
    def _pname(q: float) -> str:
        pct = round(q * 100.0, 6)  # 0.99*100 is 99.00000000000001 raw
        if pct == int(pct):
            return f"p{int(pct)}"          # 0.5 → p50, 1.0 → p100
        return "p" + str(pct).replace(".", "_")  # 0.999 → p99_9

    names = [_pname(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantile names: {names}")
    out = df.groupBy(*keys).agg(agg.alias("_qs"))
    return out.select(
        *keys,
        *[
            F.round(F.col("_qs")[i], decimals).alias(names[i])
            for i in range(len(qs))
        ],
    )


def resample_gapfill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    step_ms: int = 3_600_000,
    fill: str = "carry",
) -> DataFrame:
    """Per-key time-bucket resampling with GAP FILLING — the timeseries
    densification every monitoring/trend consumer needs (timescale's
    time_bucket_gapfill / InfluxDB fill() posture), which plain GROUP BY
    cannot produce: buckets with no events simply don't exist.

    Plan shape: the corpus shuffles ONCE into the per-(key, bucket)
    aggregate; everything after runs on aggregate-sized data — the dense
    bucket spine is exploded from one ``sequence(min_bucket, max_bucket)``
    per key (bounded by the key's time span / step), left-joined to the
    sparse aggregate on (key, bucket), and ``fill="carry"`` resolves gaps
    with one ``last(_, ignorenulls)`` running window over the SAME (key,
    bucket) partitioning. No self-join against the fact table anywhere.

    Values are summed in e4 fixed point (order-independent, exact in the
    DuckDB oracle); gap rows carry n_events = 0. ``fill``: "carry"
    (last-observation-carried-forward), "zero", or "null".

    Output: (keys..., bucket_ms, n_events, value_sum).
    """
    if fill not in ("carry", "zero", "null"):
        raise ValueError(f"fill must be carry|zero|null, got {fill!r}")
    if step_ms <= 0:
        raise ValueError(f"step_ms must be positive, got {step_ms}")
    clash = {"_v", "_sum", "_lo", "_hi", "bucket_ms", "n_events"} & set(
        df.columns
    ) - {ts_col}
    if clash:
        raise ValueError(
            f"input columns collide with resample internals: {sorted(clash)}"
        )
    from pyspark.sql.window import Window

    ms = (F.unix_millis(F.col(ts_col))
          if dict(df.dtypes)[ts_col].startswith("timestamp")
          else F.col(ts_col).cast("long"))
    # pure integer FLOOR bucketing (ms − pmod(ms, step)): plain `%` takes
    # the dividend's sign, so pre-epoch timestamps in (−step, 0) would
    # share bucket 0 with [0, step) — a double-width bucket at zero and
    # ceil-bucketing for every negative range. pmod keeps the remainder
    # in [0, step); identical to `%` for the non-negative timestamps the
    # oracle data carries (DuckDB mirror for negative inputs:
    # ms − ((ms % step + step) % step)).
    bucket = (ms - F.pmod(ms, F.lit(step_ms))).cast("long")
    v4 = F.floor(F.col(value_col) * F.lit(10000.0) + F.lit(0.5)).cast("long")
    sparse = (
        df.select(*keys, bucket.alias("bucket_ms"), v4.alias("_v"))
        .groupBy(*keys, "bucket_ms")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("_v").alias("_sum"))
    )
    spine = (
        sparse.groupBy(*keys)
        .agg(F.min("bucket_ms").alias("_lo"), F.max("bucket_ms").alias("_hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_ms))
            ).alias("bucket_ms"),
        )
    )
    dense = spine.join(sparse, [*keys, "bucket_ms"], "left")
    val = F.col("_sum")
    if fill == "carry":
        w = (
            Window.partitionBy(*keys)
            .orderBy("bucket_ms")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        val = F.last("_sum", ignorenulls=True).over(w)
    elif fill == "zero":
        val = F.coalesce(F.col("_sum"), F.lit(0))
    return dense.select(
        *keys,
        "bucket_ms",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        (val / F.lit(10000.0)).alias("value_sum"),
    )


def rolling_window_sum(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    window_ms: int = 3_600_000,
) -> DataFrame:
    """Per-row trailing-window aggregate: for every event, the count and
    sum of the key's events in ``[ts − window_ms, ts]`` (inclusive both
    ends — the RANGE frame's semantics, mirrored exactly by the oracle).

    Plan: ONE Exchange on the keys + one sort; the RANGE BETWEEN frame is
    a streaming window (Spark buffers only the frame, hot keys spill).
    Values are summed in e4 fixed point over the frame — deterministic at
    any parallelism; ties in ``ts_col`` share a frame END (RANGE, not
    ROWS: all equal-timestamp rows see the same trailing sum, so the
    result is well-defined under duplicate timestamps, where a ROWS frame
    would be partition-order-dependent).

    At-least-once inputs (sources/generator logs with dup_frac) must be
    deduplicated UPSTREAM: a redelivered row raises trailing_n/sum like
    any other row — frame aggregates have no merge predicate to absorb
    duplicates the way the lake's MERGE does.

    Output: input columns + (ms, trailing_n, trailing_sum)."""
    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")
    clash = {"_v", "ms", "trailing_n", "trailing_sum"} & set(df.columns)
    if clash - {ts_col}:
        raise ValueError(
            f"input columns collide with rolling internals: {sorted(clash)}"
        )
    from pyspark.sql.window import Window

    ms = (F.unix_millis(F.col(ts_col))
          if dict(df.dtypes)[ts_col].startswith("timestamp")
          else F.col(ts_col).cast("long"))
    v4 = F.floor(F.col(value_col) * F.lit(10000.0) + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy(*keys)
        .orderBy("ms")
        .rangeBetween(-int(window_ms), 0)
    )
    return (
        df.withColumn("ms", ms.cast("long"))
        .withColumn("_v", v4)
        .withColumn("trailing_n", F.count(F.lit(1)).over(w))
        .withColumn(
            "trailing_sum", (F.sum("_v").over(w) / F.lit(10000.0))
        )
        .drop("_v")
    )


def zscore_anomalies(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    threshold: float = 3.0,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Per-key z-score outliers: rows whose value deviates from the key's
    mean by more than ``threshold`` sample standard deviations.

    Determinism: mean and stddev are derived from EXACT integer sufficient
    statistics (n, Σv, Σv² at e4 fixed point, combined in DECIMAL(38,0) —
    the linear_trend discipline), NOT from the engine-native ``stddev``
    whose float accumulation is partition-order-dependent; the oracle
    mirrors the same closed form bit-for-bit.

    Plan shape: one partial-agg'd shuffle builds the per-key stats
    (aggregate-sized), which then BROADCAST back onto the fact rows — the
    corpus itself never shuffles (`broadcast_stats=False` falls back to a
    shuffled hash join for key domains too large to broadcast).

    Output: fact row keys + (value, z) for |z| > threshold; a key with
    fewer than 2 rows or zero variance yields no anomalies (z undefined).
    """
    clash = {"_n", "_s", "_ss", "_v", "_z", "z"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with zscore internals: {sorted(clash)}"
        )
    v4 = F.floor(F.col(value_col) * F.lit(10000.0) + F.lit(0.5)).cast("long")
    stats = (
        df.select(*keys, v4.alias("_v"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
            # the cast is on the sum OPERAND: Σv itself exceeds int64 at
            # ~1e12 rows of e4-fixed values — a post-agg cast would ANSI-
            # overflow inside the long partial sum before ever applying
            F.sum(F.col("_v").cast("decimal(38,0)")).alias("_s"),
            # the product likewise: Σv² exceeds int64 long before Σv does
            F.sum(F.col("_v").cast("decimal(38,0)") * F.col("_v"))
            .cast("decimal(38,0)")
            .alias("_ss"),
        )
        .where(F.col("_n") >= 2)
    )
    joined = df.withColumn("_v", v4).join(
        F.broadcast(stats) if broadcast_stats else stats, list(keys)
    )
    n = F.col("_n").cast("double")
    mean = F.col("_s").cast("double") / n
    # sample variance from exact sums: (n*Σv² − (Σv)²) / (n*(n−1))
    var_num = (
        F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s")
    ).cast("double")
    std = F.sqrt(var_num / (n * (n - F.lit(1.0))))
    z = (F.col("_v").cast("double") - mean) / std
    return (
        joined.withColumn("_z", F.when(std > 0.0, z))
        .where(F.abs(F.col("_z")) > F.lit(float(threshold)))
        .drop("_n", "_s", "_ss", "_v")
        .withColumn("z", F.round(F.col("_z"), 4))
        .drop("_z")
    )


def linear_trend(
    df: DataFrame,
    keys: Sequence[str],
    x_col: Column | str,
    y_col: Column | str,
) -> DataFrame:
    """Per-key ordinary-least-squares trend (slope/intercept of y over x)
    from EXACT integer sums — the deterministic alternative to the
    engine-native ``regr_slope``/``regr_intercept`` aggregates, whose
    float accumulation is partition-order-dependent and therefore not
    reproducible across engines (or even across runs with different
    partitionings).

    ``x_col`` must be integer-valued (e.g. a day/hour index — rescale
    timestamps BEFORE calling so the decimal combination below stays far
    from 38 digits); ``y_col`` is fixed-pointed at e4. The five
    sufficient statistics (n, Σx, Σy, Σx², Σxy) are exact integers that
    partial-aggregate map-side like any sum; the closed forms

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)
        intercept = (Σy − slope·Σx) / n

    are combined in DECIMAL(38,0) (sums can exceed int64 at 100 TB row
    counts) and only the final division happens in doubles — bit-identical
    in any engine with exact decimal arithmetic. A key with zero x-variance
    has no defined trend: slope/intercept are NULL, not ±inf.

    Output: (keys..., n, slope, intercept) — slope/intercept in y-units
    (the e4 scaling cancels/divides out), rounded to 4 decimals.
    """
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    y4 = F.floor(y * F.lit(10000.0) + F.lit(0.5)).cast("long")
    g = df.select(*keys, x.alias("_x"), y4.alias("_y")).groupBy(*keys).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        # casts on the sum OPERANDS, not the finished sum: the int64
        # partial sum itself overflows (ANSI ArithmeticException) at 100 TB
        # row counts before a post-agg cast could ever apply
        F.sum(F.col("_x").cast("decimal(38,0)")).alias("_sx"),
        F.sum(F.col("_y").cast("decimal(38,0)")).alias("_sy"),
        F.sum(F.col("_x").cast("decimal(38,0)") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x").cast("decimal(38,0)") * F.col("_y")).alias("_sxy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    )
    den = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "double"
    )
    slope_e4 = F.when(den != 0.0, num / den)
    intercept_e4 = (
        F.col("_sy").cast("double") - slope_e4 * F.col("_sx").cast("double")
    ) / F.col("_n").cast("double")
    return g.select(
        *keys,
        F.col("_n").cast("long").alias("n"),
        F.round(slope_e4 / F.lit(10000.0), 4).alias("slope"),
        F.round(intercept_e4 / F.lit(10000.0), 4).alias("intercept"),
    )


def mad_anomalies(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    threshold: float = 3.5,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Per-key robust outliers: rows whose value deviates from the key's
    MEDIAN by more than ``threshold`` × MAD (median absolute deviation).

    The robust sibling of zscore_anomalies: a single extreme row inflates
    mean AND stddev (masking itself), while median/MAD have a 50%
    breakdown point — the standard posture for long-tailed telemetry.

    Determinism: values go to e4 fixed point (long) first; ``percentile``
    is Spark's EXACT sort-based aggregate with linear interpolation —
    identical to DuckDB's quantile_cont/median on the same integers, and
    partition-order-independent (unlike float sums). MAD is inherently
    two-pass (the deviation needs the median first): two aggregate
    shuffles, each broadcast back onto the facts — the corpus never
    shuffles. The 100 TB single-pass alternative is approx_percentile
    (mergeable KLL sketch) at a documented accuracy cost.

    Output: fact rows + (med, mad, rscore) where |v − med| > threshold ×
    MAD; keys with MAD = 0 (over half the values identical) yield no rows
    (rscore undefined), matching the oracle.
    """
    clash = {"_v", "_med", "_mad", "med", "mad", "rscore"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with mad internals: {sorted(clash)}"
        )
    v4 = F.floor(F.col(value_col) * F.lit(10000.0) + F.lit(0.5)).cast("long")
    facts = df.withColumn("_v", v4)
    med = facts.groupBy(*keys).agg(
        F.percentile("_v", F.lit(0.5)).alias("_med")
    )
    bcast = F.broadcast if broadcast_stats else (lambda d: d)
    with_med = facts.join(bcast(med), list(keys))
    mad = (
        with_med.groupBy(*keys)
        .agg(
            F.percentile(
                F.abs(F.col("_v").cast("double") - F.col("_med")), F.lit(0.5)
            ).alias("_mad")
        )
        .where(F.col("_mad") > 0.0)
    )
    dev = F.abs(F.col("_v").cast("double") - F.col("_med"))
    return (
        with_med.join(bcast(mad), list(keys))
        .where(dev > F.lit(float(threshold)) * F.col("_mad"))
        .withColumn("med", F.round(F.col("_med") / F.lit(10000.0), 4))
        .withColumn("mad", F.round(F.col("_mad") / F.lit(10000.0), 4))
        .withColumn("rscore", F.round(dev / F.col("_mad"), 4))
        .drop("_v", "_med", "_mad")
    )


def transition_matrix(
    df: DataFrame,
    seq_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: for every observed (state → next_state) step, its count and
    the row-normalized probability.

    Determinism under duplicate timestamps: the sequence order is
    (ts, tiebreak) — the tiebreaker must be unique per entity (the event
    id), otherwise ``lead`` is partition-order-dependent; the oracle
    mirrors the same ORDER BY.

    Plan: ONE Exchange on the entity key for the lead() window (the only
    corpus-sized shuffle), then a partial-agg'd groupBy on the
    (state, next) pair and a broadcast-sized row-normalization window over
    the state — |states|² rows, negligible at any corpus size.

    Output: (state, next_state, n, p) with p = n / Σ_next n.
    """
    clash = {"_nxt", "state", "next_state", "n", "p"} & set(df.columns)
    if clash - {state_col}:
        raise ValueError(
            f"input columns collide with transition internals: {sorted(clash)}"
        )
    from pyspark.sql.window import Window

    seq = Window.partitionBy(seq_col).orderBy(ts_col, tiebreak_col)
    steps = (
        df.select(seq_col, ts_col, tiebreak_col, state_col)
        .withColumn("_nxt", F.lead(state_col).over(seq))
        .where(F.col("_nxt").isNotNull())
    )
    counts = (
        steps.groupBy(
            F.col(state_col).alias("state"), F.col("_nxt").alias("next_state")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.partitionBy("state")
    return counts.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(total), 4)
    )


def ab_test(
    df: DataFrame,
    unit_col: str,
    value_col: str = "value",
    keys: Sequence[str] = (),
    salt: str = "",
) -> DataFrame:
    """Two-sample Welch t-test per key over a DETERMINISTIC 50/50 variant
    assignment: the unit (user) hashes into A or B with the portable
    sample hash (operators/sampling.py — same draw the train/eval split
    uses, so the oracle reproduces the assignment bit-for-bit and a rerun
    never reshuffles units between arms).

    Statistics come from exact integer sufficient statistics per arm
    (n, Σv, Σv² at e4 fixed point in DECIMAL(38,0) — the linear_trend /
    zscore discipline): partition-order-independent, overflow-proof at
    10^12 rows. Welch: t = (m_A − m_B)/√(s²_A/n_A + s²_B/n_B), df by
    Welch–Satterthwaite — doubles only in the final closed form.

    Plan: ONE partial-agg'd shuffle on the keys; arms are conditional
    aggregates (no pivot join, no second pass). The hash and e4 value are
    materialized ONCE per row in a child projection — inlining them into
    six aggregate expressions would re-evaluate per aggregate (no CSE
    across aggregate expressions).

    Output per key: (n_a, n_b, mean_a, mean_b, diff, t_stat, df_welch);
    keys where either arm has n < 2 or the pooled variance is 0 are
    dropped (t undefined).
    """
    from .sampling import _D, _sample_hash

    clash = {"_h", "_v", "n_a", "n_b", "mean_a", "mean_b", "diff",
             "t_stat", "df_welch"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with ab_test internals: {sorted(clash)}"
        )
    v4 = F.floor(F.col(value_col) * F.lit(10000.0) + F.lit(0.5)).cast("long")
    rows = df.select(
        *keys,
        _sample_hash(F.col(unit_col), salt).alias("_h"),
        v4.alias("_v"),
    )
    in_a = F.col("_h") < F.lit(_D // 2)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def arm(cond, suffix):
        av = F.when(cond, F.col("_v"))
        return [
            F.count(av).cast("decimal(38,0)").alias(f"_n{suffix}"),
            # operand-cast sums: a post-agg dec() would overflow inside
            # the long partial sum first (same fix as zscore/linear_trend)
            F.sum(dec(av)).alias(f"_s{suffix}"),
            F.sum(dec(av) * av).alias(f"_ss{suffix}"),
        ]

    stats = rows.groupBy(*keys).agg(*arm(in_a, "a"), *arm(~in_a, "b"))

    def welch(side):
        n = F.col(f"_n{side}").cast("double")
        var_num = (
            F.col(f"_n{side}") * F.col(f"_ss{side}")
            - F.col(f"_s{side}") * F.col(f"_s{side}")
        ).cast("double")
        mean4 = F.col(f"_s{side}").cast("double") / n
        var4 = var_num / (n * (n - F.lit(1.0)))  # sample variance, e4²
        return n, mean4, var4

    na, ma, va = welch("a")
    nb, mb, vb = welch("b")
    se2 = va / na + vb / nb  # e4² scale cancels in t and df
    t = (ma - mb) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        (va / na) ** 2 / (na - F.lit(1.0))
        + (vb / nb) ** 2 / (nb - F.lit(1.0))
    )
    return (
        stats.where(
            (F.col("_na") >= 2) & (F.col("_nb") >= 2)
        )
        .select(
            *keys,
            F.col("_na").cast("long").alias("n_a"),
            F.col("_nb").cast("long").alias("n_b"),
            F.round(ma / 10000.0, 4).alias("mean_a"),
            F.round(mb / 10000.0, 4).alias("mean_b"),
            F.round((ma - mb) / 10000.0, 4).alias("diff"),
            F.when(se2 > 0.0, F.round(t, 4)).alias("t_stat"),
            F.when(se2 > 0.0, F.round(dfw, 4)).alias("df_welch"),
        )
        .where(F.col("t_stat").isNotNull())
    )
