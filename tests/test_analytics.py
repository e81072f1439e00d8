"""Event analytics: ordered funnel (order sensitivity, >= ties, stage
counting, one-Exchange plan) and per-group quantiles (exact == numpy
linear interpolation; approx mode same schema, sane values)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import Row

from oplogtoredis_spark.operators.analytics import funnel, value_quantiles

STAGES = ("signup", "click", "purchase")


def _ev(uid, ms, etype):
    return Row(
        user_id=uid,
        ts=dt.datetime(2026, 1, 1) + dt.timedelta(milliseconds=ms),
        event_type=etype,
    )


@pytest.fixture(scope="module")
def funnel_events(spark):
    return spark.createDataFrame(
        [
            # u1: full funnel in order
            _ev(1, 10, "signup"), _ev(1, 20, "click"), _ev(1, 30, "purchase"),
            # u2: purchase BEFORE signup, click after → stage 2, not 3
            _ev(2, 5, "purchase"), _ev(2, 10, "signup"), _ev(2, 20, "click"),
            # u3: clicks but never signs up → stage 0
            _ev(3, 10, "click"), _ev(3, 20, "purchase"),
            # u4: simultaneous signup+click (ties count, >= semantics)
            _ev(4, 10, "signup"), _ev(4, 10, "click"), _ev(4, 10, "purchase"),
            # u5: signup only
            _ev(5, 10, "signup"),
        ]
    )


def test_funnel_stage_semantics(spark, funnel_events):
    rows = {r["user_id"]: r for r in funnel(funnel_events, STAGES).collect()}
    assert rows[1]["stage"] == 3
    assert rows[2]["stage"] == 2 and rows[2]["t_purchase_ms"] is None
    assert rows[3]["stage"] == 0 and rows[3]["t_signup_ms"] is None
    assert rows[4]["stage"] == 3  # equal timestamps count (>= per stage)
    assert rows[5]["stage"] == 1
    # every user appears, even stage-0 ones
    assert set(rows) == {1, 2, 3, 4, 5}


def test_funnel_stage_ts_are_stage_mins(spark, funnel_events):
    r = {x["user_id"]: x for x in funnel(funnel_events, STAGES).collect()}[2]
    base = int(
        dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    assert r["t_signup_ms"] == base + 10
    assert r["t_click_ms"] == base + 20


def test_funnel_plan_single_exchange_no_join(spark, funnel_events):
    """The scale shape: one shuffle on the user key, no per-stage
    self-joins (the naive formulation joins once per stage)."""
    plan = (
        funnel(funnel_events, STAGES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_funnel_rejects_single_stage(spark, funnel_events):
    with pytest.raises(ValueError):
        funnel(funnel_events, ("signup",))


def test_funnel_rejects_duplicate_stage_names(spark, funnel_events):
    """Duplicates would collide on t_<stage>_ms and silently corrupt the
    chain (withColumn overwrites the earlier stage)."""
    with pytest.raises(ValueError, match="duplicate"):
        funnel(funnel_events, ("signup", "click", "signup"))


def test_value_quantiles_column_naming(spark):
    from pyspark.sql import functions as F

    from oplogtoredis_spark.operators.analytics import value_quantiles

    df = spark.range(100).select(
        F.lit("a").alias("k"), F.col("id").cast("double").alias("value")
    )
    out = value_quantiles(df, ("k",), "value", qs=(0.05, 0.5, 0.99, 0.999, 1.0))
    # float-exact names: 0.99*100 is 99.00000000000001 raw — must not leak
    assert out.columns == ["k", "p5", "p50", "p99", "p99_9", "p100"]
    r = out.first()
    assert r["p100"] == 99.0 and r["p5"] == round(99 * 0.05, 4)


def test_hopping_window_membership_and_counts(spark):
    """duration=3·slide: each event lands in exactly 3 windows, [start,end)
    half-open (an event at exactly end is excluded)."""
    from oplogtoredis_spark.operators.analytics import hopping_window_agg

    df = spark.createDataFrame(
        [_ev(1, 0, "click"), _ev(1, 30_000, "click"), _ev(1, 10_000, "view")]
    )
    out = hopping_window_agg(
        df, "ts", duration_ms=30_000, slide_ms=10_000, keys=("event_type",)
    )
    base = int(
        dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    rows = {
        (r["w_start_ms"] - base, r["event_type"]): r["n_events"]
        for r in out.collect()
    }
    # event at +0 covers starts -20k,-10k,0; event at +30k covers 10k,20k,30k
    # → the [10k,40k) and [20k,50k) windows do NOT include the +0 event
    # (half-open [start,end): 0+30k window ends at 30k, excludes ts=30k)
    assert rows[(0, "click")] == 1
    assert rows[(10_000, "click")] == 1 and rows[(20_000, "click")] == 1
    assert rows[(-20_000, "click")] == 1 and rows[(30_000, "click")] == 1
    assert rows[(0, "view")] == 1
    # every click row covers exactly 3 windows → 6 click rows total
    assert sum(1 for (s, t) in rows if t == "click") == 6


def test_hopping_window_rejects_non_multiple(spark, funnel_events):
    from oplogtoredis_spark.operators.analytics import hopping_window_agg

    with pytest.raises(ValueError):
        hopping_window_agg(funnel_events, "ts", 25_000, 10_000)


def test_hopping_window_streaming_matches_batch(spark, tmp_path):
    """The identical window() expression under readStream + watermark
    (append mode) emits the batch recompute once the watermark passes —
    the reason to use native window() over a manual covering-window
    explode."""
    import os
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from oplogtoredis_spark.operators.analytics import hopping_window_agg

    real = [("click", 0), ("click", 15_000), ("view", 25_000)]
    late = [("click", 31_000)]
    sentinel = [("click", 10_000_000)]
    src = tmp_path / "hop"
    src.mkdir()
    for i, rows in enumerate([real, late, sentinel]):
        p = str(src / f"{i:02d}.parquet")
        pd.DataFrame(rows, columns=["event_type", "ts_ms"]).to_parquet(p)
        t = time.time() - 100 + i
        os.utime(p, (t, t))

    def run(df):
        # NB: df must already carry `ts` — re-deriving it here would
        # clobber the watermark metadata on the streaming side.
        return hopping_window_agg(
            df, "ts", duration_ms=30_000, slide_ms=10_000,
            keys=("event_type",),
        )

    expect = sorted(
        tuple(r)
        for r in run(
            spark.read.parquet(str(src)).withColumn(
                "ts", F.timestamp_millis("ts_ms")
            )
        ).collect()
        if r["w_start_ms"] < 9_000_000
    )
    stream = (
        spark.readStream.schema("event_type string, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.timestamp_millis("ts_ms"))
        .withWatermark("ts", "3 seconds")
    )
    q = (
        run(stream)
        .writeStream.format("memory")
        .queryName("hop_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in spark.table("hop_stream").collect()
        if r["w_start_ms"] < 9_000_000
    )
    assert got == expect
    # the late file's 31s click merged into the already-open [10k,40k)
    # window across micro-batches
    assert any(r[0] == 10_000 and r[2] == "click" and r[3] == 2 for r in got)


def test_retention_cohorts_known_matrix(spark):
    from oplogtoredis_spark.operators.analytics import retention_cohorts

    wk = 7 * 24 * 3600 * 1000
    df = spark.createDataFrame(
        [
            # u1: first in week 0, active weeks 0,1,3 (week 1 twice — still 1 user)
            _ev(1, 0, "x"), _ev(1, wk, "x"), _ev(1, wk + 5, "x"),
            _ev(1, 3 * wk, "x"),
            # u2: first in week 0, only week 0
            _ev(2, 5, "x"),
            # u3: first in week 1, active weeks 1,2
            _ev(3, wk + 10, "x"), _ev(3, 2 * wk, "x"),
        ]
    )
    rows = {
        (r["cohort_period"] - 2922, r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }  # 2026-01-01 is week index 2922 since epoch
    assert rows == {
        (0, 0): 2, (0, 1): 1, (0, 3): 1,
        (1, 0): 1, (1, 1): 1,
    }


def test_distinct_count_exact_and_approx(spark):
    from pyspark.sql import functions as F

    from oplogtoredis_spark.operators.analytics import distinct_count

    df = spark.range(10000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 997).alias("v")
    )
    exact = {r["k"]: r["n_distinct"] for r in
             distinct_count(df, ("k",), "v").collect()}
    assert exact == {0: 997, 1: 997, 2: 997}
    approx = {r["k"]: r["n_distinct"] for r in
              distinct_count(df, ("k",), "v", exact=False).collect()}
    for k, n in approx.items():
        assert abs(n - 997) / 997 < 0.05, (k, n)


def test_topk_per_group_semantics_and_plan(spark):
    from pyspark.sql import Row

    from oplogtoredis_spark.operators.analytics import topk_per_group

    df = spark.createDataFrame(
        [
            Row(g="a", uid=1, v=10), Row(g="a", uid=2, v=30),
            Row(g="a", uid=3, v=20), Row(g="a", uid=4, v=30),  # tie on 30
            Row(g="b", uid=5, v=1),
        ]
    )
    out = topk_per_group(df, ("g",), "v", k=2, tiebreak="uid")
    rows = sorted((r["g"], r["rk"], r["uid"]) for r in out.collect())
    # tie at v=30 resolved by ascending uid: uid=2 ranks before uid=4
    assert rows == [("a", 1, 2), ("a", 2, 4), ("b", 1, 5)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # map-side pre-prune before shuffle


def test_json_field_stats_nulls_and_malformed(spark):
    from pyspark.sql import Row

    from oplogtoredis_spark.operators.analytics import json_field_stats

    df = spark.createDataFrame(
        [
            Row(k="a", props='{"k": 7}'),
            Row(k="a", props='{"k": 17}'),
            Row(k="a", props='{"other": 1}'),   # field absent → dropped
            Row(k="a", props="not json"),        # malformed → dropped
            Row(k="a", props=None),              # null → dropped
        ]
    )
    rows = {
        r["bucket"]: (r["n_events"], r["min_v"], r["max_v"])
        for r in json_field_stats(df, "props", "k", keys=("k",)).collect()
    }
    assert rows == {7: (2, 7, 17)}


def test_value_quantiles_exact_matches_numpy(spark):
    vals = [float(v) for v in (1, 3, 3, 5, 9, 11, 20, 20, 21, 40)]
    df = spark.createDataFrame(
        [Row(event_type="a", value=v) for v in vals]
    )
    r = value_quantiles(df, ("event_type",), "value").first()
    for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        assert r[name] == round(float(np.percentile(vals, q * 100)), 4), name


def test_value_quantiles_approx_mode_schema_and_bounds(spark):
    vals = [float(v) for v in range(1, 1001)]
    df = spark.createDataFrame([Row(event_type="a", value=v) for v in vals])
    r = value_quantiles(df, ("event_type",), "value", exact=False).first()
    assert set(r.asDict()) == {"event_type", "p50", "p90", "p99"}
    # accuracy 10000 on 1000 rows → rank error <= 1 value step
    assert abs(r["p50"] - 500.5) <= 1.0
    assert abs(r["p90"] - 900.1) <= 1.0


class TestLinearTrend:
    def test_matches_numpy_polyfit(self, spark):
        import numpy as np

        from oplogtoredis_spark.operators.analytics import linear_trend

        rows = [("a", x, 2.5 * x + 7.25 + (0.1 if x % 2 else -0.1))
                for x in range(10)]
        rows += [("b", x, -1.5 * x + 3.0) for x in range(5)]
        df = spark.createDataFrame(rows, "k string, x long, y double")
        got = {r.k: (r.n, r.slope, r.intercept)
               for r in linear_trend(df, ["k"], "x", "y").collect()}
        for k, n in (("a", 10), ("b", 5)):
            xs = np.array([x for kk, x, _ in rows if kk == k], dtype=float)
            ys = np.array([round(y * 10000) / 10000 for kk, _, y in rows if kk == k])
            m, c = np.polyfit(xs, ys, 1)
            assert got[k][0] == n
            assert got[k][1] == pytest.approx(m, abs=2e-4)
            assert got[k][2] == pytest.approx(c, abs=2e-4)

    def test_zero_variance_x_yields_null_not_inf(self, spark):
        from oplogtoredis_spark.operators.analytics import linear_trend

        df = spark.createDataFrame(
            [("a", 3, 1.0), ("a", 3, 2.0), ("b", 1, 5.0)],
            "k string, x long, y double",
        )
        got = {r.k: r for r in linear_trend(df, ["k"], "x", "y").collect()}
        assert got["a"].slope is None and got["a"].intercept is None
        assert got["b"].slope is None  # single point: den == 0 too

    def test_partition_order_invariance(self, spark):
        """The whole point: identical results regardless of partitioning."""
        from oplogtoredis_spark.operators.analytics import linear_trend

        rows = [("g", x, (x * 17 % 13) + x * 0.37) for x in range(200)]
        df = spark.createDataFrame(rows, "k string, x long, y double")
        a = linear_trend(df.coalesce(1), ["k"], "x", "y").collect()[0]
        b = linear_trend(df.repartition(16), ["k"], "x", "y").collect()[0]
        assert (a.slope, a.intercept) == (b.slope, b.intercept)


class TestResampleGapfill:
    def _df(self, spark):
        import datetime as dt

        H = 3_600_000
        rows = [
            # key 'a': hours 0, 1, 4 observed → gaps at 2, 3
            ("a", 0, 10.0), ("a", 0, 2.5), ("a", 1 * H, 1.0), ("a", 4 * H, 7.0),
            # key 'b': single hour
            ("b", 2 * H, 3.0),
        ]
        base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
        return spark.createDataFrame(
            [(k, base + dt.timedelta(milliseconds=ms), v) for k, ms, v in rows],
            "k string, ts timestamp, value double",
        )

    def test_carry_fills_gaps(self, spark):
        from oplogtoredis_spark.operators.analytics import resample_gapfill

        out = resample_gapfill(self._df(spark), ["k"], "ts", "value",
                               step_ms=3_600_000, fill="carry")
        got = {(r.k, r.bucket_ms): (r.n_events, r.value_sum)
               for r in out.collect()}
        H = 3_600_000
        import datetime as dt
        base = int(dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
                   .timestamp() * 1000)
        # dense spine: a has 5 buckets (0..4), b has 1
        assert len(got) == 6
        assert got[("a", base + 0)] == (2, 12.5)
        assert got[("a", base + 1 * H)] == (1, 1.0)
        assert got[("a", base + 2 * H)] == (0, 1.0)   # gap carries hour 1
        assert got[("a", base + 3 * H)] == (0, 1.0)
        assert got[("a", base + 4 * H)] == (1, 7.0)
        assert got[("b", base + 2 * H)] == (1, 3.0)

    def test_zero_and_null_fill(self, spark):
        from oplogtoredis_spark.operators.analytics import resample_gapfill

        H = 3_600_000
        import datetime as dt
        base = int(dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
                   .timestamp() * 1000)
        z = {(r.k, r.bucket_ms): r.value_sum
             for r in resample_gapfill(self._df(spark), ["k"], "ts", "value",
                                       step_ms=H, fill="zero").collect()}
        assert z[("a", base + 2 * H)] == 0.0
        n = {(r.k, r.bucket_ms): r.value_sum
             for r in resample_gapfill(self._df(spark), ["k"], "ts", "value",
                                       step_ms=H, fill="null").collect()}
        assert n[("a", base + 3 * H)] is None

    def test_long_ts_col_and_guards(self, spark):
        from oplogtoredis_spark.operators.analytics import resample_gapfill

        df = spark.createDataFrame(
            [("a", 100, 1.0), ("a", 350, 2.0)], "k string, ts long, value double"
        )
        out = {r.bucket_ms: (r.n_events, r.value_sum)
               for r in resample_gapfill(df, ["k"], "ts", "value",
                                         step_ms=100).collect()}
        assert out == {100: (1, 1.0), 200: (0, 1.0), 300: (1, 2.0)}
        with pytest.raises(ValueError, match="carry|zero|null"):
            resample_gapfill(df, ["k"], fill="bogus")
        with pytest.raises(ValueError, match="positive"):
            resample_gapfill(df, ["k"], step_ms=0)


class TestZscoreAnomalies:
    def test_matches_numpy_and_flags_outlier(self, spark):
        import numpy as np

        from oplogtoredis_spark.operators.analytics import zscore_anomalies

        vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 100.0]
        df = spark.createDataFrame(
            [(i, "a", v) for i, v in enumerate(vals)],
            "event_id long, k string, value double",
        )
        got = zscore_anomalies(df, ["k"], threshold=2.5).collect()
        assert [r.event_id for r in got] == [9]
        arr = np.array(vals)
        z = (arr[9] - arr.mean()) / arr.std(ddof=1)
        assert got[0].z == pytest.approx(z, abs=1e-3)

    def test_zero_variance_and_singleton_emit_nothing(self, spark):
        from oplogtoredis_spark.operators.analytics import zscore_anomalies

        df = spark.createDataFrame(
            [(1, "flat", 5.0), (2, "flat", 5.0), (3, "one", 9.0)],
            "event_id long, k string, value double",
        )
        assert zscore_anomalies(df, ["k"], threshold=0.0).count() == 0

    def test_partition_order_invariance(self, spark):
        from oplogtoredis_spark.operators.analytics import zscore_anomalies

        rows = [(i, "g", (i * 29 % 97) + 0.31 * i) for i in range(500)]
        df = spark.createDataFrame(rows, "event_id long, k string, value double")
        a = sorted((r.event_id, r.z) for r in
                   zscore_anomalies(df.coalesce(1), ["k"], threshold=1.5).collect())
        b = sorted((r.event_id, r.z) for r in
                   zscore_anomalies(df.repartition(16), ["k"], threshold=1.5).collect())
        assert a == b and len(a) > 0

    def test_stats_side_is_broadcast(self, spark):
        from oplogtoredis_spark.operators.analytics import zscore_anomalies

        df = spark.createDataFrame(
            [(i, "k" + str(i % 3), float(i % 7)) for i in range(60)],
            "event_id long, k string, value double",
        )
        plan = (
            zscore_anomalies(df, ["k"])._jdf.queryExecution().executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_internal_name_collisions_rejected(self, spark):
        from oplogtoredis_spark.operators.analytics import zscore_anomalies

        df = spark.createDataFrame([(1, "a", 1.0, 2.0)],
                                   "event_id long, k string, value double, z double")
        with pytest.raises(ValueError, match="zscore internals"):
            zscore_anomalies(df, ["k"])


class TestRollingWindowSum:
    def _df(self, spark):
        rows = [
            ("a", 0, 1.0), ("a", 500, 2.0), ("a", 1000, 4.0),
            ("a", 1600, 8.0),        # frame [600,1600]: 0 and 500 fall out
            ("a", 5000, 16.0),       # all others out
            ("b", 0, 100.0),
        ]
        return spark.createDataFrame(rows, "k string, ts long, value double")

    def test_trailing_frame_semantics(self, spark):
        from oplogtoredis_spark.operators.analytics import rolling_window_sum

        out = {(r.k, r.ms): (r.trailing_n, r.trailing_sum)
               for r in rolling_window_sum(self._df(spark), ["k"], "ts",
                                           "value", window_ms=1000).collect()}
        assert out[("a", 0)] == (1, 1.0)
        assert out[("a", 500)] == (2, 3.0)
        assert out[("a", 1000)] == (3, 7.0)      # inclusive lower bound
        assert out[("a", 1600)] == (2, 12.0)     # 0 and 500 dropped out
        assert out[("a", 5000)] == (1, 16.0)
        assert out[("b", 0)] == (1, 100.0)

    def test_duplicate_timestamps_share_a_frame(self, spark):
        from oplogtoredis_spark.operators.analytics import rolling_window_sum

        df = spark.createDataFrame(
            [("a", 10, 1.0), ("a", 10, 2.0)], "k string, ts long, value double"
        )
        rows = rolling_window_sum(df, ["k"], "ts", "value", 100).collect()
        # RANGE frame: both equal-ts rows see the full 3.0
        assert sorted((r.trailing_n, r.trailing_sum) for r in rows) == [
            (2, 3.0), (2, 3.0)
        ]

    def test_one_exchange_and_guards(self, spark):
        from oplogtoredis_spark.operators.analytics import rolling_window_sum

        df = self._df(spark)
        plan = (
            rolling_window_sum(df, ["k"])._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1
        with pytest.raises(ValueError, match="positive"):
            rolling_window_sum(df, ["k"], window_ms=0)
        from pyspark.sql import functions as F

        with pytest.raises(ValueError, match="rolling internals"):
            rolling_window_sum(df.withColumn("ms", F.lit(1)), ["k"])


class TestMadAnomalies:
    def _df(self, spark):
        # k=a: values 1..9 plus a 1000 outlier; median 5, MAD 2.5 over the
        # 10 values (1..9,1000 -> sorted devs from med)
        rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)]
        rows += [("b", 1.0), ("b", 1.0), ("b", 1.0), ("b", 50.0)]  # MAD 0
        return spark.createDataFrame(rows, "k string, value double")

    def test_outlier_flagged_and_mad0_key_silent(self, spark):
        from oplogtoredis_spark.operators.analytics import mad_anomalies

        out = mad_anomalies(self._df(spark), ["k"], threshold=3.5).collect()
        # key b has MAD 0 -> no rows despite the 50.0 spike
        assert {r.k for r in out} == {"a"}
        assert [r.value for r in out] == [1000.0]
        r = out[0]
        # median of (1..9, 1000) = 5.5; devs sorted -> MAD = 2.5... compute:
        # devs |v-5.5|: 4.5,3.5,2.5,1.5,.5,.5,1.5,2.5,3.5,994.5 -> median 2.5
        assert r.med == 5.5 and r.mad == 2.5
        assert r.rscore == pytest.approx((1000.0 - 5.5) / 2.5, abs=1e-4)

    def test_threshold_boundary_strict(self, spark):
        from oplogtoredis_spark.operators.analytics import mad_anomalies

        df = spark.createDataFrame(
            [("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)],
            "k string, value double",
        )
        # med 2, MAD 1: |4-2| = 2 -> rscore 2, nothing beyond 3.5
        assert mad_anomalies(df, ["k"]).count() == 0
        assert mad_anomalies(df, ["k"], threshold=1.5).count() == 2

    def test_collision_guard(self, spark):
        from oplogtoredis_spark.operators.analytics import mad_anomalies
        from pyspark.sql import functions as F

        df = self._df(spark).withColumn("mad", F.lit(1))
        with pytest.raises(ValueError, match="mad internals"):
            mad_anomalies(df, ["k"])


class TestTransitionMatrix:
    def test_counts_and_row_normalization(self, spark):
        from oplogtoredis_spark.operators.analytics import transition_matrix

        rows = [
            (1, 1, 10, "view"), (2, 1, 20, "view"), (3, 1, 30, "buy"),
            (4, 2, 10, "view"), (5, 2, 20, "buy"),
            (6, 3, 10, "buy"),            # no successor -> no step
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts long, event_type string"
        )
        out = {
            (r.state, r.next_state): (r.n, r.p)
            for r in transition_matrix(df).collect()
        }
        assert out == {
            ("view", "view"): (1, 0.3333),
            ("view", "buy"): (2, 0.6667),
        }

    def test_duplicate_ts_deterministic_by_tiebreak(self, spark):
        from oplogtoredis_spark.operators.analytics import transition_matrix

        rows = [(1, 1, 10, "a"), (2, 1, 10, "b"), (3, 1, 10, "c")]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts long, event_type string"
        )
        for _ in range(3):
            out = {
                (r.state, r.next_state)
                for r in transition_matrix(df.repartition(7)).collect()
            }
            assert out == {("a", "b"), ("b", "c")}

    def test_one_corpus_exchange(self, spark):
        from oplogtoredis_spark.operators.analytics import transition_matrix

        df = spark.createDataFrame(
            [(1, 1, 10, "a"), (2, 1, 20, "b")],
            "event_id long, user_id long, ts long, event_type string",
        )
        plan = (
            transition_matrix(df)._jdf.queryExecution()
            .executedPlan().toString()
        )
        # user window + pair groupBy + normalization window = 3 exchanges,
        # but only the FIRST is corpus-sized; pin the count so a join or
        # extra corpus shuffle can't sneak in
        assert plan.count("Exchange hashpartitioning") == 3
        assert "Join" not in plan


class TestAbTest:
    def test_matches_numpy_welch(self, spark):
        """Assignment + statistics vs a pure-Python Welch reference on the
        same hash-assigned arms."""
        import numpy as np

        from oplogtoredis_spark.operators.analytics import ab_test
        from oplogtoredis_spark.operators.sampling import _D, _sample_hash
        from pyspark.sql import functions as F

        rows = [(u, "m", float(u % 13) + (u % 3) * 0.25) for u in range(400)]
        df = spark.createDataFrame(rows, "user_id long, k string, value double")
        out = ab_test(df, "user_id", "value", keys=["k"], salt="s1").collect()
        assert len(out) == 1
        r = out[0]

        # reproduce the assignment with the SAME portable hash
        h = {
            x.user_id: x.h
            for x in df.select(
                "user_id", _sample_hash(F.col("user_id"), "s1").alias("h")
            ).collect()
        }
        a = np.array([round(v * 1e4) for u, _, v in rows if h[u] < _D // 2])
        b = np.array([round(v * 1e4) for u, _, v in rows if h[u] >= _D // 2])
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert r.mean_a == pytest.approx(a.mean() / 1e4, abs=1e-4)
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / np.sqrt(se2)
        dfw = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert r.t_stat == pytest.approx(t, abs=1e-3)
        assert r.df_welch == pytest.approx(dfw, rel=1e-3)

    def test_degenerate_arms_dropped(self, spark):
        from oplogtoredis_spark.operators.analytics import ab_test

        # two units -> one arm may be empty/singleton; zero-variance both arms
        df = spark.createDataFrame(
            [(1, 1.0), (2, 1.0)], "user_id long, value double"
        )
        assert ab_test(df, "user_id", "value").count() == 0

    def test_single_shuffle_no_join(self, spark):
        from oplogtoredis_spark.operators.analytics import ab_test

        df = spark.createDataFrame(
            [(u, float(u)) for u in range(20)], "user_id long, value double"
        )
        plan = (
            ab_test(df, "user_id", "value")._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "Join" not in plan

    def test_collision_guard(self, spark):
        from oplogtoredis_spark.operators.analytics import ab_test
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
        with pytest.raises(ValueError, match="ab_test internals"):
            ab_test(df.withColumn("t_stat", F.lit(1)), "user_id", "value")


def test_resample_gapfill_floor_buckets_negative_ts(spark):
    """Plain % takes the dividend's sign: pre-epoch timestamps in
    (-step, 0) shared bucket 0 with [0, step). pmod floor-buckets them
    into their own bucket at -step."""
    from oplogtoredis_spark.operators.analytics import resample_gapfill

    df = spark.createDataFrame(
        [("k", -100, 1.0), ("k", 100, 2.0)], "key string, ts long, v double"
    )
    out = resample_gapfill(
        df, keys=("key",), ts_col="ts", value_col="v", step_ms=1000,
        fill="zero",
    )
    buckets = {r.bucket_ms: r.n_events for r in out.collect()}
    assert buckets == {-1000: 1, 0: 1}  # two buckets, not one double-width
