"""M2 interval-max completed-interval discipline — mirrors the reference's
IntervalMaxMetric behaviors (interval_max_metric.go + its test): the gauge
never reflects a partially elapsed interval, and an empty interval reports
nothing rather than 0."""

from pyspark.sql import functions as F

from oplogtoredis_spark.operators.interval_max import (
    interval_maxima,
    last_completed_max,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "ts_ms long, v double")


def test_partial_interval_withheld(spark):
    # intervals of 100ms; now=250 → [0,100) and [100,200) complete, [200,300) partial
    df = _df(spark, [(10, 1.0), (50, 9.0), (150, 3.0), (240, 99.0)])
    out = {
        r.interval_start_ms: r.max_value
        for r in interval_maxima(df, F.col("ts_ms"), F.col("v"), 100, now_ms=250).collect()
    }
    assert out == {0: 9.0, 100: 3.0}  # 99.0 in the partial interval is withheld


def test_gauge_reports_last_completed(spark):
    df = _df(spark, [(10, 1.0), (150, 3.0), (240, 99.0)])
    got = last_completed_max(df, F.col("ts_ms"), F.col("v"), 100, now_ms=250).collect()
    assert len(got) == 1
    assert (got[0].interval_start_ms, got[0].max_value) == (100, 3.0)


def test_stale_data_reports_nothing(spark):
    # observations ended >1 interval before now: the reference gauge
    # requires currentBucket - previousMax.timeBucket == 1, so it reports
    # NOTHING, not the stale max (interval_max_metric.go Collect; ADVICE r2)
    df = _df(spark, [(10, 1.0), (50, 9.0)])
    assert last_completed_max(df, F.col("ts_ms"), F.col("v"), 100, now_ms=250).count() == 0
    # same data with now inside the next interval: [0,100) is the
    # immediately preceding bucket → it reports
    got = last_completed_max(df, F.col("ts_ms"), F.col("v"), 100, now_ms=150).collect()
    assert len(got) == 1 and (got[0].interval_start_ms, got[0].max_value) == (0, 9.0)


def test_no_completed_interval_reports_nothing(spark):
    # all observations in the current partial interval → no reading, not 0
    df = _df(spark, [(210, 5.0), (240, 7.0)])
    assert last_completed_max(df, F.col("ts_ms"), F.col("v"), 100, now_ms=250).count() == 0


def test_empty_interval_skipped(spark):
    # [100,200) has no observations → absent from the report (no 0 rows)
    df = _df(spark, [(10, 1.0), (250, 2.0)])
    out = interval_maxima(df, F.col("ts_ms"), F.col("v"), 100, now_ms=400).collect()
    assert sorted(r.interval_start_ms for r in out) == [0, 200]


def test_streaming_append_mode_is_completed_interval_discipline(spark, tmp_path):
    """The streaming mapping claimed in operators/interval_max.py: a
    tumbling-window aggregate with a watermark in APPEND output mode emits
    only windows the watermark has closed — the current (partial) interval
    is withheld, exactly the reference gauge's reporting rule."""
    import pandas as pd
    from pyspark.sql import functions as F

    from oplogtoredis_spark.sources.generator import generate_events, write_events
    from oplogtoredis_spark.sources.schemas import EVENT_SCHEMA

    ev = generate_events(n_events=2000, n_repos=10, seed=77)
    d = str(tmp_path / "ev")
    write_events(ev, d, n_files=4)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(d)
    agg = (
        stream.withWatermark("wall", "10 seconds")
        .groupBy(F.window("wall", "60 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory").queryName("im_append")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r.ws: r.n for r in spark.sql(
        "SELECT w.start AS ws, n FROM im_append").collect()}
    assert got, "no completed windows emitted"
    # the interval containing the stream's latest event is withheld
    max_wall = ev["wall"].max()
    last_window_start = max_wall.floor("60s")
    assert last_window_start not in got
    # emitted counts equal the batch ground truth for those windows
    truth = ev.groupby(ev["wall"].dt.floor("60s")).size()
    for ws, n in got.items():
        assert n == int(truth[pd.Timestamp(ws)])
