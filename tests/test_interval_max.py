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


def test_no_completed_interval_reports_nothing(spark):
    # all observations in the current partial interval → no reading, not 0
    df = _df(spark, [(210, 5.0), (240, 7.0)])
    assert last_completed_max(df, F.col("ts_ms"), F.col("v"), 100, now_ms=250).count() == 0


def test_empty_interval_skipped(spark):
    # [100,200) has no observations → absent from the report (no 0 rows)
    df = _df(spark, [(10, 1.0), (250, 2.0)])
    out = interval_maxima(df, F.col("ts_ms"), F.col("v"), 100, now_ms=400).collect()
    assert sorted(r.interval_start_ms for r in out) == [0, 200]
