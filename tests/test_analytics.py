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
