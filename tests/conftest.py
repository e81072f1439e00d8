"""Shared fixtures: one SparkSession per test session (local[*], AQE+Arrow)."""

from __future__ import annotations

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oplogtoredis_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="otr-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_events():
    from oplogtoredis_spark.sources.generator import generate_events

    return generate_events(n_events=4000, n_repos=60, paths_per_repo=8, seed=42)
