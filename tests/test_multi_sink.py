"""R2 multi-destination fan-out: one stream merges into every target table
(mirror of the acceptance harness asserting messages on two Redis
destinations, integration-tests/acceptance/harness_test.go:128-143)."""

from oplogtoredis_spark.config import EngineConfig
from oplogtoredis_spark.sources.generator import generate_events, write_events
from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
from oplogtoredis_spark.streaming.lake import LakeTable
from oplogtoredis_spark.streaming.runner import make_multi_sink_applier
from oplogtoredis_spark.operators.filters import apply_all_filters

DENY = ("denied_org/repo0", "denied_org/repo1")


def test_fanout_two_destinations(spark, tmp_path):
    ev = generate_events(n_events=800, n_repos=12, seed=21)
    d = str(tmp_path / "ev")
    write_events(ev, d, n_files=2)
    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    for p in (t1, t2):
        LakeTable.create(p, TARGET_SCHEMA, n_buckets=4)

    apply = make_multi_sink_applier([t1, t2], epoch_ns="ns1")
    batch = apply_all_filters(spark.read.parquet(d), DENY)
    apply(batch, 0)

    s1 = LakeTable(t1).read(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    s2 = LakeTable(t2).read(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(s1) > 0
    assert s1.equals(s2)  # every destination got every message

    # per-destination exactly-once: crash between sinks → replay; t1 skips,
    # t2 (pretend it missed the epoch) applies — end state equal
    apply(batch, 0)  # full replay of the same epoch
    assert LakeTable(t1).read(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True).equals(s1)
    assert LakeTable(t2).read(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True).equals(s2)
