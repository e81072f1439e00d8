"""Regenerate BENCH/PLANS.md — physical-plan evidence for SCALE.md's claims.

Captures `.explain("formatted")` for the headline plan shapes and asserts
the properties the docs claim (pushed filters, partial_max_by, no
Cartesian/BNLJ in the LSH/IVF paths) so the evidence can't silently rot.
Run: python scripts/capture_plans.py  (sf0.001 inputs — plan shape, not
timing).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    # the JVM-side helper pyspark's own DataFrame.explain("formatted") uses
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> None:
    import __spark_entry__ as E
    from oplogtoredis_spark.session import get_spark

    spark = get_spark("plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = E.queries()

    # the CDC replay plan over a generated change-event log (the engine
    # path — denylist/system/op filters + LWW collapse), not a driver query
    import shutil

    from oplogtoredis_spark.config import EngineConfig
    from oplogtoredis_spark.plans.replay import replay_events_path
    from oplogtoredis_spark.sources.generator import generate_events, write_events

    ev_dir = "/tmp/otr_plans_events"
    shutil.rmtree(ev_dir, ignore_errors=True)
    write_events(generate_events(n_events=2000, n_repos=20, seed=42), ev_dir, n_files=2)
    cfg = EngineConfig(denylist=("denied_org/repo0",))
    replay_df = replay_events_path(spark, ev_dir, cfg)

    def q_replay(_spark, _sf):
        return replay_df

    # the IVF centroid BUILD stage in isolation (VERDICT r3 #1): sampled,
    # no join keyed on the vector id anywhere in the build
    def q_ivf_build(_spark, sf):
        from oplogtoredis_spark.operators.similarity import ivf_centroids

        emb = _spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        return ivf_centroids(emb, n_centroids=8, sample_per_centroid=32)

    qmap = dict(qmap, _cdc_replay=q_replay, _ivf_build=q_ivf_build)

    sections: list[tuple[str, str, str, list[str], list[str]]] = [
        # (title, query, note, must_contain, must_not_contain)
        (
            "CDC BATCH REPLAY (engine path) — filters pushed to the scan, partial_max_by, ONE wide exchange",
            "_cdc_replay",
            "",
            ["PushedFilters", "partial_max_by"],
            [],
        ),
        (
            "PUBLICATIONS (processOplogEntry T2→T9 composed) — map-only after the input spread",
            "publications",
            "the driver-registered variant adds one explicit input repartition "
            "to spread the tiny single-file TEST input across cores (_par() in "
            "__spark_entry__.py) — a no-op decision at real scale",
            [],
            [],
        ),
        (
            "MINHASH+LSH NEAR-DUP PAIRS — banded candidates, candidate-gated verify, equality joins only",
            "minhash_lsh_pairs",
            "",
            [],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        ),
        (
            "EMBEDDING NEAR-DUP (sign-bucket LSH) — equality joins only",
            "embedding_dup_pairs",
            "",
            [],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        ),
        (
            "ANN LSH TOP-K — bucket equality joins + exact re-rank",
            "ann_lsh_topk",
            "",
            [],
            ["CartesianProduct"],
        ),
        (
            "ANN IVF TOP-K — broadcast constant-size centroid table; candidate join on cid",
            "ann_ivf_topk",
            "the only nested-loop joins are against the broadcast "
            "O(n_centroids) centroid table; candidate and re-rank joins are "
            "equality joins; the centroid build inside is sample-bounded "
            "(next section)",
            [],
            ["CartesianProduct"],
        ),
        (
            "ANN IVF CENTROID BUILD — bounded smallest-id sample, NO join keyed on the vector id",
            "_ivf_build",
            "every build-stage row count is bounded by the 256-vector sample "
            "(TakeOrderedAndProject); the assignment rides a broadcast of "
            "the constant-size seed table and is carried THROUGH the max_by "
            "aggregate, so no shuffled join exists anywhere in the build — "
            "the r3 full-corpus (nid)-keyed explode join is gone",
            ["TakeOrderedAndProject"],
            ["SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"],
        ),
        (
            "SIMHASH BANDED PAIRS — slice equality joins + bit_count verify",
            "simhash_dup_pairs",
            "",
            [],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        ),
        (
            "AS-OF JOIN — union + carry-forward: window over ONE Exchange, NO join node at all",
            "asof_join_events",
            "an inequality join would be an all-pairs product per key "
            "(O(L·R) on a hot key); the carry-forward plan is O(L+R) per "
            "key with a streaming window frame — no join operator exists",
            ["Window"],
            [
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastHashJoin",
                "CartesianProduct",
                "BroadcastNestedLoopJoin",
            ],
        ),
        (
            "RANGE (INTERVAL-OVERLAP) JOIN — bucketized equality join + exact post-filter, nested-loop-free",
            "range_join_events",
            "Spark plans BETWEEN containment as a nested-loop join; the "
            "bucketized rewrite joins on EQUALITY (keys, bucket) so the "
            "probe side hash-partitions — each (point, interval) pair can "
            "meet in at most one bucket, so no dedup stage exists either",
            [],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        ),
        (
            "SCD2 HISTORY — lag/lead windows over ONE Exchange, no self-join",
            "scd2_user_history",
            "changelog → validity intervals: compression (lag) and close "
            "(lead) are streaming window frames sharing one partitioning; "
            "work is O(changes) per key, hot keys spill instead of OOMing",
            ["Window"],
            [
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastHashJoin",
                "CartesianProduct",
                "BroadcastNestedLoopJoin",
            ],
        ),
        (
            "CORPUS PIPELINE (quality→dedup→chunk→split composed) — one plan, split is join-free",
            "corpus_pipeline",
            "the only join is the exact-dedup survivor semi-join (equality on "
            "doc_id); the train/eval/test split attaches as a pure hash "
            "expression of doc_id — no join, no shuffle beyond the one "
            "content-hash aggregate",
            [],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        ),
    ]

    out = [
        "# BENCH/PLANS — physical-plan evidence (round 5)",
        "",
        "Captured `.explain(\"formatted\")` output (sf0.001 — plan shape, not",
        "timing) for the properties SCALE.md claims; regenerate with",
        "`python scripts/capture_plans.py`, which ASSERTS the must/must-not",
        "plan substrings below before writing this file.",
        "",
    ]
    for title, name, note, must, must_not in sections:
        p = plan_of(qmap[name](spark, SF))
        for m in must:
            assert m in p, f"{name}: expected {m!r} in plan"
        for m in must_not:
            assert m not in p, f"{name}: forbidden {m!r} found in plan"
        out.append(f"\n===== {title} =====")
        if note:
            out.append(f"NOTE: {note}")
        out.append("```")
        out.append(p.rstrip())
        out.append("```")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print("PLANS.md regenerated; all plan assertions held")
    spark.stop()


if __name__ == "__main__":
    main()
