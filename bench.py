"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE
JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "cdc_events_per_sec": ...}

The CDC replay portion generates a deterministic change-event log (seed 42,
size $OTR_BENCH_EVENTS, default 2M) and measures:
  * cdc_batch_replay  — whole-log batch LWW replay (scan → one shuffle)
  * cdc_stream_apply  — the streaming engine end-to-end (readStream →
    foreachBatch MERGE into the snapshot table), the reference-comparable
    number (vs oplogtoredis's ~2.8k events/s single-writer path, BASELINE.md)

Each query is forced with the noop sink (full materialization, no output
cost). Scaling evidence (local[8] vs local[32]) is produced by
scripts/run_scaling.py, which invokes this file twice in fresh JVMs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("OTR_BENCH_EVENTS", "2000000"))
EVENTS_CACHE = os.environ.get(
    "OTR_BENCH_EVENTS_DIR", f"/tmp/otr_bench_events_{N_EVENTS}"
)

HEADLINE = [
    "cdc_final_state",
    "lww_latest_per_user",
    "txn_flatten",
    "envelope_decode",
    "parallelism_key",
    "message_json",
    "publications",
    "changed_fields_v2_deep",
    "interval_max",
    "metrics_histogram",
    "text_profile",
    "bpe_tokens",
    "quality_filter",
    "chunk_documents",
    "corpus_pipeline",
    "fuzzy_dedup_pipeline",
    "hash_split",
    "stratified_sample",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "simhash",
    "embedding_dup_pairs",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_quantized_topk",
    "simhash_dup_pairs",
    "multimodal_features",
]


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _ensure_events() -> str:
    marker = os.path.join(EVENTS_CACHE, "_COMPLETE")
    if os.path.exists(marker):
        return EVENTS_CACHE
    shutil.rmtree(EVENTS_CACHE, ignore_errors=True)
    from oplogtoredis_spark.sources.generator import write_events_chunked

    n_chunks = max(1, N_EVENTS // 2_000_000)
    total = write_events_chunked(
        EVENTS_CACHE,
        n_events=N_EVENTS,
        n_chunks=n_chunks,
        files_per_chunk=max(8, 128 // n_chunks),
        n_repos=max(200, N_EVENTS // 2000),
        paths_per_repo=20,
        seed=42,
    )
    with open(marker, "w") as f:
        f.write(str(total))
    return EVENTS_CACHE


def main() -> None:
    from oplogtoredis_spark.config import EngineConfig
    from oplogtoredis_spark.session import get_spark

    import __spark_entry__ as entry_mod

    events_dir = _ensure_events()
    with open(os.path.join(events_dir, "_COMPLETE")) as f:
        n_events_total = int(f.read())

    spark = get_spark(
        "otr-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=128,  # sized so a reduce partition of the largest
        # shuffle fits execution memory at 32 concurrent tasks (spill-free)
        extra_conf={
            # CPU-heavy derivations over small inputs parallelize via the
            # explicit _par() repartitions in __spark_entry__; AQE keeps its
            # scale-sane default advisory size (a small advisory here
            # measured 3-4x WORSE at local[32]: thousands of tiny tasks).
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
            # shuffle/spill on tmpfs: the sandbox's disk is shared and slow;
            # on a real cluster this is local NVMe
            "spark.local.dir": "/dev/shm/spark-tmp",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig(
        denylist=("denied_org/repo0", "denied_org/repo1"),
        target_buckets=max(CPUS, 16),
    )

    timings: dict[str, float] = {}

    # warm the JVM/codegen and the Python UDF workers once (cold worker
    # spawn across all cores otherwise lands on whichever query runs first)
    spark.range(1000).count()
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(s):
        return s

    spark.range(10000).repartition(CPUS).select(_F.sum(_warm(_F.col("id")))).collect()

    qmap = entry_mod.queries()
    for name in HEADLINE:
        # best-of-2: the sandbox shares a noisy host; the minimum is the
        # faithful estimate of the engine's cost
        best = None
        for _ in range(2):
            t0 = time.time()
            _force(qmap[name](spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # --- CDC batch replay over the generated log ---
    from oplogtoredis_spark.plans.replay import replay_events_path

    batch_secs = None
    for _ in range(2):
        t0 = time.time()
        _force(replay_events_path(spark, events_dir, cfg))
        dt = time.time() - t0
        batch_secs = dt if batch_secs is None else min(batch_secs, dt)
    batch_secs = round(batch_secs, 3)
    timings["cdc_batch_replay"] = batch_secs

    # --- CDC streaming apply (the reference-comparable path) ---
    from oplogtoredis_spark.streaming.runner import run_to_completion

    stream_secs = None
    for _ in range(2):
        work = f"/tmp/otr_bench_stream_{CPUS}"
        shutil.rmtree(work, ignore_errors=True)
        t0 = time.time()
        run_to_completion(
            spark,
            events_dir,
            os.path.join(work, "tbl"),
            os.path.join(work, "ckpt"),
            cfg,
            # ~8 micro-batches over the log regardless of N_EVENTS
            max_files_per_trigger=max(
                4, len([f for f in os.listdir(events_dir) if f.endswith(".parquet")]) // 8
            ),
            # dense single-job merge: the bench table's keys hash uniformly
            # over 32 buckets, so every micro-batch touches every bucket and
            # the affected-bucket discovery job prunes nothing — dense mode
            # drops that serial driver round-trip + pruned re-scan per epoch
            # (the pruned default remains the 100 TB posture where batches
            # touch a small fraction of thousands of buckets)
            merge_prune=False,
        )
        dt = time.time() - t0
        stream_secs = dt if stream_secs is None else min(stream_secs, dt)
    stream_secs = round(stream_secs, 3)
    timings["cdc_stream_apply"] = stream_secs

    # --- CDC streaming apply, merge-on-read (write-optimized ingest) ---
    # Deltas only, no target read per epoch; the deferred merge is then paid
    # ONCE by compact(), which is also timed so the trade is visible. The
    # state must match the CoW stream's (spot-asserted on row count).
    from oplogtoredis_spark.streaming.lake import LakeTable

    mor_secs = compact_secs = None
    cow_rows = LakeTable(os.path.join(f"/tmp/otr_bench_stream_{CPUS}", "tbl")).read(
        spark
    ).count()
    for _ in range(2):
        work = f"/tmp/otr_bench_stream_mor_{CPUS}"
        shutil.rmtree(work, ignore_errors=True)
        t0 = time.time()
        table = run_to_completion(
            spark, events_dir,
            os.path.join(work, "tbl"), os.path.join(work, "ckpt"), cfg,
            max_files_per_trigger=max(
                4, len([f for f in os.listdir(events_dir) if f.endswith(".parquet")]) // 8
            ),
            merge_mode="mor",
        )
        dt = time.time() - t0
        mor_secs = dt if mor_secs is None else min(mor_secs, dt)
        t0 = time.time()
        table.compact(spark, drop_tombstones_older_than_ts=0)
        dt = time.time() - t0
        compact_secs = dt if compact_secs is None else min(compact_secs, dt)
        assert table.read(spark).count() == cow_rows  # same final state
    timings["cdc_stream_apply_mor"] = round(mor_secs, 3)
    timings["cdc_mor_compact"] = round(compact_secs, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline query suite + CDC replay wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "cdc_events_total": n_events_total,
        "cdc_batch_events_per_sec": round(n_events_total / batch_secs, 1),
        "cdc_stream_events_per_sec": round(n_events_total / stream_secs, 1),
        "cdc_stream_mor_events_per_sec": round(n_events_total / mor_secs, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
