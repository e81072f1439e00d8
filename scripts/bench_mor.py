"""Measure merge-on-read vs copy-on-write write amplification → BENCH/MOR.md.

The scenario MoR exists for (SCALE.md §1/§5): a populated table receives a
small HIGH-DISPERSION batch (random keys spread over every bucket). CoW must
rewrite every touched bucket; MoR appends ~batch-sized deltas. Also records
the price MoR pays: read wall with live deltas vs after compaction.

Run: python scripts/bench_mor.py   (local[8], ~2 min, deterministic input)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _d, filenames in os.walk(root):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from oplogtoredis_spark.session import get_spark
    from oplogtoredis_spark.sources.generator import generate_events
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    spark = get_spark("bench_mor", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/tmp/otr_bench_mor"
    shutil.rmtree(base, ignore_errors=True)

    # populated table: 60k events over 600 keys, ~4 KB payloads, 32 buckets
    ev = spark.createDataFrame(
        generate_events(n_events=60_000, n_repos=60, seed=7)
    ).withColumn("content", F.rpad(F.col("content"), 4000, "x"))
    # high-dispersion batch: 64 random keys, one per bucket on average
    small_rows = [
        (f"org{i}/repo{i % 60}", "path_0.py", 1 << 40, 0, "u", "cc", "py", "tiny")
        for i in range(64)
    ]
    small = spark.createDataFrame(
        small_rows,
        "repo string, path string, ts long, tx_idx int, op string,"
        " commit string, lang string, content string",
    )

    out: dict = {}
    for mode in ("cow", "mor"):
        path = os.path.join(base, mode)
        t = LakeTable.create(path, TARGET_SCHEMA, n_buckets=32)
        t.merge_batch(ev, 0, epoch_ns=mode)  # identical CoW-seeded base
        before = tree_bytes(path)
        t0 = time.time()
        stats = t.merge_batch(small, 1, epoch_ns=mode, merge_mode=mode)
        wall = time.time() - t0
        out[mode] = {
            "epoch_bytes_written": tree_bytes(path) - before,
            "epoch_wall_s": round(wall, 2),
            "affected_buckets": stats["affected_buckets"],
        }
        t0 = time.time()
        n = t.read(spark).count()
        out[mode]["read_wall_s"] = round(time.time() - t0, 2)
        out[mode]["rows"] = n
        if mode == "mor":
            t.compact(spark, drop_tombstones_older_than_ts=0)
            t0 = time.time()
            assert t.read(spark).count() == n
            out[mode]["read_wall_after_compact_s"] = round(time.time() - t0, 2)

    ratio = out["cow"]["epoch_bytes_written"] / max(
        out["mor"]["epoch_bytes_written"], 1
    )
    out["write_amplification_cow_over_mor"] = round(ratio, 1)
    md = f"""# BENCH/MOR — merge-on-read vs copy-on-write (one high-dispersion epoch)

Populated table: 60k events → 600 keys × ~4 KB payloads, 32 buckets.
Epoch under test: 64 random keys (~every bucket touched). Deterministic
input (seed 7); regenerate with `python scripts/bench_mor.py`.

| metric | CoW | MoR |
|---|---|---|
| bytes written by the epoch | {out['cow']['epoch_bytes_written']:,} | {out['mor']['epoch_bytes_written']:,} |
| epoch wall (s) | {out['cow']['epoch_wall_s']} | {out['mor']['epoch_wall_s']} |
| buckets touched | {out['cow']['affected_buckets']} | {out['mor']['affected_buckets']} |
| read wall after the epoch (s) | {out['cow']['read_wall_s']} | {out['mor']['read_wall_s']} |
| read wall after compact() (s) | — | {out['mor']['read_wall_after_compact_s']} |

**Write amplification: CoW writes {out['write_amplification_cow_over_mor']}×
the bytes MoR writes** for the identical state change. The MoR read pays the
deferred LWW collapse until compaction folds the deltas; at 100 TB the knob
is compaction cadence (Iceberg v2's rewrite procedures — see
IcebergSinkPlanner) against batch dispersion.
"""
    with open(os.path.join(REPO, "BENCH", "MOR.md"), "w") as f:
        f.write(md)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
