"""Scaling-efficiency evidence: the same CDC jobs at local[8] vs local[32].

The north_rule's two-cluster-size criterion (N vs 4N executors, efficiency
≥ 0.8) cannot use a real cluster in this sandbox; per BASELINE.md the
stand-in is the identical job at two parallelism levels on identical input,
each level in a fresh JVM.

Measurement discipline — this sandbox shares a host with other tenants whose
load swings between ~0 and ~20 busy cores, which inverts naive wall-clock
comparisons (a 32-thread job degrades far more under foreign load than an
8-thread one). So:
  * runs are interleaved ABAB x ROUNDS (never one level after the other),
  * each run waits for a quiet window (1-min load < QUIET_LOAD, bounded wait),
  * the per-level statistic is the MINIMUM (the least-contended observation),
  * the ambient load before each run is recorded alongside the timing.

Writes BENCH/BASELINE.md + BENCH/BENCH_scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVENTS = os.environ.get("OTR_SCALING_EVENTS_DIR", "/dev/shm/otr_events_16m")
ROUNDS = int(os.environ.get("OTR_SCALING_ROUNDS", "3"))
QUIET_LOAD = float(os.environ.get("OTR_SCALING_QUIET_LOAD", "4"))
QUIET_WAIT_S = int(os.environ.get("OTR_SCALING_QUIET_WAIT_S", "600"))

_RUN_CODE = '''
import sys, time, json, os, shutil
sys.path.insert(0, %(repo)r)
from oplogtoredis_spark.session import get_spark
from oplogtoredis_spark.plans.replay import replay_events_path
from oplogtoredis_spark.streaming.runner import run_to_completion
from oplogtoredis_spark.config import EngineConfig
cpus = int(os.environ["CPUS"])
spark = get_spark("scaling", master=f"local[{cpus}]", shuffle_partitions=128)
spark.sparkContext.setLogLevel("ERROR")
cfg = EngineConfig(denylist=("denied_org/repo0", "denied_org/repo1"), target_buckets=max(cpus, 16))
spark.range(1000).count()
events = %(events)r
t0 = time.time()
replay_events_path(spark, events, cfg).write.format("noop").mode("overwrite").save()
batch = time.time() - t0
work = f"/dev/shm/otr_scaling_{cpus}"
shutil.rmtree(work, ignore_errors=True)
nf = len([f for f in os.listdir(events) if f.endswith(".parquet")])
t0 = time.time()
run_to_completion(spark, events, work + "/tbl", work + "/ckpt", cfg, max_files_per_trigger=max(4, nf // 8))
stream = time.time() - t0
shutil.rmtree(work, ignore_errors=True)
print(json.dumps({"batch": round(batch, 2), "stream": round(stream, 2)}))
spark.stop()
'''


def wait_quiet() -> float:
    t0 = time.time()
    while time.time() - t0 < QUIET_WAIT_S:
        load = os.getloadavg()[0]
        if load < QUIET_LOAD:
            return load
        time.sleep(15)
    return os.getloadavg()[0]


def run_level(cpus: int, events_total: int) -> dict:
    load = wait_quiet()
    env = dict(os.environ)
    env["CPUS"] = str(cpus)
    out = subprocess.run(
        [sys.executable, "-c", _RUN_CODE % {"repo": REPO, "events": EVENTS}],
        capture_output=True,
        text=True,
        env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-1000:])
    r = json.loads(lines[-1])
    r["load_before"] = round(load, 2)
    r["cpus"] = cpus
    return r


def main() -> None:
    with open(os.path.join(EVENTS, "_COMPLETE")) as f:
        n_events = int(f.read())

    runs: list[dict] = []
    for _ in range(ROUNDS):
        for cpus in (8, 32):
            r = run_level(cpus, n_events)
            print(json.dumps(r), flush=True)
            runs.append(r)

    def best(cpus: int, key: str) -> float:
        return min(r[key] for r in runs if r["cpus"] == cpus)

    b8, b32 = best(8, "batch"), best(32, "batch")
    s8, s32 = best(8, "stream"), best(32, "stream")
    eff_batch = round((b8 / b32) / 4.0, 3)
    eff_stream = round((s8 / s32) / 4.0, 3)

    md = f"""# BENCH — scaling evidence (local[8] vs local[32], identical input)

Sandbox stand-in for the north_rule's N vs 4N executor criterion (see
BASELINE.md): the identical CDC jobs — batch replay and streaming apply of
the same deterministically generated change-event log (seed 42,
{n_events:,} events incl. duplicate/junk coverage, ~{len(os.listdir(EVENTS)) - 1} parquet
segments, staged on tmpfs so the sandbox's shared-disk read cap does not
mask engine scaling — on a real cluster distributed storage bandwidth
scales with node count) — run in fresh JVMs at two parallelism levels, interleaved
ABAB×{ROUNDS} with quiet-window gating (this host is shared; ambient load is
recorded per run below). Per-level statistic: minimum (least-contended run).

| metric | local[8] | local[32] | ratio (32/8) | scaling efficiency (ratio/4) |
|---|---|---|---|---|
| CDC batch replay (s) | {b8} | {b32} | {b8 / b32:.2f}× | **{eff_batch}** |
| CDC batch replay (events/s) | {n_events / b8:,.0f} | {n_events / b32:,.0f} | | |
| CDC streaming apply (s) | {s8} | {s32} | {s8 / s32:.2f}× | **{eff_stream}** |
| CDC streaming apply (events/s) | {n_events / s8:,.0f} | {n_events / s32:,.0f} | | |

Reference single-node baseline (BASELINE.md): ~2,844 events/s end-to-end
CDC apply. This engine: **{n_events / s32:,.0f} events/s** streaming apply and
**{n_events / b32:,.0f} events/s** batch replay at local[32]
({n_events / s32 / 2844:.0f}× / {n_events / b32 / 2844:.0f}× the reference).

## All runs (interleaved, with ambient host load)

| cpus | batch s | stream s | 1-min load before |
|---|---|---|---|
""" + "\n".join(
        f"| {r['cpus']} | {r['batch']} | {r['stream']} | {r['load_before']} |"
        for r in runs
    ) + """

Caveats: single shared machine — no network shuffle, shared memory
bandwidth and page cache, and foreign tenant load (visible in the load
column) penalizes the wide configuration disproportionately; discrete
executors on a real cluster would not share any of these. The headline
query-suite timings at sf0.1 are produced separately by `python bench.py`
(BENCH_r*.json).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "BENCH_scaling.json"), "w") as f:
        json.dump(
            {
                "runs": runs,
                "n_events": n_events,
                "best": {"batch8": b8, "batch32": b32, "stream8": s8, "stream32": s32},
                "efficiency_batch": eff_batch,
                "efficiency_stream": eff_stream,
            },
            f,
            indent=2,
        )
    print(json.dumps({"efficiency_batch": eff_batch, "efficiency_stream": eff_stream}))


if __name__ == "__main__":
    main()
