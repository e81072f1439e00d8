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
import sys, time, json, os, shutil, urllib.request
sys.path.insert(0, %(repo)r)
from oplogtoredis_spark.session import get_spark
from oplogtoredis_spark.plans.replay import replay_events_path
from oplogtoredis_spark.streaming.runner import run_to_completion
from oplogtoredis_spark.config import EngineConfig
from pyspark.sql import functions as F
cpus = int(os.environ["CPUS"])
spark = get_spark("scaling", master=f"local[{cpus}]", shuffle_partitions=128,
                  extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"})
spark.sparkContext.setLogLevel("ERROR")
cfg = EngineConfig(denylist=("denied_org/repo0", "denied_org/repo1"), target_buckets=max(cpus, 16))
spark.range(1000).count()

def stage_totals():
    """(executorCpuTime sec, executorRunTime sec) summed over completed
    stages — total work done by all tasks, independent of parallelism. Flat
    CPU-seconds across levels = the engine adds no serialization at 4N."""
    base = "http://127.0.0.1:4049/api/v1/applications"
    app = json.load(urllib.request.urlopen(base))[0]["id"]
    st = json.load(urllib.request.urlopen(f"{base}/{app}/stages?status=COMPLETE"))
    return (sum(s.get("executorCpuTime", 0) for s in st) / 1e9,
            sum(s.get("executorRunTime", 0) for s in st) / 1e3)

events = %(events)r
out = {}
c0, r0 = stage_totals()
t0 = time.time()
replay_events_path(spark, events, cfg).write.format("noop").mode("overwrite").save()
out["batch"] = round(time.time() - t0, 2)
c1, r1 = stage_totals()
out["batch_cpu_s"], out["batch_run_s"] = round(c1 - c0, 1), round(r1 - r0, 1)

# CPU-bound engine kernel (T6 deep changed-fields, Arrow pandas UDF): JSON
# diff parsing in Python workers over every event — the per-row transform
# path of the north_star, CPU-dominated rather than memory-bandwidth-bound
ev = spark.read.parquet(events).select(F.coalesce(
    F.col("diff"),
    F.lit('{"$v":2,"diff":{"smeta":{"u":{"a":1,"b":2},"i":{"c":3}},"u":{"top":1}}}'),
).alias("o"))
from oplogtoredis_spark.functions.changed_fields import changed_fields
t0 = time.time()
ev.select(F.explode(changed_fields(F.lit("u"), F.col("o"), deep=True)).alias("f")) \
  .where(F.col("f").isNotNull()).write.format("noop").mode("overwrite").save()
out["kernel"] = round(time.time() - t0, 2)
c2, r2 = stage_totals()
out["kernel_cpu_s"], out["kernel_run_s"] = round(c2 - c1, 1), round(r2 - r1, 1)

work = f"/dev/shm/otr_scaling_{cpus}"
shutil.rmtree(work, ignore_errors=True)
nf = len([f for f in os.listdir(events) if f.endswith(".parquet")])
t0 = time.time()
run_to_completion(spark, events, work + "/tbl", work + "/ckpt", cfg, max_files_per_trigger=max(4, nf // 8))
out["stream"] = round(time.time() - t0, 2)
c3, r3 = stage_totals()
out["stream_cpu_s"], out["stream_run_s"] = round(c3 - c2, 1), round(r3 - r2, 1)
shutil.rmtree(work, ignore_errors=True)
print(json.dumps(out))
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
    k8, k32 = best(8, "kernel"), best(32, "kernel")
    eff_batch = round((b8 / b32) / 4.0, 3)
    eff_stream = round((s8 / s32) / 4.0, 3)
    eff_kernel = round((k8 / k32) / 4.0, 3)

    def cpu_best(cpus: int, key: str) -> float:
        # CPU-seconds of the least-contended run (paired with min wall)
        vals = [
            (r[key.replace("_cpu_s", "")], r[key]) for r in runs if r["cpus"] == cpus
        ]
        return min(vals)[1]

    cpu_rows = []
    for job in ("batch", "kernel", "stream"):
        c8 = cpu_best(8, f"{job}_cpu_s")
        c32 = cpu_best(32, f"{job}_cpu_s")
        cpu_rows.append((job, c8, c32, round(c32 / c8, 2) if c8 else None))

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
| per-event transform kernel, T6 deep changed-fields (s) | {k8} | {k32} | {k8 / k32:.2f}× | **{eff_kernel}** |
| transform kernel (events/s) | {n_events / k8:,.0f} | {n_events / k32:,.0f} | | |
| CDC streaming apply (s) | {s8} | {s32} | {s8 / s32:.2f}× | **{eff_stream}** |
| CDC streaming apply (events/s) | {n_events / s8:,.0f} | {n_events / s32:,.0f} | | |

## Total task CPU-seconds per job (flat across levels ⇒ no serialization)

Summed executorCpuTime over all completed stages (Spark stage metrics API),
least-contended run per level. Wall-clock can saturate on this single
shared memory subsystem, but if the 4N level did MORE total work (lock
contention, serialization, extra passes) it would show here — a ratio ≈ 1
means the engine gives the 4N cluster the same total work to spread over
4× the hardware:

| job | CPU-s @ local[8] | CPU-s @ local[32] | ratio (32/8) |
|---|---|---|---|
""" + "\n".join(
        f"| {j} | {c8} | {c32} | {ratio} |" for j, c8, c32, ratio in cpu_rows
    ) + """

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
                "best": {"batch8": b8, "batch32": b32, "stream8": s8, "stream32": s32,
                         "kernel8": k8, "kernel32": k32},
                "cpu_seconds": cpu_rows,
                "efficiency_batch": eff_batch,
                "efficiency_stream": eff_stream,
                "efficiency_kernel": eff_kernel,
            },
            f,
            indent=2,
        )
    print(json.dumps({"efficiency_batch": eff_batch, "efficiency_stream": eff_stream,
                      "efficiency_kernel": eff_kernel}))


if __name__ == "__main__":
    main()
