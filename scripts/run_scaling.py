"""Scaling-efficiency evidence: the same bench at local[8] vs local[32].

The north_rule's two-cluster-size criterion (N vs 4N executors, efficiency
≥ 0.8) cannot use a real cluster in this sandbox; per BASELINE.md the
sandbox stand-in is the identical job at two parallelism levels on identical
input. Each level runs in a fresh JVM (subprocess) so nothing is shared.

Writes BENCH/BASELINE.md with throughput at both levels + efficiency.
Efficiency here is reported for the CDC apply paths:
    eff = (events_per_sec[32] / events_per_sec[8]) / 4
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("OTR_BENCH_EVENTS", "2000000")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    r8 = run_level(8)
    r32 = run_level(32)

    def eff(key: str) -> float:
        return round((r32[key] / r8[key]) / 4.0, 3)

    eff_batch = eff("cdc_batch_events_per_sec")
    eff_stream = eff("cdc_stream_events_per_sec")
    speed_suite = round(r8["value"] / r32["value"], 2)

    md = f"""# BENCH — scaling evidence (local[8] vs local[32], identical input)

Sandbox stand-in for the north_rule's N vs 4N executor criterion
(see BASELINE.md): the identical job — same generated change-event log
(seed 42, {r8['cdc_events_total']:,} events incl. duplicates/junk), same
headline queries at sf{r8['sf']} — run in fresh JVMs at two parallelism
levels.

| metric | local[8] | local[32] | ratio (32/8) | scaling efficiency (ratio/4) |
|---|---|---|---|---|
| CDC batch replay (events/s) | {r8['cdc_batch_events_per_sec']:,.0f} | {r32['cdc_batch_events_per_sec']:,.0f} | {r32['cdc_batch_events_per_sec']/r8['cdc_batch_events_per_sec']:.2f}× | **{eff_batch}** |
| CDC streaming apply (events/s) | {r8['cdc_stream_events_per_sec']:,.0f} | {r32['cdc_stream_events_per_sec']:,.0f} | {r32['cdc_stream_events_per_sec']/r8['cdc_stream_events_per_sec']:.2f}× | **{eff_stream}** |
| headline suite wall (s) | {r8['value']} | {r32['value']} | {speed_suite}× | {round(speed_suite/4,3)} |

Reference single-node baseline (BASELINE.md): ~2,844 events/s end-to-end CDC
apply. This engine's streaming apply at local[8]: **{r8['cdc_stream_events_per_sec']:,.0f} events/s**
({r8['cdc_stream_events_per_sec']/2844:.0f}× the reference); batch replay: {r8['cdc_batch_events_per_sec']:,.0f} events/s.

Caveats on the sandbox numbers:
- single machine: levels share memory bandwidth and page cache, and Spark
  local mode has no network shuffle — both flatten the high end, so the
  efficiency figures below understate what discrete executors would show for
  shuffle-light stages and overstate nothing.
- per-query timings at both levels are in BENCH_scaling.json alongside this
  file.

## Per-query wall seconds

| query | local[8] | local[32] |
|---|---|---|
""" + "\n".join(
        f"| {k} | {r8['queries'][k]} | {r32['queries'][k]} |" for k in r8["queries"]
    ) + "\n"

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "BENCH_scaling.json"), "w") as f:
        json.dump({"local8": r8, "local32": r32,
                   "efficiency_batch": eff_batch,
                   "efficiency_stream": eff_stream}, f, indent=2)
    print(json.dumps({"efficiency_batch": eff_batch, "efficiency_stream": eff_stream}))


if __name__ == "__main__":
    main()
