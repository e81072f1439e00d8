"""Dump `.explain("formatted")` for named headline queries to plans/r06/.

Usage: python scripts/dump_plan.py <suffix> <name> [name ...]
Writes plans/r06/<name>_<suffix>.txt for each query. Runs at sf0.001 (plan
shape, not timing) on a small local session. For fixture-building queries
the captured plan is that of the RETURNED DataFrame (the imperative phases
are adjudicated by job-count evidence in OPTIMIZATION_r06.md instead).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("OTR_PLAN_SF", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    import __spark_entry__ as E
    from oplogtoredis_spark.session import get_spark

    spark = get_spark("plans-r06", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = E.queries()
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    for n in names:
        df = qmap[n](spark, SF)
        out = os.path.join(REPO, "plans", "r06", f"{n}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(plan_of(df))
        print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
