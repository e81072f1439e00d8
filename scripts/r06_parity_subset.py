"""Oracle-parity spot check for a subset of queries at a chosen SF.

Usage: python scripts/r06_parity_subset.py sf0.01 q1,q2,...
Mirrors tests/test_entry.py's compare (column names, row count,
order-insensitive 4-decimal values) so optimization edits can be verified
against the DuckDB oracle per-query without the full suite.
"""
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
SF = f"/root/testdata/{sf}"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

from oplogtoredis_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: f"{v:.4f}" if isinstance(v, float) else str(v))
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

spark = get_spark(
    "r06-parity",
    master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
    shuffle_partitions=64,
)
spark.sparkContext.setLogLevel("ERROR")

qmap = entry_mod.queries()
omap = entry_mod.oracle_sql()
fail = 0
for name in names or sorted(omap):
    try:
        got = _normalize(qmap[name](spark, SF).toPandas())
        want = _normalize(con.execute(omap[name]).fetchdf())
        assert list(got.columns) == list(want.columns), (
            f"cols {list(got.columns)} vs {list(want.columns)}"
        )
        assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
        assert got.equals(want), "value mismatch"
        print(f"PASS {name} rows={len(got)}")
    except Exception as ex:  # noqa: BLE001
        fail += 1
        print(f"FAIL {name}: {ex}")
spark.stop()
sys.exit(1 if fail else 0)
