"""Driver-contract mirror: every queries() entry vs its oracle_sql() via
DuckDB — row count, schema (column names), and order-insensitive values —
exactly what the driver records into CORRECTNESS_r{N}.json, run at sf0.001
for speed (the driver runs sf0.01)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: f"{v:.4f}" if isinstance(v, float) else str(v))
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, con, name):
    sdf = entry_mod.queries()[name](spark, SF)
    got = _normalize(sdf.toPandas())
    want = _normalize(con.execute(entry_mod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    if not got.equals(want):
        diff_cols = [c for c in got.columns if not got[c].equals(want[c])]
        c = diff_cols[0]
        bad = got[c] != want[c]
        i = bad.idxmax()
        raise AssertionError(
            f"{name}: value mismatch col={c} row={i}: "
            f"spark={got[c].iloc[i]!r} duckdb={want[c].iloc[i]!r} "
            f"({int(bad.sum())} differing rows)"
        )


def test_rows_only_queries_run(spark):
    for name in set(entry_mod.queries()) - set(entry_mod.oracle_sql()):
        df = entry_mod.queries()[name](spark, SF)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "user_id" in df.columns and "pkey" in df.columns
