"""profile_table (operators/profile.py): per-column DQ stats in one job."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "a", 1.5, None),
        (2, "a", -2.0, "x"),
        (None, "b", 1.5, "x"),
        (4, None, None, "y"),
        (4, "b", 99.25, None),
    ]
    return spark.createDataFrame(
        rows, "id long, tag string, score double, note string"
    )


def test_exact_profile_values(spark, frame):
    got = {r.column: r for r in profile_table(frame).collect()}
    assert set(got) == {"id", "tag", "score", "note"}
    assert all(r.n_rows == 5 for r in got.values())
    assert (got["id"].n_nulls, got["id"].n_distinct) == (1, 3)
    assert (got["id"].min_value, got["id"].max_value) == (1.0, 4.0)
    assert (got["tag"].n_nulls, got["tag"].n_distinct) == (1, 2)
    assert got["tag"].min_value is None and got["tag"].max_value is None
    assert (got["score"].n_nulls, got["score"].n_distinct) == (1, 3)
    assert (got["score"].min_value, got["score"].max_value) == (-2.0, 99.25)
    assert (got["note"].n_nulls, got["note"].n_distinct) == (2, 2)


def test_column_subset_and_guards(spark, frame):
    got = profile_table(frame, columns=("id",)).collect()
    assert len(got) == 1 and got[0].column == "id"
    with pytest.raises(ValueError, match="not in the frame"):
        profile_table(frame, columns=("nope",))
    with pytest.raises(ValueError, match="no columns"):
        profile_table(frame, columns=())


def test_approx_mode_schema_and_accuracy(spark):
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 100).alias("m")
    )
    exact = {r.column: r.n_distinct for r in profile_table(df).collect()}
    approx = {r.column: r.n_distinct for r in profile_table(df, exact=False).collect()}
    assert exact == {"id": 2000, "m": 100}
    for c in exact:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.15
    # approx mode must not pay the Expand (rows x columns blow-up)
    plan = profile_table(df, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_exact_mode_single_pass(spark, frame, tmp_path):
    """One scan, one Expand, one aggregation tree — no per-column jobs."""
    path = str(tmp_path / "t")
    frame.write.parquet(path)
    df = profile_table(spark.read.parquet(path))
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("FileScan parquet") == 1
    assert final.count("Expand") == 1
    assert "Join" not in final
