"""Table profiling / data-quality summary — the ingest-validation pass a
100 TB CDC pipeline runs before trusting a new snapshot: per-column null
counts, exact (or sketched) distinct cardinalities, and numeric ranges,
in ONE aggregation job.

Shape: every requested column contributes its statistics to a single
wide aggregate row (one pass over the table, partial aggregation
map-side), which is then unpivoted driver-free into the long
``(column, n_rows, n_nulls, n_distinct, min_value, max_value)`` form via
an inline array-of-structs explode — no per-column jobs, no union of N
scans.

Exactness: ``exact=True`` (default) uses ``count_distinct`` — Spark plans
the multi-column distinct with one Expand (rows × columns) feeding one
shuffle; that is the oracle-parity mode. ``exact=False`` swaps in
``approx_count_distinct`` (HyperLogLog++, mergeable sketch, NO Expand) —
the 100 TB path, same output schema, documented rsd.

``min_value``/``max_value`` are populated only for numeric columns
(cast to double); non-numeric columns carry NULL — a deliberate contract
so the output schema is uniform and the DuckDB oracle can mirror the
numeric-only casting decision from the same static schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType


def profile_table(
    df: DataFrame,
    columns: tuple[str, ...] | list[str] | None = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column. ``columns=None`` profiles every column."""
    cols = list(columns) if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in the frame: {missing}")
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c), rsd)
            ).alias(f"_nd_{c}")
        )
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_mx_{c}"))
    wide = df.agg(*aggs)

    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            (
                F.col(f"_mn_{c}")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias("min_value"),
            (
                F.col(f"_mx_{c}")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*entries)).alias("_e")).select("_e.*")
