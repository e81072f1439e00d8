"""Declarative data-quality expectation suite (the dbt-tests / Deequ
posture): a pipeline gate that reports violation counts per check in as
few passes as the checks allow.

Check families and their plan shapes:

  not_null / in_range / accepted_values — ROW-LOCAL: all such checks fold
      into ONE aggregate over ONE scan of the table (a sum of CASEs per
      check, unpivoted to rows). Adding a tenth row-local check costs one
      more expression, not one more pass — the property that matters when
      the table is 100 TB.
  unique — one partial-agg'd shuffle on the key; violations = rows in
      excess of one per duplicated key (sum(cnt−1) over cnt>1).
  foreign_key — a null-safe LEFT ANTI join against the parent keys:
      dimension parents broadcast (``broadcast=True``), fact-sized parents
      shuffle on the key. NULL child keys are NOT violations (SQL FK
      semantics); add a not_null check to forbid them.

Output: one row per check — (check: string, n_violations: long) — built
lazily and unioned, so the whole suite is one DataFrame the caller can
gate on (``.where(n_violations > 0)``) or sink as a report.

Reference analogue: none (the reference trusts its source); this is part
of the training-data-pipeline surface, where a bad upstream batch must be
caught before it reaches the corpus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def not_null(col: str) -> dict:
    return {"kind": "row", "name": f"not_null:{col}",
            "pred": F.col(col).isNull()}


def in_range(col: str, lo: float, hi: float) -> dict:
    return {
        "kind": "row",
        "name": f"in_range:{col}[{lo},{hi}]",
        "pred": F.col(col).isNotNull()
        & ~F.col(col).between(F.lit(lo), F.lit(hi)),
    }


def accepted_values(col: str, values: Sequence) -> dict:
    # NULLs are never violations (use not_null to forbid them) — and a None
    # INSIDE the list would poison isin with three-valued NULL logic
    # (x IN (..., NULL) is NULL, not False, so ~isin silently flags nothing)
    vals = [v for v in values if v is not None]
    return {
        "kind": "row",
        "name": f"accepted_values:{col}",
        "pred": F.col(col).isNotNull() & ~F.col(col).isin(vals),
    }


def unique(cols: Sequence[str]) -> dict:
    return {"kind": "unique", "name": f"unique:{','.join(cols)}",
            "cols": list(cols)}


def foreign_key(
    cols: Sequence[str],
    parent: DataFrame,
    parent_cols: Sequence[str],
    broadcast: bool = True,
) -> dict:
    if len(cols) != len(parent_cols):
        raise ValueError("foreign_key: child/parent column counts differ")
    return {
        "kind": "fk",
        "name": f"foreign_key:{','.join(cols)}",
        "cols": list(cols),
        "parent": parent,
        "parent_cols": list(parent_cols),
        "broadcast": broadcast,
    }


def run_expectations(df: DataFrame, checks: Sequence[dict]) -> DataFrame:
    """Evaluate every check against ``df`` → (check, n_violations) rows.

    Row-local checks share one scan/aggregate; each unique/foreign_key
    check contributes its own (shuffled / anti-joined) single-row branch;
    the union is lazy — one job materializes the whole report.
    """
    if not checks:
        raise ValueError("run_expectations: no checks given")
    names = [c["name"] for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    parts: list[DataFrame] = []
    row_checks = [c for c in checks if c["kind"] == "row"]
    if row_checks:
        # positional aliases: check names carry dots/brackets that column-
        # name-based unpivot would parse as multipart identifiers
        agg = df.agg(
            *[
                F.sum(F.when(c["pred"], 1).otherwise(0))
                .cast("long")
                .alias(f"_c{i}")
                for i, c in enumerate(row_checks)
            ]
        )
        kv = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c["name"]).alias("check"),
                        # a sum over zero rows is NULL — an empty table passes
                        F.coalesce(F.col(f"_c{i}"), F.lit(0)).alias(
                            "n_violations"
                        ),
                    )
                    for i, c in enumerate(row_checks)
                ]
            )
        )
        parts.append(
            agg.select(kv.alias("_kv")).select("_kv.check", "_kv.n_violations")
        )
    for c in checks:
        if c["kind"] == "unique":
            parts.append(
                df.groupBy(*c["cols"])
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
                .select(F.lit(c["name"]).alias("check"), "n_violations")
            )
        elif c["kind"] == "fk":
            parent = c["parent"].select(
                *[
                    F.col(pc).alias(cc)
                    for cc, pc in zip(c["cols"], c["parent_cols"])
                ]
            ).dropDuplicates(c["cols"])
            if c["broadcast"]:
                parent = F.broadcast(parent)
            # MATCH SIMPLE: a row is only checked when ALL key columns are
            # non-null (add not_null checks to forbid null keys)
            all_set = F.lit(True)
            for cc in c["cols"]:
                all_set = all_set & F.col(cc).isNotNull()
            orphans = (
                df.where(all_set)
                .join(parent, c["cols"], "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                .select(F.lit(c["name"]).alias("check"), "n_violations")
            )
            parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
