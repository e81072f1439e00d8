"""Exact edit-distance similarity join (FastSS deletion neighborhoods).

The short-string counterpart to the shingle/MinHash family in dedup.py:
find all pairs within Levenshtein distance ``k`` over a bounded key (a
title, a normalized prefix, an identifier) WITHOUT an all-pairs product.

Candidate generation is the FastSS / SymSpell deletion-neighborhood
scheme: every string emits all variants obtainable by deleting up to
``k`` characters (including itself); two strings within edit distance
``k`` are guaranteed to share at least one variant (a substitution is a
same-position deletion on both sides, an insert/delete is a deletion on
the longer side), so an equality self-join on the variant string is a
COMPLETE candidate generator. Precision comes from the verify stage —
``levenshtein(key_a, key_b, threshold=k)`` — which only ever runs on
candidates.

Scale shape (100 TB): the explode is map-side with a bounded fan-out
(len+1 variants at k=1, O(len²/2) at k=2 — keys are short by contract);
the self-join shuffles on the variant string (short keys), candidates
are deduped with ONE shuffle before the bounded-cost verify, and no
plan node is ever a Cartesian/nested-loop product (plan-pinned in
tests). Hot variants (e.g. a boilerplate prefix shared by m docs)
inherently produce O(m²) true candidates — that is the answer's own
size, not an artifact; ``max_bucket`` optionally drops such variants
(documented recall trade, off by default to keep exact semantics).

Reference analogue: none — the reference (tulip/oplogtoredis) publishes
CDC events and leaves corpus hygiene to consumers; this is part of the
training-data-pipeline surface layered on the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deletion_variants(key: F.Column, k: int = 1) -> F.Column:
    """Array of all strings obtained from ``key`` by deleting up to ``k``
    characters (the string itself included), distinct.

    ``key`` must be a CHEAP expression (a column reference): the transform
    lambdas close over it, and Spark does no common-subexpression
    elimination across lambda boundaries — a computed key would be
    re-evaluated per element (CLAUDE.md's measured O(n²) trap). Callers
    materialize derived keys in a child projection first.
    """
    if k not in (1, 2):
        raise ValueError(f"k must be 1 or 2, got {k}")

    def _del_one(s: F.Column) -> F.Column:
        # delete char i (1-based): prefix [1, i-1] + suffix [i+1, ...]
        # guard empty strings: sequence(1, 0) would step DOWNWARD ([1, 0]).
        return F.when(
            F.length(s) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.length(s)),
                lambda i: F.concat(
                    s.substr(F.lit(1), i - 1),
                    s.substr(i + 1, F.length(s)),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    variants = F.array_union(F.array(key), _del_one(key))
    if k == 2:
        variants = F.array_union(
            variants, F.array_distinct(F.flatten(F.transform(variants, _del_one)))
        )
    return variants


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    k: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein(key_a, key_b) <= k``.

    Output: (id_a, id_b, key_a, key_b, dist) — exact and complete unless
    ``max_bucket`` is set, which drops variants shared by more than that
    many rows (bounds worst-case candidate blow-up at a recall cost).

    Plan: map-side variant explode → equality self-join on the variant →
    one dedup shuffle on the pair → threshold-bounded levenshtein verify.
    """
    # no collision guard needed: the select below drops every input
    # column except id/key, so caller columns can never shadow internals
    base = df.select(F.col(id_col).alias("id"), F.col(key_col).alias("key"))
    var = base.withColumn(
        "_ed_var", F.explode(deletion_variants(F.col("key"), k))
    )
    if max_bucket is not None:
        keep = (
            var.groupBy("_ed_var")
            .agg(F.count(F.lit(1)).alias("_ed_n"))
            .where(F.col("_ed_n") <= max_bucket)
            .select("_ed_var")
        )
        var = var.join(keep, "_ed_var")
    a, b = var.alias("a"), var.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._ed_var") == F.col("b._ed_var"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
        )
    )
    # verify BEFORE the dedup, dedup via min_by: deduping on ids alone
    # before the verify kept an ARBITRARY key pair when id_col is not
    # unique — output flickered between distances across runs. levenshtein
    # here is map-side (each pair appears once per shared variant, <= k+1
    # rows) and the ONE pair-keyed aggregation both dedups and elects the
    # closest key pair deterministically (keys as tiebreak) — same shuffle
    # count as the old dropDuplicates.
    verified = cand.withColumn(
        "dist", F.levenshtein("key_a", "key_b", k)
    ).where(F.col("dist") >= 0)  # threshold form returns -1 past k
    return verified.groupBy("id_a", "id_b").agg(
        F.min_by(
            F.struct("key_a", "key_b", "dist"),
            F.struct("dist", "key_a", "key_b"),
        ).alias("_best")
    ).select("id_a", "id_b", "_best.key_a", "_best.key_b", "_best.dist")
