"""Deterministic sampling operators for training-data pipelines.

Real pipelines need REPRODUCIBLE sampling: the same corpus snapshot must
yield the same sample at any cluster size, on any engine, on any day — and a
document's split membership must never change as the corpus grows (train/
eval leakage). So every operator here derives its randomness from the
portable content hash (functions/hashing.py), never from an RNG, which also
makes each one exactly oracle-able in DuckDB.

  hash_sample        Bernoulli-by-hash: keep iff h(key·salt) % D < p·D.
                     Pure filter — lives in the scan stage, no shuffle;
                     changing ``salt`` draws an independent sample.
  hash_split         disjoint train/eval/test assignment from one hash —
                     membership is a pure function of the key alone, so
                     adding documents never migrates existing ones between
                     splits, and the three sets are disjoint by construction.
  stratified_sample  top-k per stratum in hash order — bounded per-group
                     output whatever the stratum skew (a 10^9-doc stratum
                     and a 10-doc stratum both emit ≤ k); one shuffle on the
                     strata key, and Spark's WindowGroupLimit pushes the
                     rank bound map-side so the shuffle carries ≤ k rows per
                     stratum per map task, not the stratum.

100 TB notes: hash_sample/hash_split are map-only (free at any scale);
stratified_sample's only shuffle is keyed by the strata columns with the
group-limit pushdown bounding shuffle volume — skewed strata cost their
winners, not their population.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import portable_hash64, portable_hash64_sql

#: denominator for hash-fraction thresholds (1e6 ⇒ fractions to 4+ digits)
_D = 1_000_000


def _sample_hash(key: Column, salt: str) -> Column:
    """Uniform-ish draw in [0, _D) from the portable hash of key·salt."""
    return portable_hash64(F.concat(key.cast("string"), F.lit(salt))) % F.lit(_D)


def sample_hash_sql(expr: str, salt: str) -> str:
    """DuckDB rendering of _sample_hash for oracle_sql strings."""
    return f"({portable_hash64_sql(f'({expr})::VARCHAR || {salt!r}')} % {_D})"


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its key hashes under
    the fraction threshold. Same key ⇒ same verdict, forever."""
    # round(), not truncation: fractions not exactly representable in binary
    # (0.29 → 289999.999…) would otherwise shift the threshold by one hash
    # value versus the requested fraction (ADVICE r4)
    return df.where(
        _sample_hash(F.col(key_col), salt) < F.lit(int(round(fraction * _D)))
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("eval", 0.05),
        ("test", 0.05),
    ),
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Disjoint named splits from one hash draw: cumulative fraction
    thresholds partition [0, 1). Fractions must sum to 1."""
    total = sum(f for _n, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    h = _sample_hash(F.col(key_col), salt)
    expr: Column | None = None
    acc = 0.0
    for name, frac in splits[:-1]:
        acc += frac
        cond = h < F.lit(int(round(acc * _D)))  # round, not truncate (ADVICE r4)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(splits[-1][0]) if expr is None else expr.otherwise(F.lit(splits[-1][0]))
    )
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: tuple[str, ...],
    k: int,
    key_col: str,
    salt: str = "",
    rank_col: str = "rk",
) -> DataFrame:
    """At most ``k`` rows per stratum, chosen deterministically in hash
    order (ties broken by the key itself): the reproducible analogue of a
    per-group reservoir sample."""
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        _sample_hash(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def weighted_score(key: Column, weight: Column, salt: str = "") -> Column:
    """Efraimidis–Spirakis weighted-reservoir score: ln(u)/w with u a
    deterministic uniform in (0, 1] drawn from the portable hash of
    key·salt (the +1 keeps u off 0 so ln is defined). Top-k by this score
    DESC is a weighted sample without replacement — inclusion probability
    proportional to weight — reproducible on any engine because u is a
    hash, not an RNG, and ln/divide are IEEE-identical on identical
    inputs."""
    u = (_sample_hash(key, salt) + F.lit(1)).cast("double") / F.lit(
        float(_D + 1)
    )
    return F.log(u) / weight


def weighted_score_sql(key_expr: str, weight_expr: str, salt: str = "") -> str:
    """DuckDB rendering of weighted_score for oracle_sql strings."""
    return (
        f"ln(CAST({sample_hash_sql(key_expr, salt)} + 1 AS DOUBLE)"
        f" / {float(_D + 1)!r}) / ({weight_expr})"
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_cols: tuple[str, ...] = (),
    salt: str = "",
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: at most ``k``
    rows (per stratum, if ``strata_cols`` given), drawn with probability
    proportional to ``weight_col`` — the A-ES reservoir expressed as a
    rank window, so Spark's WindowGroupLimit prunes to k rows per group
    map-side BEFORE the shuffle (the same scale shape as
    stratified_sample; an actual sequential reservoir would be a
    per-partition loop Spark can't prune).

    Rows with NULL or non-positive weight are EXCLUDED (they carry no
    sampling mass; ln(u)/w would flip sign and outrank everything) —
    filtered loudly here rather than silently mis-ranked. Ties
    (identical score) break by the key."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    eligible = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    )
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        weighted_score(F.col(key_col), F.col(weight_col), salt).desc(),
        F.col(key_col),
    )
    return (
        eligible.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
