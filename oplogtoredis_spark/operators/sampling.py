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

  weighted_sample    A-ES weighted reservoir WITHOUT replacement — top-k by
                     ln(u)/w with u a hash draw; WindowGroupLimit prunes
                     map-side.
  resample_rate      deterministic resampling WITH replacement: floor(rate)
                     copies + one more iff the hash draw falls under the
                     fractional part — the up/downsampling primitive.
  mixture_resample   resample to TARGET domain proportions (static mixture
                     reweighting): rates derived from per-domain mass, one
                     stats pass + one map-only emit pass.

100 TB notes: hash_sample/hash_split are map-only (free at any scale);
stratified_sample's only shuffle is keyed by the strata columns with the
group-limit pushdown bounding shuffle volume — skewed strata cost their
winners, not their population; resample_rate is map-only with rate-bounded
output; mixture_resample adds one partial-agg'd stats shuffle whose result
is dimension-sized and broadcast back.
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
    bad = [(n, f) for n, f in splits if f <= 0]
    if bad:
        # a negative fraction can still sum to 1 — its cumulative
        # threshold then runs BACKWARD, silently starving that split and
        # inflating a neighbor
        raise ValueError(f"split fractions must be > 0, got {bad}")
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
    if rank_col in df.columns:
        raise ValueError(
            f"rank_col {rank_col!r} already exists in the input; pass "
            "another name (the sibling operators raise on exactly this "
            "collision — silently overwriting would lose caller data)"
        )
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


def resample_rate(
    df: DataFrame,
    key_col: str,
    rate_col: str,
    salt: str = "",
    copy_col: str = "copy",
    max_rate: float = 1000.0,
) -> DataFrame:
    """Deterministic resampling WITH replacement at a per-row ``rate``: a
    row is emitted ``floor(rate)`` times plus one more iff its hash draw
    falls under the fractional part — so every row's multiplicity is within
    1 of its rate and the EXPECTED output mass is exactly rate × input mass.
    This is the upsampling/downsampling primitive domain reweighting needs
    (rate 2.3 ⇒ 2 or 3 copies; rate 0.3 ⇒ 0 or 1), which the without-
    replacement samplers above cannot express.

    ``copy_col`` carries the copy index (0..copies-1) so downstream
    shuffling/packing can tell duplicates apart. NULL or non-positive rates
    emit nothing (same exclusion posture as weighted_sample). Rates above
    ``max_rate`` fail loud JVM-side — an explode at rate 10^6 is almost
    always a mis-derived rate, not intent.

    100 TB: map-only (filter + sequence-explode in the scan stage, no
    shuffle); output volume is rate-bounded by construction. The hash draw
    and the floor/fraction arithmetic are IEEE-identical in DuckDB, so the
    operator is exactly oracle-able (resample_copies_sql)."""
    for c in ("_copies", copy_col):
        if c in df.columns and c != rate_col:
            raise ValueError(
                f"resample_rate: input column {c!r} collides with an "
                "internal/output name; rename it or pass a different "
                "copy_col"
            )
    rate = F.col(rate_col).cast("double")
    checked = F.when(
        rate > F.lit(float(max_rate)),
        F.raise_error(
            F.concat(
                F.lit("resample_rate: rate "),
                rate.cast("string"),
                F.lit(
                    f" exceeds max_rate={max_rate} — almost always a "
                    "mis-derived rate; raise max_rate if intentional"
                ),
            )
        ).cast("double"),
    ).otherwise(rate)
    # copies = floor(rate) + [draw < frac(rate)·D]: the draw is an integer
    # in [0, D) so comparing it against frac·D as DOUBLES is exact and
    # engine-identical (no round/truncate step whose half-way rule could
    # differ between engines — the rate here is data-derived, not a
    # human-given decimal like hash_sample's fraction)
    draw = _sample_hash(F.col(key_col), salt)
    copies = (
        F.floor(checked)
        + F.when(
            draw.cast("double")
            < (checked - F.floor(checked)) * F.lit(float(_D)),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).cast("long")
    out = df.withColumn("_copies", copies).where(F.col("_copies") >= 1)
    # explode AFTER the >=1 filter: Spark's two-arg sequence() infers step
    # -1 when start > stop, so sequence(0, copies-1) at copies=0 would emit
    # [0, -1] — two phantom copies — instead of nothing
    return out.withColumn(
        copy_col,
        F.explode(F.sequence(F.lit(0), (F.col("_copies") - 1).cast("int"))),
    ).drop("_copies")


def resample_copies_sql(rate_expr: str, key_expr: str, salt: str = "") -> str:
    """DuckDB rendering of resample_rate's copies expression for
    oracle_sql strings (pair with ``unnest(range(copies))`` + a
    ``copies >= 1`` filter)."""
    h = sample_hash_sql(key_expr, salt)
    r = f"CAST(({rate_expr}) AS DOUBLE)"
    return (
        f"(CAST(floor({r}) AS BIGINT) + CASE WHEN CAST({h} AS DOUBLE) < "
        f"({r} - floor({r})) * {float(_D)!r} THEN 1 ELSE 0 END)"
    )


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    key_col: str,
    size_col: str | None = None,
    scale: float = 1.0,
    salt: str = "",
    copy_col: str = "copy",
    rate_col: str = "rate",
    max_rate: float = 1000.0,
) -> DataFrame:
    """Resample a corpus to TARGET domain proportions (the static-mixture
    reweighting every LLM data pipeline ends with: 'train on 50% web, 30%
    books, 20% code' when the raw corpus is nothing like that). Per listed
    domain d:  rate_d = scale · w_d · total_mass / mass_d, where mass is
    row count (or ``sum(size_col)`` — token/char mass — when given), so the
    EXPECTED output mass lands at scale × input mass with domain shares
    equal to ``weights``. Domains not listed are dropped (they have no
    target share); weights must be positive and sum to 1.

    Plan shape: one partial-agg'd shuffle over the corpus for the per-domain
    masses (dimension-sized result), total as an integer sum of those
    masses (order-independent — never a float sum), a broadcast join of the
    tiny rates frame back onto the corpus, then the map-only resample_rate
    explode. Two corpus scans total (the stats pass and the emit pass) —
    the unavoidable stats-then-apply shape. All rate arithmetic is integer
    until one literal·double·double expression, so the DuckDB oracle
    reproduces rates bit-for-bit."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    total_w = sum(weights.values())
    if abs(total_w - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total_w}")
    for c in ("_dom", rate_col, "_copies", copy_col):
        if c in df.columns:
            raise ValueError(
                f"mixture_resample: input column {c!r} collides with an "
                "internal/output name; rename it or pass different "
                "rate_col/copy_col"
            )
    dom = F.col(domain_col)
    mass_expr = F.count(F.lit(1)) if size_col is None else F.sum(F.col(size_col))
    masses = (
        df.where(dom.isin(*weights))
        .groupBy(dom.alias("_dom"))
        .agg(mass_expr.cast("long").alias("_m"))
    )
    tot = masses.agg(F.sum("_m").alias("_t"))
    w_case: Column | None = None
    for d, w in weights.items():
        sw = F.lit(float(scale * w))  # pre-folded in Python == the oracle's literal
        w_case = (
            F.when(F.col("_dom") == d, sw)
            if w_case is None
            else w_case.when(F.col("_dom") == d, sw)
        )
    # a weighted domain with ZERO corpus mass cannot receive its share —
    # the remaining domains would silently renormalize (requested .5/.3/.2
    # ships as .625/.375/0) and total output mass falls short; anchor the
    # rates frame on the EXPECTED domain list and fail loudly on a hole
    # (no extra job, no persist — the check rides the same tiny frame)
    expected = df.sparkSession.createDataFrame(
        [(d,) for d in weights], "_dom string"
    )
    rates = expected.join(F.broadcast(masses), "_dom", "left").crossJoin(
        F.broadcast(tot)
    ).select(
        "_dom",
        F.when(
            F.col("_m").isNull(),
            F.raise_error(
                F.concat(
                    F.lit("mixture_resample: weighted domain has no corpus "
                          "mass: "),
                    F.col("_dom"),
                )
            ).cast("double"),
        ).otherwise(
            w_case * F.col("_t").cast("double") / F.col("_m").cast("double")
        ).alias(rate_col),
    )
    joined = df.join(F.broadcast(rates), dom == F.col("_dom"), "inner").drop(
        "_dom"
    )
    return resample_rate(
        joined, key_col, rate_col, salt=salt, copy_col=copy_col,
        max_rate=max_rate,
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
    if rank_col in df.columns:
        raise ValueError(
            f"rank_col {rank_col!r} already exists in the input; pass "
            "another name"
        )
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
