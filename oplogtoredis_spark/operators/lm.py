"""Corpus-trained character n-gram language model + perplexity scoring.

The CCNet/KenLM quality-filter posture every web-scale corpus pipeline
carries: train an n-gram LM on a (reference) corpus, score every document
by smoothed cross-entropy, and gate/bucket documents by how "in-
distribution" their text is — garbage, boilerplate, and wrong-language
text all surface as high negative log-likelihood outliers. The reference
(tulip/oplogtoredis) has no analogue; this belongs to the training-data
operator family (dedup, decontamination, quality, sampling).

Model: character-level n-grams with add-k smoothing,

    p(nxt | ctx) = (C(ctx, nxt) + k) / (C(ctx) + k·V)

with ``ctx`` the (n-1)-char context, ``V`` the trained next-char vocabulary
size. Unseen (ctx, nxt) and unseen ctx fall out of the SAME expression via
``coalesce(C, 0)`` (an unseen context scores exactly 1/V per char).

Exactness (the DuckDB-oracle discipline): all counts are integers; the only
float work per gram is one division and one ``ln``, immediately fixed to
e4 via ``floor(x·1e4 + 0.5)`` (the BM25 idiom — engine-identical, no
half-even/half-away ambiguity) so per-document SUMS are integer and
order-independent. ``avg_nll`` (nats/char) divides once at the end.

100 TB shape: a char-level LM is bounded by alphabet^n REGARDLESS of corpus
size, so the scoring join BROADCASTS the model — documents never shuffle
for it; training is one partial-agg'd shuffle keyed by (ctx, nxt); the
per-doc re-aggregation is the only corpus-keyed shuffle. Train + score is
two corpus scans (the stats-then-apply shape, same as mixture_resample).
Word-level LMs would break the broadcast bound — out of scope by design.

Spark footgun (pinned in tests): two-arg ``sequence(1, stop)`` with
stop < 1 generates a DESCENDING sequence, not an empty one — documents
shorter than n chars are filtered BEFORE the gram explode (DuckDB's
``range`` is empty there, so the engines would otherwise diverge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: add-k smoothing default (Laplace)
DEFAULT_K = 1.0


def char_grams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, ctx, nxt): one row per character n-gram. The transform lambda
    closes over only the raw text column (cheap — no CSE hazard); documents
    shorter than n chars emit nothing (explicit filter, see module
    docstring)."""
    if n < 2:
        raise ValueError(f"n must be >= 2 (a context needs >= 1 char), got {n}")
    t = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - F.lit(n - 1)),
        lambda i: t.substr(i, F.lit(n)),
    )
    return (
        df.where(F.length(t) >= n)
        .select(id_col, F.explode(grams).alias("_g"))
        .select(
            id_col,
            F.substring("_g", 1, n - 1).alias("ctx"),
            F.substring("_g", n, 1).alias("nxt"),
        )
    )


def lm_train(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(ctx, nxt, c): integer n-gram counts — the whole trained model.
    One partial-agg'd shuffle; result bounded by alphabet^n."""
    return (
        char_grams(docs, id_col, text_col, n)
        .groupBy("ctx", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def lm_score(
    docs: DataFrame,
    lm: DataFrame,
    n: int = 3,
    k: float = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_grams, nll_e4, avg_nll): smoothed cross-entropy of each
    document under the trained counts. ``nll_e4`` is the exact integer sum
    of per-gram e4-fixed costs; ``avg_nll`` is nats/char rounded to 4
    decimals (the driver-contract float convention). Documents shorter
    than n chars emit nothing. The model side (counts + context totals +
    vocab) is broadcast — alphabet-bounded, never a corpus shuffle."""
    if k <= 0:
        raise ValueError(f"add-k smoothing needs k > 0, got {k}")
    for c in ("ctx", "nxt", "_g"):
        if c in docs.columns:
            raise ValueError(
                f"lm_score: input column {c!r} collides with an internal "
                "name; rename it"
            )
    # the model-side join outputs are internal names too: an id_col named
    # like one of them would come out ambiguous/duplicated after the
    # broadcast joins (ADVICE r5)
    if id_col in ("c", "ctx_c", "v", "_cost"):
        raise ValueError(
            f"lm_score: id_col {id_col!r} collides with a model-side join "
            "output; rename it"
        )
    ctx_tot = lm.groupBy("ctx").agg(F.sum("c").cast("long").alias("ctx_c"))
    vocab = lm.agg(F.count_distinct("nxt").cast("long").alias("v"))
    grams = char_grams(docs, id_col, text_col, n)
    # two LEFT broadcast joins: (ctx, nxt) for the pair count, ctx alone
    # for the context total (an unseen pair under a SEEN context still
    # needs C(ctx)); coalesce(·, 0) makes the smoothing expression total
    j = (
        grams.join(F.broadcast(lm), ["ctx", "nxt"], "left")
        .join(F.broadcast(ctx_tot), ["ctx"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    # an EMPTY model (trained on zero usable docs) makes v = 0 and the
    # denominator 0 for unseen contexts — under ANSI mode that is a bare
    # DIVIDE_BY_ZERO deep in the score job; name the condition instead
    denom = F.when(
        F.col("v") == 0,
        F.raise_error(
            F.lit("lm_score: empty language model (no usable training "
                  "docs of length >= n)")
        ).cast("double"),
    ).otherwise(
        F.coalesce(F.col("ctx_c"), F.lit(0)) + F.lit(float(k)) * F.col("v")
    )
    p = (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(k))) / denom
    cost = F.floor(-F.log(p) * F.lit(10000.0) + F.lit(0.5)).cast("long")
    return (
        j.select(id_col, cost.alias("_cost"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("_cost").alias("nll_e4"),
        )
        .select(
            id_col,
            "n_grams",
            "nll_e4",
            F.round(
                F.col("nll_e4") / (F.col("n_grams") * F.lit(10000.0)), 4
            ).alias("avg_nll"),
        )
    )


def lm_perplexity(
    docs: DataFrame,
    n: int = 3,
    k: float = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-scoring convenience: train on ``docs``, score ``docs`` — the
    outlier-detection posture (CCNet trains on a curated reference corpus;
    self-training flags whatever deviates from the corpus's own bulk
    statistics)."""
    return lm_score(
        docs, lm_train(docs, n, id_col, text_col), n, k, id_col, text_col
    )
