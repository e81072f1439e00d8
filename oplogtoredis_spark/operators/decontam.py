"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM training-data hygiene step (GPT-3 appendix C posture:
13-gram overlap against eval sets). Relational shape, Spark-first:

  1. benchmark side → explode n-grams, distinct            (tiny: eval sets
     are MBs even when the corpus is 100 TB)
  2. corpus side    → explode n-grams MAP-SIDE (no shuffle; the fan-out
     streams through the scan stage like chunk_documents)
  3. broadcast LEFT join corpus grams against the benchmark gram set —
     no shuffle of the 100 TB side
  4. one partial-agg'd groupBy(doc_id) counting DISTINCT matched grams

So the only Exchange the big side ever sees is the final per-document
aggregation, and its payload is (doc_id, matched-gram-or-null) — not text.
Every corpus document appears in the output (``explode_outer`` keeps
gram-less short docs), with ``n_hit_ngrams = 0`` / ``contaminated = false``.

Grams are matched as exact lowercase whitespace-token windows — the same
normalization as operators/text.tokens, and the DuckDB oracle reproduces it
verbatim (__spark_entry__.SQL_DECONTAMINATE). At scale the join key can be
``portable_hash64(gram)`` to shrink the broadcast; kept as the raw string
here so the oracle compares exact grams, not hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens

#: GPT-3-style default; driver query uses n=4 because the synthetic corpus
#: draws from a ~30-word vocabulary where 13-grams never collide.
DEFAULT_N = 13


def grams_from_tokens(toks: Column, n: int) -> Column:
    """n-gram strings from an ALREADY-MATERIALIZED token-array column.

    Callers must project the token array in a child select first
    (``_exploded_grams`` below does): Catalyst performs no common-
    subexpression elimination across higher-order-function lambda
    boundaries, so closing over the raw ``split()`` expression re-runs
    the regex tokenization once PER GRAM instead of once per document.

    Empty array when the document has fewer than n tokens — guarded
    explicitly because Spark's ``sequence(1, stop)`` with stop < 1 would
    generate a DESCENDING sequence, not an empty one.
    """
    if n < 1:
        # n=0 would make every document's gram set the single empty
        # string on BOTH sides of the decontam join — every doc flagged
        # contaminated, silently; n<0 dies in slice() mid-job
        raise ValueError(f"n must be >= 1, got {n}")
    last = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), last),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(last >= 1, grams).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column, n: int) -> Column:
    """Expression-level convenience (tests, one-off projections): grams
    straight from a text column. For per-document fan-out use the
    materialized path (see grams_from_tokens)."""
    return grams_from_tokens(tokens(F.lower(text)), n)


def _exploded_grams(
    df: DataFrame, cols: tuple[str, ...], text_col: str, n: int, outer: bool
) -> DataFrame:
    """(cols..., gram) — token array materialized once per doc, THEN the
    gram windows; the two selects stay separate plans (the token alias is
    referenced more than once, so CollapseProject keeps the boundary)."""
    explode = F.explode_outer if outer else F.explode
    toks = df.select(*cols, tokens(F.lower(F.col(text_col))).alias("_t"))
    return toks.select(
        *cols, explode(grams_from_tokens(F.col("_t"), n)).alias("gram")
    )


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = DEFAULT_N
) -> DataFrame:
    """Distinct gram set of the eval side — the broadcast dimension."""
    return _exploded_grams(benchmark, (), text_col, n, outer=False).distinct()


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """(id_col, n_hit_ngrams, contaminated) for EVERY corpus document.

    ``n_hit_ngrams`` counts DISTINCT benchmark grams the document contains
    (a document repeating one leaked gram five times counts 1 — the signal
    is breadth of overlap, not within-doc repetition).
    """
    bench = benchmark_ngrams(benchmark, text_col, n).withColumn(
        "_hit", F.lit(1)
    )
    corpus_grams = _exploded_grams(
        corpus, (id_col,), text_col, n, outer=True
    )
    joined = corpus_grams.join(F.broadcast(bench), "gram", "left")
    return joined.groupBy(id_col).agg(
        F.count_distinct(
            F.when(F.col("_hit").isNotNull(), F.col("gram"))
        ).alias("n_hit_ngrams")
    ).select(
        id_col,
        "n_hit_ngrams",
        (F.col("n_hit_ngrams") > 0).alias("contaminated"),
    )
