"""Inverted-index construction and BM25 top-k retrieval over a document
corpus — the lexical-search half of an LLM data pipeline (dedup triage,
decontamination lookups, corpus QA queries all start from "find the docs
matching these terms").

Spark-first shape — the 100 TB corpus side is shuffled exactly ONCE:

  1. tokenize map-side (operators/text.tokens normalization: lowercase,
     whitespace split) and carry the document length THROUGH the postings
     aggregation as a grouping column (``dl`` is functionally dependent on
     the doc id, so it widens the shuffle key by one bigint instead of
     costing a second doc-keyed shuffle or a join back to the corpus);
  2. ``postings = groupBy(doc_id, dl, token).count()`` — the ONE big
     Exchange;
  3. document frequencies and the (N, avgdl) scalar row are small
     re-aggregations OVER the postings (never over the corpus);
  4. query terms are a literal/broadcast dimension: broadcast-joining them
     into the postings prunes the scored rows to matched tokens before any
     further work, document frequencies join broadcast the same way, and
     the corpus-level stats attach as a broadcast single-row cross join;
  5. per-(query, doc) scores are one partial-agg'd groupBy over matched
     postings only; top-k per query is a rank window that Spark executes
     as WindowGroupLimit (map-side k-pruning before the final sort).

Determinism across engines (the DuckDB oracle mirrors every expression):
per-term BM25 contributions are rounded to e4 FIXED POINT (floor(x*1e4 +
0.5) as bigint) before summation, so the per-(query, doc) score is an
integer sum — order-independent and bit-identical cross-engine; ties at
the k boundary resolve by ascending doc id.

Reference analogue: none — the reference (tulip/oplogtoredis) publishes
change events and leaves querying to downstream consumers; this operator
is part of the downstream corpus-analytics surface built on the same
tables (SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .text import tokens

#: Robertson/Sparck-Jones defaults.
DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, dl, token, tf) term-frequency postings.

    ``dl`` (per-document token count) rides the grouping key — one
    Exchange total, no join back to the corpus. Documents with zero
    tokens produce no postings (they can never match a query)."""
    toks = docs.select(
        F.col(id_col),
        F.filter(tokens(F.lower(F.col(text_col))), lambda x: x != "").alias(
            "_t"
        ),
    )
    exploded = toks.select(
        id_col, F.size("_t").alias("dl"), F.explode("_t").alias("token")
    )
    return exploded.groupBy(id_col, "dl", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )


def index_stats(post: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(token, n_docs, total_tf) — the inverted-index summary (posting-list
    sizes), a small re-aggregation over the postings."""
    return post.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tf").alias("total_tf")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """(query_id, doc_id, rank, score): BM25 top-k documents per query.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))   (non-negative variant)
    term = idf * ((tf * (k1+1)) / (tf + k1 * ((1-b) + (b*dl) / avgdl)))

    A query none of whose terms occur in the corpus (or whose text is
    empty/whitespace) produces ZERO output rows — absence of matches, not
    a zero-score row; left-join against the query table downstream to
    distinguish "no matches" from "query not submitted".

    Query terms are DISTINCT per query (repeated query words score once).
    N and avgdl cover documents with >= 1 token. Constants ``k1+1`` and
    ``1-b`` are pre-computed in Python and injected as literals so the
    SQL oracle can embed the bit-identical doubles (``repr`` round-trips).
    Scores are e4-fixed-point sums (see module docstring); ``score`` is
    the rounded 4-decimal double, ``rank`` breaks ties by ascending doc
    id so the k boundary is deterministic."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    post = postings(docs, id_col, text_col)
    # sum(least(tf, 1)) == count(*) here (tf is a count, always >= 1) —
    # written this way ON PURPOSE: a value-level dependency on tf keeps
    # this consumer's postings subtree column-identical to the other two,
    # so all three canonicalize equal and AQE materializes the corpus
    # scan + postings shuffle ONCE. count(1)/count(tf) both let Catalyst
    # prune tf out of this branch's copy (count(tf) is rewritten to
    # count(1) because tf is non-nullable), forking the plan into a
    # second full corpus pass.
    dft = post.groupBy("token").agg(
        F.sum(F.least(F.col("tf"), F.lit(1))).alias("dfreq")
    )
    # N and avgdl straight off the postings: sum(tf) over a document's
    # postings IS its token count, so avgdl = sum(tf) / count_distinct(doc)
    # exactly — and because this aggregates the SAME postings subtree as
    # dft and the scoring join, AQE's exchange reuse materializes the
    # corpus scan + postings shuffle ONCE for all three consumers (a
    # distinct(doc, dl) formulation would be a second corpus pass:
    # Catalyst collapses the two-level aggregate into a different-keyed
    # dedup that defeats reuse).
    stats = post.agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        (
            F.sum("tf").cast("double") / F.count_distinct(F.col(id_col))
        ).alias("avgdl"),
    )

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                F.filter(
                    tokens(F.lower(F.col(query_text_col))), lambda x: x != ""
                )
            ).alias("token"),
        )
        .distinct()
    )

    # (token, query_id, dfreq): document frequencies attach to the tiny
    # query-term dimension FIRST (dft is vocabulary-sized, the hash side
    # is the broadcast query terms), so the corpus postings see exactly
    # one broadcast join that both prunes to matched tokens and carries
    # everything scoring needs.
    qdim = dft.join(F.broadcast(qterms), "token")
    matched = post.join(F.broadcast(qdim), "token").crossJoin(
        F.broadcast(stats)
    )

    k1p1 = F.lit(k1 + 1.0)
    one_minus_b = F.lit(1.0 - b)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
        / (F.col("dfreq") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        one_minus_b + (F.lit(b) * F.col("dl")) / F.col("avgdl")
    )
    term = idf * ((F.col("tf") * k1p1) / denom)
    term_e4 = F.floor(term * F.lit(10000.0) + F.lit(0.5)).cast("long")

    scored = (
        matched.select("query_id", id_col, term_e4.alias("term_e4"))
        .groupBy("query_id", id_col)
        .agg(F.sum("term_e4").alias("score_e4"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e4").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            "rank",
            (F.col("score_e4") / F.lit(10000.0)).alias("score"),
        )
    )
