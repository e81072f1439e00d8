"""Text-analysis operators for large-scale training-data pipelines.

All four are pure Catalyst expressions (JVM-side, codegen, no UDFs):
tokenization, language-ID heuristic, quality scoring, and an order-sensitive
document fingerprint. Each has an exact DuckDB-oracle rendering (see
__spark_entry__.py) — integer/rounded outputs so value-hash parity holds.

Scale: every operator is a narrow projection — no shuffle, no state. At
100 TB these run inside the scan stage; only downstream groupBys shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import MERSENNE31, portable_hash31

# small fixed stopword inventory (language-ID heuristic).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(text: Column) -> Column:
    """Whitespace tokenization. DuckDB mirror: string_split_regex(trim(x),'\\s+')."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish count: word pieces + digit runs + punctuation marks, the
    cheap regex stand-in for a BPE tokenizer's length estimate."""
    pieces = F.regexp_extract_all(text, F.lit(r"[A-Za-z]{1,4}|\d+|[^\sA-Za-z\d]"), 0)
    return F.size(pieces)


# ---------------------------------------------------------------------------
# Deterministic subword BPE (fixed merge table) — training-faithful counts
# ---------------------------------------------------------------------------

#: Fixed BPE merge table in rank order (application order). Multi-character
#: parts appear only after the merges that form them. Shipped as a literal:
#: the vocabulary IS part of the operator's identity, like a tokenizer's
#: merges.txt.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"), ("r", "e"),
    ("a", "t"), ("e", "n"), ("o", "r"), ("e", "s"), ("t", "i"), ("a", "r"),
    ("a", "l"), ("o", "u"), ("s", "t"), ("e", "d"), ("i", "s"), ("i", "t"),
    ("o", "f"), ("th", "e"), ("an", "d"), ("in", "g"), ("er", "s"),
    ("ti", "on"),
)


def bpe_count_expr(word_expr: str, dialect: str) -> str:
    """SQL expression counting the BPE tokens of one lowercase-alnum word.

    The trick that makes real BPE expressible as PURE string expressions
    (JVM-side in Spark, and byte-identical in DuckDB for the oracle): a word
    is encoded with a double unit-separator between tokens —
    ``US US c1 US US c2 US US`` — and each merge (a, b) in rank order is one
    ``replace(s, US·a·US·US·b·US, US·ab·US)``: the single-US guards pin
    whole-token boundaries (no suffix/prefix false matches), and because a
    match consumes only the INNER half of each boundary, adjacent pairs all
    merge in one left-to-right non-overlapping pass — exactly one pass per
    merge rank, the standard fast BPE application order (canonical BPE
    re-scans for re-formed pairs of the SAME rank, which a fixed 24-merge
    table cannot produce). Token count = US-count/2 - 1.

    ``dialect``: "spark" ($1 backref, implicit global regex replace) or
    "duckdb" (\\1 backref, explicit 'g' flag).
    """
    s1 = "chr(31)"
    ss = f"({s1} || {s1})"
    if dialect == "spark":
        enc = f"{ss} || regexp_replace({word_expr}, '(.)', concat('$1', {ss}))"
    elif dialect == "duckdb":
        enc = f"{ss} || regexp_replace({word_expr}, '(.)', '\\1' || {ss}, 'g')"
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    for a, b in BPE_MERGES:
        pat = f"{s1} || '{a}' || {ss} || '{b}' || {s1}"
        rep = f"{s1} || '{a}{b}' || {s1}"
        enc = f"replace({enc}, {pat}, {rep})"
    return f"((length({enc}) - length(replace({enc}, {s1}, ''))) / 2 - 1)"


def bpe_token_count(text_col: str) -> Column:
    """Total BPE token count per document: words = lowercase [a-z0-9]+ runs,
    each word tokenized by the fixed merge table, summed. A narrow
    projection — the per-word fold runs inside a higher-order transform, no
    explode, no shuffle; punctuation/whitespace carries no tokens (they are
    the word delimiters, as in byte-level BPE pretokenization)."""
    cnt = bpe_count_expr("w", "spark")
    return F.expr(
        f"aggregate(transform(regexp_extract_all(lower({text_col}),"
        f" '[a-z0-9]+', 0), w -> CAST({cnt} AS BIGINT)),"
        f" CAST(0 AS BIGINT), (a, x) -> a + x)"
    )


def bpe_token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens_bpe) for every document — the registered query form."""
    return df.select(
        F.col(id_col), bpe_token_count(text_col).alias("n_tokens_bpe")
    )


def _bpe_word_hist(df: DataFrame, text_col: str) -> DataFrame:
    """(enc, cnt) word histogram — the ONE corpus-wide shuffle of BPE
    training; every training round afterwards touches only vocabulary rows
    (10^6–10^8 at 100 TB, not the corpus). Words use the same
    double-unit-separator encoding as ``bpe_count_expr``."""
    return (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            F.expr(
                "concat(chr(31), chr(31),"
                " regexp_replace(word, '(.)', concat('$1', chr(31), chr(31))))"
            ).alias("enc"),
            "cnt",
        )
    )


def _bpe_round_argmax(cur: DataFrame) -> DataFrame:
    """One training round's pair argmax over the encoded vocabulary:
    adjacent symbol pairs weighted by word count (zip_with against the
    1-shifted symbol array — null-padded, so single-symbol words contribute
    nothing), then the (count DESC, lhs, rhs) deterministic winner."""
    ss = "\x1f\x1f"
    # the symbol array is aliased in a CHILD projection: the zip_with
    # lambda below closes over it, and Catalyst does no CSE across
    # lambda boundaries (CLAUDE.md's trap — split would re-run per pair)
    syms = cur.select(
        "cnt",
        F.filter(F.split(F.col("enc"), ss), lambda x: x != "").alias("_syms"),
    )
    pairs = syms.select(
        "cnt",
        F.explode(
            F.zip_with(
                F.col("_syms"),
                F.slice(F.col("_syms"), 2, F.size("_syms")),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("pr"),
    ).where(F.col("pr.r").isNotNull())
    return (
        pairs.groupBy(F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs"))
        .agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
        .limit(1)
    )


_BPE_TRAIN_SCHEMA = "merge_rank int, lhs string, rhs string, pair_count long"


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    mode: str = "rounds",
    persist_every: int = 64,
) -> DataFrame:
    """LEARN a BPE merge table from the corpus (the training half of the
    tokenizer — ``BPE_MERGES``/``bpe_count_expr`` above are the application
    half): (merge_rank, lhs, rhs, pair_count), ranks 1..n_merges in the
    order the merges were learned.

    Classic BPE training re-expressed on the DataFrame API: the corpus
    collapses to a word histogram once (``_bpe_word_hist``), then each
    round argmaxes the adjacent-pair counts (``_bpe_round_argmax``) and
    applies the winner to every word as ONE separator-guarded replace —
    the non-overlapping left-to-right pass Spark's ``replace`` and
    DuckDB's execute byte-identically.

    ``mode="rounds"`` (default — the scale path): the MLlib-iterative
    posture. Each round collects its ONE winning row and substitutes it as
    literals into the next round's encoding; the driver holds only the
    learned table itself (n_merges rows — the algorithm's true state,
    bounded and tiny, like k-means centroids), plans stay flat (round i is
    the persisted histogram + i literal replaces; re-persisted every
    ``persist_every`` rounds so lineage and per-round cost stay constant),
    and cost is LINEAR in n_merges — the posture that reaches real
    vocabulary sizes (10^3–10^4 merges).

    ``mode="plan"``: fully declarative, zero driver round-trips — each
    winner re-enters as a one-row broadcast join and the result is ONE
    composed plan (the DuckDB oracle mirrors it as unrolled CTEs). Measured
    ~1.5× slower at n_merges=8 (sf0.1) and its plan-analysis cost grows
    quadratically with n_merges; kept as the oracle-shaped reference form.

    Deterministic by construction — integer counts, lexicographic ties —
    so the DuckDB oracle, both modes, and any two cluster sizes learn the
    identical table. If the corpus exhausts its pairs early, later ranks
    are simply absent (no error)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if mode not in ("rounds", "plan"):
        raise ValueError(f"unknown mode {mode!r}")
    us, ss = "\x1f", "\x1f\x1f"
    cur = _bpe_word_hist(df, text_col)
    if mode == "rounds":
        spark = df.sparkSession
        cur = cur.persist()
        pinned, learned = [cur], []
        try:
            for i in range(1, n_merges + 1):
                top = _bpe_round_argmax(cur).collect()
                if not top:
                    break
                r = top[0]
                learned.append((i, r.lhs, r.rhs, r.pair_count))
                if i < n_merges:
                    cur = cur.select(
                        F.replace(
                            F.col("enc"),
                            F.lit(us + r.lhs + ss + r.rhs + us),
                            F.lit(us + r.lhs + r.rhs + us),
                        ).alias("enc"),
                        "cnt",
                    )
                    if i % persist_every == 0:
                        cur = cur.persist()
                        pinned.append(cur)
        finally:
            for p in pinned:
                p.unpersist()
        return spark.createDataFrame(learned, _BPE_TRAIN_SCHEMA)
    bests = []
    for i in range(1, n_merges + 1):
        best = _bpe_round_argmax(cur).select(
            F.lit(i).alias("merge_rank"), "lhs", "rhs", "pair_count"
        )
        bests.append(best)
        if i < n_merges:
            b = best.select(F.col("lhs").alias("_bl"), F.col("rhs").alias("_br"))
            cur = cur.crossJoin(F.broadcast(b)).select(
                F.replace(
                    F.col("enc"),
                    F.concat(
                        F.lit(us), F.col("_bl"), F.lit(ss), F.col("_br"),
                        F.lit(us),
                    ),
                    F.concat(F.lit(us), F.col("_bl"), F.col("_br"), F.lit(us)),
                ).alias("enc"),
                "cnt",
            )
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out


def en_stopword_hits(text: Column) -> Column:
    """# of distinct English stopwords present (language-ID signal)."""
    toks = F.array_distinct(tokens(F.lower(text)))
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in EN_STOPWORDS])))


def lang_guess(text: Column, min_hits: int = 2) -> Column:
    """'en' if ≥ min_hits distinct English stopwords appear, else 'unk'."""
    return F.when(en_stopword_hits(text) >= F.lit(min_hits), F.lit("en")).otherwise(
        F.lit("unk")
    )


def alpha_ratio(text: Column) -> Column:
    """share of alphabetic characters, 4 decimals."""
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return F.round(alpha / F.length(text), 4)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, ~1]: token mass, alpha share,
    stopword presence. Deterministic, rounded for oracle parity."""
    n = token_count(text)
    length_term = F.least(n / F.lit(200.0), F.lit(1.0))
    stop_term = F.least(en_stopword_hits(text) / F.lit(5.0), F.lit(1.0))
    return F.round(
        0.4 * length_term + 0.4 * alpha_ratio(text) + 0.2 * stop_term, 4
    )


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint.

    Position-weighted word-hash sum mod 2^31-1: reordering words changes the
    value, identical content collides. Spark's 0-based transform index is
    shifted to match DuckDB's 1-based lambda index.
    """
    toks = tokens(text)
    weighted = F.transform(
        toks, lambda w, i: (portable_hash31(w) * (i + F.lit(1))) % F.lit(MERSENNE31)
    )
    return F.aggregate(
        weighted, F.lit(0).cast("long"), lambda acc, x: (acc + x) % F.lit(MERSENNE31)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 100,
    overlap: int = 10,
) -> DataFrame:
    """Fixed-size token windows with overlap — the standard LLM
    training-data chunking step: (id, chunk_idx, chunk_text, n_tokens).

    chunk i covers tokens [i*(chunk_tokens-overlap), +chunk_tokens); every
    document yields ≥1 chunk (short docs → one whole-doc chunk). Pure
    sequence+slice expressions: the explode is map-side, no shuffle, and at
    100 TB the fan-out streams through the scan stage.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    t = tokens(F.col(text_col))
    n = F.size(t)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(float(step))).cast("int"), F.lit(1)
    )
    base = df.select(
        F.col(id_col),
        t.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_idx") * step + 1, chunk_tokens)
    return base.select(
        id_col,
        "chunk_idx",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """The composed training-data quality gate: ``(kept, rejected)``.

    A document is rejected for the FIRST failing rule (reason precedence:
    too_short → low_alpha → low_quality → wrong_lang) — one reason per doc
    keeps the rejected side aggregable into per-reason drop counters, like
    every production corpus-filter report. Pure narrow projection + two
    filters over one shared plan; zero shuffles.
    """
    t = F.col(text_col)
    reason = (
        F.when(token_count(t) < F.lit(min_tokens), F.lit("too_short"))
        .when(alpha_ratio(t) < F.lit(min_alpha_ratio), F.lit("low_alpha"))
        .when(quality_score(t) < F.lit(min_quality), F.lit("low_quality"))
    )
    if langs:
        reason = reason.when(
            ~lang_guess(t).isin(*langs), F.lit("wrong_lang")
        )
    kept = df.where(reason.isNull())
    rejected = df.withColumn("reject_reason", reason).where(
        F.col("reject_reason").isNotNull()
    )
    return kept, rejected


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals, per document:

    - ``dup_token_ratio``   = 1 - distinct/total lowercase tokens (mass of
      the document that is re-used vocabulary),
    - ``top_bigram_count`` / ``bigram_total`` / ``top_bigram_frac`` = the
      most-frequent word bigram's share of all bigrams (boilerplate /
      degenerate-loop detector — the Gopher rule drops docs whose top
      2-gram exceeds ~0.2 of the text).

    Plan shape: the token-ratio side is a pure map-only projection; the
    bigram side is explode → groupBy(doc_id, bigram) → groupBy(doc_id),
    both partially aggregated map-side and both keyed by doc_id, so AQE
    plans the final join without a third repartition. Keys are doc-scoped —
    no skew at any corpus size. Docs with <2 tokens surface with
    ``bigram_total = 0`` and ``top_bigram_frac = 0.0`` (never dropped).
    """
    t = tokens(F.lower(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(t)) / F.size(t), 4
        ).alias("dup_token_ratio"),
        t.alias("_toks"),
    )
    bigrams = base.select(
        id_col,
        F.explode(
            F.when(
                F.col("n_tokens") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.col("n_tokens") - 1),
                    lambda i: F.array_join(F.slice("_toks", i, 2), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    top = (
        bigrams.groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.max("cnt").alias("top_bigram_count"),
            F.sum("cnt").alias("bigram_total"),
        )
    )
    return (
        base.drop("_toks")
        .join(top, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "dup_token_ratio",
            F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
            F.coalesce("bigram_total", F.lit(0)).alias("bigram_total"),
            F.round(
                F.coalesce(
                    F.col("top_bigram_count") / F.col("bigram_total"), F.lit(0.0)
                ),
                4,
            ).alias("top_bigram_frac"),
        )
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per document with all derived text features."""
    t = F.col(text_col)
    return df.select(
        *[c for c in df.columns if c != text_col],
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subword_tokens"),
        en_stopword_hits(t).alias("en_stopword_hits"),
        lang_guess(t).alias("lang_guess"),
        alpha_ratio(t).alias("alpha_ratio"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
