"""Similarity search over embedding columns (array<float>).

Three paths:
  * brute-force cosine top-k — the correctness baseline, exact, oracle-able
    (cross join + window rank). Fine for ≤ ~10^5 corpus rows per query set.
  * LSH-bucketed ANN — a 100 TB path: random-hyperplane sign buckets
    (deterministic LCG hyperplanes so the DuckDB oracle and both cluster
    sizes reproduce them), candidates only within a bucket, then exact
    re-rank. Recall is tunable via n_planes/n_tables; candidate generation
    is an equality join on the bucket key, never an all-pairs product.
  * IVF (inverted-file) ANN — the other classic scale path: a coarse
    quantizer (k-means over a bounded deterministic sample, one relational
    Lloyd refinement) partitions the corpus into C inverted lists; a query
    probes its n_probe nearest centroids and re-ranks only those lists.
    Candidate cost is O(N * n_probe / C) per query; the quantizer BUILD
    touches only the sample (constant rows regardless of corpus size), and
    the one full-corpus pass — list assignment — is map-side work against a
    broadcast centroid table plus a narrow-row max_by (C is a constant —
    thousands even at 100 TB — so no shuffle grows with C).

All vector math is zip_with/aggregate over array<double> — JVM higher-order
functions, no UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# LCG pseudo-hyperplanes: w(plane p, dim d) in [-1, 1), identical in DuckDB:
#   ((1103515245 * (p * 1024 + d) + 12345) % 2000) / 1000.0 - 1.0
_LCG_A = 1103515245
_LCG_C = 12345


def _plane_weight(p: int, d: Column) -> Column:
    k = (
        F.lit(_LCG_A).cast("long") * (F.lit(p * 1024).cast("long") + d.cast("long"))
        + F.lit(_LCG_C)
    ) % F.lit(2000)
    return k.cast("double") / F.lit(1000.0) - F.lit(1.0)


def _norm(v: Column) -> Column:
    """L2 norm, LOUD on degenerate input: a NULL/empty/all-zeros vector has
    no cosine direction, and under this repo's ANSI mode the later
    ``dot/(na*nb)`` would die with a bare DIVIDE_BY_ZERO deep in a shuffle.
    Failing here names the condition at the first map stage instead (the
    same discipline as SemanticCorpus's NULL-embedding guard); downstream
    divisions stay plain so the DuckDB oracles are expression-identical."""
    sq = F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    return F.when(
        v.isNull() | (F.coalesce(sq, F.lit(0.0)) == 0.0),
        F.raise_error(
            F.lit("zero-norm or NULL embedding has no cosine direction")
        ).cast("double"),
    ).otherwise(F.sqrt(sq))


def _dot(a: Column, b: Column) -> Column:
    # NOTE (r6 negative result, kept for the next optimizer): a statically
    # unrolled `a[0]*b[0] + ... + a[63]*b[63]` scalar tree measured 13×
    # SLOWER than this fold on a 10M-pair microbench (26.4 s vs 2.0 s at
    # local[32]) — the 64-term expression blows the JIT method budget and
    # the whole stage drops to interpreted bytecode. The zip_with/aggregate
    # fold is the fast formulation on Spark 4.1.
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for every query row: (query_id, neighbor_id,
    rank, cosine). Self-matches excluded. Deterministic tie-break on id."""
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cnorm", _norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    # queries are the small side by construction → broadcast the cross join
    scored = c.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid")).select(
        "qid",
        "nid",
        F.round(
            _dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 4
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )


def lsh_bucket(vec: Column, n_planes: int = 8, table: int = 0) -> Column:
    """Random-hyperplane sign bucket: bit p = 1 iff dot(v, plane_p) > 0.
    ``table`` selects a disjoint plane set (multi-table LSH)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.transform(vec, lambda x, d: x * _plane_weight(table * n_planes + p, d)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_tables(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    n_tables: int,
    carry_all: bool = False,
    flat: bool = False,
) -> DataFrame:
    """(_id, _norm, tbl, bkt) for every (vector, table) — the RELATIONAL
    bucket formulation: posexplode the vector to (id, dim, x) rows, then ONE
    codegen'd hash aggregate computes every plane's projection (plus the
    norm) as scalar conditional sums. Replaces n_tables×n_planes interpreted
    higher-order-lambda passes over the array (measured ~10× slower at
    sf0.1 — same finding as minhash_signature's docstring; no CSE across
    lambda boundaries). Bucket values are bit-identical to lsh_bucket().

    ``carry_all=True`` additionally carries every EARLIER table's bucket as
    scalar columns ``_b0.._b{n_tables-2}`` on each (tbl, bkt) row, so a
    pair-generation consumer can emit a colliding pair only in the FIRST
    table where the buckets agree (first-collision dedup) — replacing a
    post-join ``distinct`` over the full candidate set with a cheap scalar
    filter (guide §2.4: remove the shuffle outright).

    ``flat=True`` skips the explode entirely: ONE row per id carrying every
    table's bucket as ``_b0.._b{n_tables-1}`` (plus ``_norm``) — the
    compact form a vectorized pair-verify consumer rebuilds its per-bucket
    index from (r6: the bucket side crosses to the kernel once per id, not
    once per (id, table)). Bucket values are bit-identical to the exploded
    forms."""
    n_p = n_planes * n_tables
    # the guard lives INSIDE the generator's input: a NULL/empty vector
    # explodes to zero rows, so a check in a sibling column would never
    # evaluate for exactly the rows it must catch — such a doc would
    # silently vanish from every bucket (never a dedup candidate, never
    # an ANN result). raise_error here runs per input row.
    ex = df.selectExpr(
        f"{id_col} AS _id",
        f"posexplode(IF({vec_col} IS NOT NULL AND size({vec_col}) > 0,"
        f" CAST({vec_col} AS ARRAY<DOUBLE>),"
        f" raise_error(concat('NULL/empty embedding has no LSH bucket: ',"
        f" CAST({id_col} AS STRING))))) AS (d, x)",
    )
    # expressions as SQL strings: ONE py4j call per aggregate instead of
    # ~15 per plane — Python-side plan construction was the measured
    # bottleneck (3+ s per call at 32 planes), not execution
    def w(p: int) -> str:
        return (
            f"(((CAST({_LCG_A} AS BIGINT) * (({p}) * 1024 + d) + {_LCG_C}) % 2000)"
            " / 1000.0 - 1.0)"
        )

    aggs = [F.expr(f"sum(x * {w(p)})").alias(f"_pr{p}") for p in range(n_p)]
    aggs.append(F.expr("sqrt(sum(x * x))").alias("_norm"))
    g = ex.groupBy("_id").agg(*aggs)

    def bucket_of(t: int) -> str:
        return " + ".join(
            f"IF(_pr{t * n_planes + p} > 0, {1 << p}, 0)" for p in range(n_planes)
        )

    if flat:
        return g.selectExpr(
            "_id", "_norm", *[f"({bucket_of(t)}) AS _b{t}" for t in range(n_tables)]
        )
    if not carry_all:
        structs = ", ".join(
            f"named_struct('tbl', {t}, 'bkt', {bucket_of(t)})"
            for t in range(n_tables)
        )
        return g.selectExpr("_id", "_norm", f"inline(array({structs}))")
    # materialize each table's bucket ONCE in a child projection (referenced
    # both by its _b{t} column and inside the inline struct — the multi-ref
    # keeps CollapseProject from re-inlining the sum chain per use)
    bcols = [f"({bucket_of(t)}) AS _b{t}" for t in range(n_tables)]
    g2 = g.selectExpr("_id", "_norm", *bcols)
    structs = ", ".join(
        f"named_struct('tbl', {t}, 'bkt', _b{t})" for t in range(n_tables)
    )
    return g2.selectExpr(
        "_id",
        "_norm",
        *[f"_b{t}" for t in range(n_tables - 1)],
        f"inline(array({structs}))",
    )


def ann_lsh_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates = rows sharing the query's sign bucket
    in ANY of ``n_tables`` independent plane sets, then exact cosine re-rank.
    The scale path — every join is an equality join on a bucket id; recall
    grows as 1-(1-p^planes)^tables, tuned without touching the plan shape.
    """
    # one relational pass per side computes every table's bucket + the norm
    # (lsh_bucket_tables); candidates join on (table, bucket); vectors are
    # joined back only for the exact re-rank of surviving candidates
    c = lsh_bucket_tables(corpus, id_col, vec_col, n_planes, n_tables)
    q = lsh_bucket_tables(queries, id_col, vec_col, n_planes, n_tables)
    cand = (
        c.alias("c")
        .join(F.broadcast(q.alias("q")), on=["tbl", "bkt"])
        .where(F.col("c._id") != F.col("q._id"))
        .select(
            F.col("q._id").alias("qid"),
            F.col("c._id").alias("nid"),
            F.col("q._norm").alias("qnorm"),
            F.col("c._norm").alias("cnorm"),
        )
        .dropDuplicates(["qid", "nid"])  # union of tables
    )
    cv = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    qv = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = cand.join(F.broadcast(qv), "qid").join(cv, "nid").select(
        "qid",
        "nid",
        F.round(
            _dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 4
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )


def quantization_stats(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_k: int = 256,
) -> DataFrame:
    """ONE-row codebook for int8 scalar quantization: per-dimension
    (min, max) learned from the deterministic smallest-id ``sample_k``
    sample (same bounded-sample discipline as the IVF build — no statistic
    ever scans more than the sample), packed as two ordered arrays so the
    quantizer applies via a broadcast + zip_with with NO per-dimension
    join against the corpus."""
    s = (
        corpus.select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .orderBy("nid")
        .limit(sample_k)
    )
    per_d = s.select(F.posexplode("cv").alias("d", "x")).groupBy("d").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    return per_d.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "mn"))), lambda s_: s_["mn"]
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "mx"))), lambda s_: s_["mx"]
        ).alias("maxs"),
    )


def quantize_embeddings(
    corpus: DataFrame,
    stats: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, qv: array<int> in [0, 255]) — int8 scalar quantization, the
    classic ANN storage path (4x smaller than float32, 8x than float64;
    at 10^9x768 that is the difference between fitting executor memory or
    not). Pure map-side: broadcast the one-row codebook, two zip_withs.
    q_i = round((x_i - mn_i) * 255 / (mx_i - mn_i)), clamped; a constant
    dimension (mx = mn) quantizes to 0."""
    shifted = F.zip_with(
        F.col(vec_col).cast("array<double>"), F.col("mins"), lambda x, mn: x - mn
    )
    rng = F.zip_with(F.col("maxs"), F.col("mins"), lambda mx, mn: mx - mn)
    qv = F.zip_with(
        shifted,
        rng,
        lambda sx, r: F.when(
            r == 0, F.lit(0)
        ).otherwise(
            F.least(
                F.greatest(F.round(sx * 255.0 / r, 0).cast("int"), F.lit(0)),
                F.lit(255),
            )
        ),
    )
    return corpus.crossJoin(F.broadcast(stats)).select(
        F.col(id_col).alias("nid"), qv.alias("qv")
    )


def _dequantized_corpus(qz, stats):
    """(nid, cv, cnorm): the int8-coded corpus read back as float vectors —
    x̂_i = mn_i + q_i * (mx_i - mn_i) / 255, norms of the DEQUANTIZED
    vector (the vector the store can reconstruct). One broadcast of the
    single-row stats; shared by ann_quantized_topk and
    ann_ivf_quantized_topk so the coding formula cannot diverge between
    the flat and IVF paths (or from the DuckDB oracle)."""
    return (
        qz.crossJoin(F.broadcast(stats))
        .select(
            "nid",
            F.zip_with(
                F.zip_with(
                    F.col("qv").cast("array<double>"),
                    F.zip_with(
                        F.col("maxs"), F.col("mins"), lambda mx, mn: mx - mn
                    ),
                    lambda q, r: q * r / 255.0,
                ),
                F.col("mins"),
                lambda scaled, mn: mn + scaled,
            ).alias("cv"),
        )
        .withColumn("cnorm", _norm(F.col("cv")))
    )


def ann_quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    sample_k: int = 256,
) -> DataFrame:
    """Exact top-k by cosine against DEQUANTIZED int8 vectors (asymmetric
    scoring: float query × dequantized corpus) — (query_id, neighbor_id,
    rank, cosine_q). The accuracy half of the quantization trade, measured
    against cosine_topk_bruteforce in tests; the storage half is the 4-8x
    memory reduction that makes 10^9-vector brute force or IVF re-rank
    executor-resident at 100 TB."""
    from pyspark.sql.window import Window as W

    stats = quantization_stats(corpus, id_col, vec_col, sample_k)
    qz = quantize_embeddings(corpus, stats, id_col, vec_col)
    dq = _dequantized_corpus(qz, stats)
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    scored = dq.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid")).select(
        "qid",
        "nid",
        F.round(
            _dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 4
        ).alias("cosine_q"),
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine_q").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
            "cosine_q",
        )
    )


def _sim(av: str, bv: str, an: str, bn: str) -> Column:
    """Rounded cosine similarity between two vector columns with
    precomputed norms. Rounding to 4 decimals BEFORE any ranking keeps the
    rank stable across engines (the DuckDB oracle computes the same sums in
    a different order; ties are then broken by id/cid)."""
    return F.round(_dot(F.col(av), F.col(bv)) / (F.col(an) * F.col(bn)), 4)


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    sample_per_centroid: int = 32,
) -> DataFrame:
    """(cid, cv, cnorm) coarse-quantizer centroids built from a DETERMINISTIC
    BOUNDED SAMPLE — the ``n_centroids * sample_per_centroid`` smallest-id
    corpus vectors — seeded with the sample's ``n_centroids`` smallest ids +
    ONE Lloyd refinement (assign-to-nearest, per-dimension mean).

    Sampling is the standard IVF practice (the quantizer only ROUTES; recall
    is governed by n_probe, not quantizer optimality), and it is what makes
    the build scale-safe: every build-stage row count is bounded by the
    sample size, a constant independent of corpus size. The r3 formulation
    Lloyd-stepped the FULL corpus and joined its (nid, dim, x) explosion back
    on the vector id — a full-corpus-by-dimension shuffle (~10^12 rows at
    10^9x768); here the explode happens only on the sample, and the
    assignment is carried THROUGH the max_by (struct of (cid, vector)), so
    the build contains NO join keyed on the vector id at all — the only join
    is the broadcast of the constant-size seed table (pinned in
    tests/test_similarity.py).

    Deterministic by construction — smallest-id sample, no RNG — so the
    DuckDB oracle and any two cluster sizes build identical centroids.

    Known degradation (shared with the DuckDB oracle, so still exact):
    when two seed ids carry IDENTICAL embeddings, every sample vector ties
    between them and the smaller-cid tie-break starves the larger seed —
    the Lloyd groupBy then emits FEWER than n_centroids centroids. The
    quantizer still routes correctly (recall governed by n_probe; keep
    sets stay exact), just at coarser granularity; dedup the seed region
    or raise sample_per_centroid if cluster counts matter.
    """
    from pyspark.sql.window import Window as W

    k_sample = n_centroids * sample_per_centroid
    v = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cnorm", _norm(F.col("cv")))
    # bounded sample: top-K smallest ids — TakeOrderedAndProject, one
    # map-side pass over the corpus, K rows to the driver-side merge
    s = v.orderBy("nid").limit(k_sample)
    seeds = (
        s.orderBy("nid")
        .limit(n_centroids)
        .select(
            (F.row_number().over(W.orderBy("nid")) - 1).alias("cid"),
            F.col("cv").alias("ce"),
            F.col("cnorm").alias("cenorm"),
        )
    )
    # assign each SAMPLE vector to its nearest seed, carrying the vector
    # through the aggregation so the Lloyd mean needs no join back on nid
    j = s.crossJoin(F.broadcast(seeds)).select(
        "nid", "cid", _sim("cv", "ce", "cnorm", "cenorm").alias("sim"), "cv"
    )
    best = j.groupBy("nid").agg(
        F.max_by(
            F.struct(F.col("cid"), F.col("cv")),
            F.struct(F.col("sim"), -F.col("cid")),
        ).alias("a")
    )
    # Lloyd mean, relationally: posexplode the ASSIGNED sample to
    # (cid, d, x), per-(cid, d) average, re-pack ordered arrays — shuffle
    # keys are nid (sample only), (cid, d), and cid: all sample-bounded
    ex = best.select(F.col("a.cid").alias("cid"), F.posexplode("a.cv").alias("d", "x"))
    m = ex.groupBy("cid", "d").agg(F.avg("x").alias("mx"))
    return (
        m.groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "mx"))), lambda s: s["mx"]
            ).alias("ce")
        )
        .withColumn("cenorm", _norm(F.col("ce")))
    )


def _assign_nearest(v: DataFrame, cents: DataFrame) -> DataFrame:
    """(nid, cid): each vector's nearest centroid by rounded cosine,
    ties to the smallest cid. Broadcast of the constant-size centroid table
    + map-side partial max_by — the build never shuffles corpus rows."""
    j = v.crossJoin(F.broadcast(cents)).select(
        "nid", "cid", _sim("cv", "ce", "cnorm", "cenorm").alias("sim")
    )
    return j.groupBy("nid").agg(
        F.max_by(F.col("cid"), F.struct(F.col("sim"), -F.col("cid"))).alias("cid")
    )


def embedding_clusters(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    sample_per_centroid: int = 32,
) -> DataFrame:
    """(id, cid): k-means-style clustering of every embedding — the corpus
    organization primitive modern pipelines build on (SemDeDup-style
    cluster-then-prune, per-cluster curriculum stats, diversity caps).
    Centroids come from the deterministic sampled Lloyd build
    (``ivf_centroids`` — every build-stage row count bounded by the
    sample, no RNG, so two cluster sizes and the DuckDB oracle build
    identical centroids); every corpus vector is then assigned to its
    nearest centroid by rounded cosine (ties to the smallest cid) via a
    broadcast of the constant-size centroid table + a map-side partial
    max_by — the corpus's only shuffle is the per-vector aggregation
    itself."""
    cents = ivf_centroids(
        corpus, id_col, vec_col, n_centroids, sample_per_centroid
    )
    v = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cnorm", _norm(F.col("cv")))
    return _assign_nearest(v, cents).select(
        F.col("nid").alias(id_col), "cid"
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 3,
    sample_per_centroid: int = 32,
) -> DataFrame:
    """IVF approximate top-k: (query_id, neighbor_id, rank, cosine).

    Probe the ``n_probe`` nearest centroids per query, take those inverted
    lists as candidates, exact cosine re-rank. At scale the inverted lists
    are the partitioning — the candidate join is an equality join on cid,
    and only n_probe/C of the corpus is ever scored per query. The centroid
    build touches only a bounded deterministic sample (ivf_centroids).
    """
    from pyspark.sql.window import Window as W

    cents = ivf_centroids(corpus, id_col, vec_col, n_centroids, sample_per_centroid)
    v = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cnorm", _norm(F.col("cv")))
    lists = _assign_nearest(v, cents)
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    pw = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("qid", "cid", _sim("qv", "ce", "qnorm", "cenorm").alias("sim"))
        .withColumn("pr", F.row_number().over(pw))
        .where(F.col("pr") <= n_probe)
        .select("qid", "cid")
    )
    # candidates: probed inverted lists (equality join on cid); each corpus
    # row lives in exactly one list, so (qid, nid) is unique by construction
    cand = probes.join(lists, "cid").where(F.col("nid") != F.col("qid"))
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(v, "nid")
        .select("qid", "nid", _sim("qv", "cv", "qnorm", "cnorm").alias("cosine"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )


def ann_ivf_quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 3,
    sample_per_centroid: int = 32,
    sample_k: int = 256,
) -> DataFrame:
    """IVF x int8 quantization — the IVF-PQ-shaped composition that is the
    real 100 TB ANN posture (VERDICT r4 #4): the inverted lists STORE
    quantized codes (4-8x smaller, so the probed lists are executor-resident
    at 10^9 vectors), routing happens at ingest with the float vector, and
    query-time scoring is ASYMMETRIC — float query against the dequantized
    candidate, exactly what the stored shape can serve.

    (query_id, neighbor_id, rank, cosine_q). Plan shape: both the coarse
    quantizer and the codebook are built from bounded deterministic samples;
    list assignment and encoding are map-side against broadcast constants;
    the only non-broadcast join is the equality join on cid (probed lists)
    plus the candidate-gated join back to the quantized store — no
    all-pairs product anywhere (pinned in tests/test_similarity.py).
    """
    from pyspark.sql.window import Window as W

    cents = ivf_centroids(corpus, id_col, vec_col, n_centroids, sample_per_centroid)
    v = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cnorm", _norm(F.col("cv")))
    # ingest-time routing: the ORIGINAL vector picks the list (standard
    # IVF-SQ practice — routing error should not compound coding error)
    lists = _assign_nearest(v, cents)
    # the stored shape: int8 codes per vector (quantize_embeddings), read
    # back dequantized for scoring — norms are of the DEQUANTIZED vector,
    # because that is the vector the store can reconstruct
    stats = quantization_stats(corpus, id_col, vec_col, sample_k)
    qz = quantize_embeddings(corpus, stats, id_col, vec_col)
    dq = _dequantized_corpus(qz, stats)
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    pw = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("qid", "cid", _sim("qv", "ce", "qnorm", "cenorm").alias("sim"))
        .withColumn("pr", F.row_number().over(pw))
        .where(F.col("pr") <= n_probe)
        .select("qid", "cid")
    )
    cand = probes.join(lists, "cid").where(F.col("nid") != F.col("qid"))
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(dq, "nid")
        .select("qid", "nid", _sim("qv", "cv", "qnorm", "cnorm").alias("cosine_q"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine_q").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
            "cosine_q",
        )
    )
