"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — the correctness baseline, exact, oracle-able
    (cross join + window rank). Fine for ≤ ~10^5 corpus rows per query set.
  * LSH-bucketed ANN — the 100 TB path: random-hyperplane sign buckets
    (deterministic LCG hyperplanes so the DuckDB oracle and both cluster
    sizes reproduce them), candidates only within a bucket, then exact
    re-rank. Recall is tunable via n_planes/n_tables; candidate generation
    is an equality join on the bucket key, never an all-pairs product.

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
    return F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


def _dot(a: Column, b: Column) -> Column:
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
) -> DataFrame:
    """(_id, _norm, tbl, bkt) for every (vector, table) — the RELATIONAL
    bucket formulation: posexplode the vector to (id, dim, x) rows, then ONE
    codegen'd hash aggregate computes every plane's projection (plus the
    norm) as scalar conditional sums. Replaces n_tables×n_planes interpreted
    higher-order-lambda passes over the array (measured ~10× slower at
    sf0.1 — same finding as minhash_signature's docstring; no CSE across
    lambda boundaries). Bucket values are bit-identical to lsh_bucket()."""
    n_p = n_planes * n_tables
    ex = df.selectExpr(
        f"{id_col} AS _id",
        f"posexplode(CAST({vec_col} AS ARRAY<DOUBLE>)) AS (d, x)",
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
    structs = ", ".join(
        "named_struct('tbl', {t}, 'bkt', {b})".format(
            t=t,
            b=" + ".join(
                f"IF(_pr{t * n_planes + p} > 0, {1 << p}, 0)"
                for p in range(n_planes)
            ),
        )
        for t in range(n_tables)
    )
    return g.selectExpr("_id", "_norm", f"inline(array({structs}))")


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
