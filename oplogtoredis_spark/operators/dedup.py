"""Deduplication operators for training-data pipelines.

Five families, all DataFrame-native, designed for 100 TB shapes:

  exact         — sha256 groupBy (one shuffle on the content hash)
  ngram-Jaccard — shingle explode → inverted-index self-join → exact Jaccard
  MinHash+LSH   — shingle→minhash signature→band buckets→bucket join; the
                  scale path: candidate generation never compares all pairs
  SimHash       — 16-bit sign fingerprint (equal-fingerprint near-dup) AND
                  the production-width 60-bit variant (simhash60) with
                  4×15-bit banded candidate pairs + bit_count hamming verify
                  (simhash_dup_pairs) — the registered production path
  embedding     — cosine ≥ τ pairs; brute-force (oracle-able) and
                  LSH-bucketed (the scale path, see similarity.py)

Every step uses the portable sha256-based hash (functions/hashing.py) so the
DuckDB oracle reproduces values bit-for-bit.

Scale notes: the shingle inverted index is the classic web-dedup layout —
explode is map-side; the self-join shuffles on the shingle/band hash (small
keys), never on full documents; hot shingles (stopword runs) are capped with
a frequency filter exactly like production MinHash pipelines drop too-common
shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import N_MINHASH, minhash_perm, portable_hash31
from .text import tokens


def content_hash_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: survivor (min id) per sha256(content) + group size."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(text: F.Column, n: int = 3) -> F.Column:
    """Word n-gram shingles (distinct).

    Formulated as slice + zip_with so the token array is referenced a
    CONSTANT number of times: an ``element_at(toks, i)`` inside a transform
    lambda re-evaluates the underlying split() per element (no common-
    subexpression elimination across lambda boundaries) — measured O(tokens²)
    and ~10× slower at sf0.1.
    """
    toks = tokens(text)
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, length)
    for j in range(1, n):
        nxt = F.slice(toks, 1 + j, length)
        grams = F.zip_with(grams, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(grams)


def _shingle_index(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle_hash) inverted index — one row per distinct doc-shingle."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("sh"),
    ).select("id", portable_hash31(F.col("sh")).alias("sh_h"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 100,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (id_a < id_b, jac ≥ τ).

    Inverted-index join; shingles occurring in > max_shingle_freq docs are
    dropped from candidate generation (hot-key control) but still count in
    the per-doc sizes, so Jaccard stays a lower bound for pruned pairs —
    at the default corpus scale nothing is pruned.
    """
    idx = _shingle_index(df, id_col, text_col, n)
    sizes = idx.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    freq = idx.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df_"))
    idx_f = idx.join(freq.where(F.col("df_") <= max_shingle_freq), "sh_h")
    common = (
        idx_f.alias("a")
        .join(idx_f.alias("b"), on="sh_h")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    pairs = (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


def minhash_signature(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, m0..m15) MinHash signature over shingle hashes — higher-order
    functions only, no UDF.

    Relational formulation: explode the (already distinct) shingle hashes to
    rows, then ONE hash aggregate computes all 16 minima as scalar
    ``min((a_i*h+b_i) % p)`` columns — whole-stage-codegen'd, map-side
    partial agg, one small shuffle on the doc id. (Array-fold variants — 16×
    ``array_min(transform(...))`` or a single ``aggregate`` with a 16-wide
    zip_with — run interpreted per element and measured 10-16× slower at
    sf0.1.) Docs with fewer than n tokens keep a row with null signature,
    matching the SQL oracle's list_min([]) = NULL.
    """
    ids = df.select(F.col(id_col).alias("id"))
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("sh"),
    ).select("id", portable_hash31(F.col("sh")).alias("h"))
    sig = exploded.groupBy("id").agg(
        *[F.min(minhash_perm(F.col("h"), i)).alias(f"m{i}") for i in range(N_MINHASH)]
    )
    return ids.join(sig, on="id", how="left")


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, hs: distinct shingle-hash set, n_sh) — one row per doc. The
    set-per-doc layout makes a candidate pair's exact Jaccard a single
    ``array_intersect`` after two hash joins — O(candidates), never a
    corpus-wide pair enumeration."""
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                shingles(F.col(text_col), n), lambda s: portable_hash31(s)
            )
        ).alias("hs"),
    ).withColumn("n_sh", F.size("hs"))


def jaccard_verify_candidates(
    cand: DataFrame, sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verify gated on the candidate set: join the (id_a,
    id_b) candidates to the per-doc shingle-hash sets (two equality hash
    joins) and intersect per pair. The cost is O(|candidates|) — a pair the
    candidate generator did not emit is never scored, which is the whole
    point of LSH: at 100 TB the verify must track candidates, not corpus
    pairs (an inverted-index self-join here would re-run the exact
    algorithm at full corpus size and prune nothing)."""
    a = sets.withColumnsRenamed({"id": "id_a", "hs": "hs_a", "n_sh": "n_a"})
    b = sets.withColumnsRenamed({"id": "id_b", "hs": "hs_b", "n_sh": "n_b"})
    n_common = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            # try_divide: a candidate pair of two zero-shingle docs has union
            # size 0 — under this repo's ANSI mode a plain division would
            # fail the whole job with DIVIDE_BY_ZERO. Jaccard of two empty
            # sets is defined null here, and null fails the >= threshold
            # filter, so such pairs are (correctly) never emitted.
            "jaccard",
            F.round(
                F.try_divide(n_common, F.col("n_a") + F.col("n_b") - n_common), 4
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    bands: int = 4,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: 16 minhashes → `bands` bands of 4 → docs
    sharing any band bucket become candidates → exact-Jaccard verify on the
    CANDIDATES ONLY (jaccard_verify_candidates — set intersection per
    candidate pair, no inverted-index self-join anywhere in the plan).

    This is the 100 TB path end-to-end: candidates come from equality joins
    on band hashes (shuffle on small keys) and the verify cost is
    O(candidates) — total work tracks the number of near-duplicates LSH
    surfaces, never the all-pairs corpus product.
    """
    if bands < 1 or bands > N_MINHASH or N_MINHASH % bands != 0:
        # bands > N_MINHASH would make every band hash a CONSTANT (empty
        # slice) — an all-pairs candidate product; a non-divisor would
        # silently ignore trailing minhashes. Same loud posture as
        # simhash_dup_pairs' band validation.
        raise ValueError(
            f"bands must divide N_MINHASH={N_MINHASH} (got {bands})"
        )
    rows_per_band = N_MINHASH // bands
    sig = minhash_signature(df, id_col, text_col, n)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            portable_hash31(F.concat_ws("_", F.lit(str(b)), *[p.cast("string") for p in parts])).alias(
                f"band{b}"
            )
        )
    # docs with no shingles (< n tokens) have null signatures — all of them
    # would share one degenerate band bucket (quadratic candidates that the
    # verify then rejects as jaccard null); drop them from banding outright
    banded = sig.where(F.col("m0").isNotNull()).select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_no"), F.col(f"band{b}").alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("id", F.col("e.band_no").alias("band_no"), F.col("e.bh").alias("bh"))
    cand = (
        stacked.alias("a")
        .join(stacked.alias("b"), on=["band_no", "bh"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sets = _shingle_sets(df, id_col, text_col, n)
    return jaccard_verify_candidates(cand, sets, verify_threshold)


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) 16-bit sign fingerprint over token hashes.

    bit b of the fingerprint = 1 iff sum over tokens of ±1 (sign of bit b of
    the token hash) is positive. Pure explode + conditional agg + bit math.
    """
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("w")
    ).select("id", portable_hash31(F.col("w")).alias("h"))
    bit_sums = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(16)
        ]
    )
    fp = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return bit_sums.select("id", fp.cast("long").alias("simhash"))


def simhash_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Docs sharing an identical 16-bit simhash (near-dup buckets)."""
    s = simhash16(df, id_col, text_col)
    return (
        s.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding near-dup pairs by cosine ≥ τ — brute-force all-pairs
    (the correctness baseline; the scale path is similarity.ann_lsh_bucketed).
    Dot products via zip_with/aggregate in double precision, no UDF."""
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.sqrt(
            F.aggregate(
                F.transform(F.col(vec_col).cast("array<double>"), lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("norm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        v.alias("a")
        .join(v.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot / (F.col("a.norm") * F.col("b.norm")), 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SOCC'14): for every node u, connect each strictly larger
    neighbor to min(Γ(u) ∪ {u}). Halves long chains toward the component
    minimum every round."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges from the larger endpoint, connect the
    center and all its smaller neighbors to their minimum."""
    o = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    m = o.groupBy("u").agg(F.min("v").alias("m"))
    nbr = (
        o.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return nbr.unionByName(m.select("u", F.col("m").alias("v"))).distinct()


def alternating_components(
    edges: DataFrame, max_iters: int = 20
) -> tuple[DataFrame, int]:
    """Connected components by alternating large-star/small-star rounds —
    the web-scale algorithm: converges in O(log n) rounds even on
    adversarial long chains, where plain min-label propagation needs
    diameter rounds (a 1000-node chain: ~10 rounds vs ~1000).

    ``edges``: (u, v) pair DataFrame (any orientation). Returns
    ``(stars, rounds)`` where stars is (u, v=component minimum) — one row
    per non-minimum member; component minima and singletons are absent
    (they label themselves). Each round is two groupBy-min aggregates and
    two hash joins — no all-pairs anything; lineage is cut per round.
    """
    cur = _small_star(edges).localCheckpoint(eager=True)
    rounds = 0
    converged = False
    for _ in range(max_iters):
        rounds += 1
        new = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        # converged when the star set is stable: symmetric difference empty,
        # probed as ONE action (two anti-joins unioned) over the two
        # checkpointed sets — not count+except (two jobs per round)
        mism = new.join(cur, ["u", "v"], "left_anti").unionByName(
            cur.join(new, ["u", "v"], "left_anti")
        )
        converged = mism.isEmpty()
        cur = new
        if converged:
            break
    if not converged:
        # silently returning a half-converged star set would label docs
        # with non-minimum cluster ids — duplicate groups split with no
        # signal. O(log n) convergence means hitting this at the default
        # 20 needs a component of astronomic diameter; a lowered max_iters
        # fails loudly instead.
        raise RuntimeError(
            f"alternating_components did not converge in {max_iters} "
            "rounds — raise max_iters"
        )
    return cur, rounds


def dedup_clusters(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "id",
    max_iters: int = 20,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected components
    via alternating large-star/small-star (alternating_components) —
    (id, cluster_id) where cluster_id is the smallest doc id in the
    component (the canonical survivor). Singleton docs are their own
    cluster. O(log n) rounds regardless of component diameter."""
    e = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    stars, _ = alternating_components(e, max_iters=max_iters)
    labels = ids.select(F.col(id_col).alias("u")).join(stars, "u", "left")
    return labels.select(
        F.col("u").alias("doc_id"),
        F.coalesce(F.col("v"), F.col("u")).alias("cluster_id"),
    )


def _unit_rows(spark, total_rows: int) -> int:
    """Row-block size for vectorized pair-verify work units: enough units
    to fill 4× the core count (tail balance), blocks never so small that
    kernel dispatch dominates. Derived from data size and core count, not
    a constant (scale-adaptive by construction)."""
    par = spark.sparkContext.defaultParallelism
    return max(256, min(8192, total_rows // (4 * par) + 1))


def _int_id(df: DataFrame, col: str) -> bool:
    """True when ``col`` is a bigint — the only id type the vectorized
    kernels handle (they index ids as int64 AND emit the id column as
    long, so a narrower type would silently widen the output schema)."""
    from pyspark.sql.types import LongType

    return isinstance(df.schema[col].dataType, LongType)


def semdedup_elect_vectorized(
    members: DataFrame, tau: float, id_out: str
) -> DataFrame:
    """SemDeDup election over bounded clusters, vectorized (guide §4.2):
    ``members`` is (id long, cid int, vec array<double>, nrm double); the
    result is the KEPT rows (id_out, cid) — members with no smaller-id
    cluster-mate at rounded cosine >= tau.

    One pass of the member set to the driver (bounded by the caller's
    ``n_centroids`` gate — the exact memory posture of the broadcast hash
    join this replaces, which also materialized the build side on the
    driver), broadcast once, then blocked BLAS election in mapInPandas:
    each vector crosses the Python boundary once, each cosine block is one
    matmul, and parallelism comes from row-block work units instead of the
    cid key (8 reduce tasks for a 25 M-pair product otherwise)."""
    import numpy as np

    spark = members.sparkSession
    schema = f"{id_out} long, cid int"
    rows = members.collect()
    if not rows:
        return spark.createDataFrame([], schema)
    by: dict[int, list] = {}
    for r in rows:
        by.setdefault(r[1], []).append((r[0], r[2], r[3]))
    packed = {}
    units = []
    unit = _unit_rows(spark, len(rows))
    for cid, lst in by.items():
        lst.sort(key=lambda t: t[0])
        packed[cid] = (
            np.array([t[0] for t in lst], dtype=np.int64),
            np.array([t[1] for t in lst], dtype=np.float64),
            np.array([t[2] for t in lst], dtype=np.float64),
        )
        for s in range(0, len(lst), unit):
            units.append((cid, s, min(s + unit, len(lst))))
    bc = spark.sparkContext.broadcast(packed)

    def elect(it):
        import numpy as np
        import pandas as pd

        from oplogtoredis_spark.operators.veccore import dup_rows_vs_members

        for pdf in it:
            ids_out: list = []
            cid_out: list = []
            for cid, s, e in pdf.itertuples(index=False):
                ids, V, nrm = bc.value[cid]
                dup = dup_rows_vs_members(
                    ids[s:e], V[s:e], nrm[s:e], ids, V, nrm, tau
                )
                keep = ids[s:e][~dup]
                ids_out.append(keep)
                cid_out.append(np.full(len(keep), cid, dtype=np.int32))
            if not ids_out:
                continue
            yield pd.DataFrame(
                {
                    id_out: np.concatenate(ids_out),
                    "cid": np.concatenate(cid_out),
                }
            )

    udf = spark.createDataFrame(units, "cid int, s int, e int").repartition(
        min(len(units), 4 * spark.sparkContext.defaultParallelism)
    )
    return udf.mapInPandas(elect, schema)


def embedding_dup_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs — the 100 TB path. Candidates are pairs
    sharing a random-hyperplane sign bucket in ANY of ``n_tables`` plane
    sets (equality join on (table, bucket) — never an all-pairs product),
    then exact cosine ≥ τ verify on candidates only. Deterministic LCG
    hyperplanes (similarity.py:21-24) make the candidate set — and thus the
    result — bit-reproducible in the DuckDB oracle and across cluster sizes.

    Plan shape (r6.2, guide §4.2): the candidate product and the cosine
    verify run as ONE blocked-BLAS kernel in mapInPandas. The bucket table
    (flat form: one row per id with all table buckets) and the vector
    table cross to the driver once — bounded: the SAME relations the
    previous plan broadcast to every executor as hash-join build sides —
    and are broadcast to the kernel; per-bucket row-block work units drive
    the pair generation, with FIRST-COLLISION dedup (a pair is emitted
    only in the first table whose buckets agree, so the output is distinct
    by construction — no post-join ``distinct`` shuffle, guide §2.4) as a
    sparse index filter on the threshold survivors. Parallelism comes from
    row blocks, never the (hot) bucket key (guide §2.5); each vector
    crosses the Python boundary once, not once per pair. No join, no
    BroadcastNestedLoopJoin / CartesianProduct (pinned by pytest).

    Falls back to the r6.0 relational broadcast-join plan for non-integer
    id columns (the kernel indexes ids as int64).
    """
    from .similarity import _norm, lsh_bucket_tables

    if not _int_id(df, id_col):
        return _embedding_dup_pairs_lsh_relational(
            df, id_col, vec_col, threshold, n_planes, n_tables
        )
    import numpy as np

    spark = df.sparkSession
    bk = lsh_bucket_tables(
        df, id_col, vec_col, n_planes, n_tables, flat=True
    )
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("norm", _norm(F.col("v")))
    # bucket side first: it carries the loud NULL/empty-vector guard
    brows = bk.select("_id", *[f"_b{t}" for t in range(n_tables)]).collect()
    schema = "id_a long, id_b long, cosine double"
    if not brows:
        return spark.createDataFrame([], schema)
    vrows = vecs.collect()
    order = sorted(range(len(vrows)), key=lambda i: vrows[i][0])
    ids = np.array([vrows[i][0] for i in order], dtype=np.int64)
    V = np.array([vrows[i][1] for i in order], dtype=np.float64)
    nrm = np.array([vrows[i][2] for i in order], dtype=np.float64)
    B = np.zeros((len(ids), n_tables), dtype=np.int64)
    pos = {int(i): k for k, i in enumerate(ids)}
    groups: dict[tuple[int, int], list[int]] = {}
    for r in brows:
        k = pos[r[0]]
        for t in range(n_tables):
            B[k, t] = r[1 + t]
    for t in range(n_tables):
        col = B[:, t]
        for k in np.argsort(col, kind="stable"):
            groups.setdefault((t, int(col[k])), []).append(int(k))
    # member index lists must be ascending by id: re-sort each group's
    # row indices (row order IS id order — ids sorted above)
    packed = {
        key: np.array(sorted(idx), dtype=np.int64)
        for key, idx in groups.items()
        if len(idx) >= 2
    }
    unit = _unit_rows(spark, sum(len(v) for v in packed.values()))
    units = [
        (t, bkt, lo, min(lo + unit, len(idx)))
        for (t, bkt), idx in packed.items()
        for lo in range(0, len(idx) - 1, unit)
    ]
    if not units:
        return spark.createDataFrame([], schema)
    bc = spark.sparkContext.broadcast((ids, V, nrm, B, packed))

    def pairs(it):
        import numpy as np
        import pandas as pd

        from oplogtoredis_spark.operators.veccore import bucket_pairs_range

        ids, V, nrm, B, packed = bc.value
        for pdf in it:
            out_a, out_b, out_c = [], [], []
            for t, bkt, lo, hi in pdf.itertuples(index=False):
                idx = packed[(t, bkt)]
                a, b, c = bucket_pairs_range(
                    ids[idx],
                    V[idx],
                    nrm[idx],
                    B[idx, :t] if t else None,
                    threshold,
                    lo,
                    hi,
                )
                out_a.append(a)
                out_b.append(b)
                out_c.append(c)
            if not out_a:
                continue
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a),
                    "id_b": np.concatenate(out_b),
                    "cosine": np.concatenate(out_c),
                }
            )

    udf = spark.createDataFrame(
        units, "t int, bkt long, lo int, hi int"
    ).repartition(min(len(units), 4 * spark.sparkContext.defaultParallelism))
    return udf.mapInPandas(pairs, schema)


def _embedding_dup_pairs_lsh_relational(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_planes: int,
    n_tables: int,
) -> DataFrame:
    """The r6.0 relational plan (broadcast self equality join on (tbl, bkt)
    with first-collision dedup, then broadcast joins back to the vectors
    for the codegen cosine verify) — kept as the fallback for non-integer
    id columns; see embedding_dup_pairs_lsh for the vectorized default."""
    from .similarity import _dot, _norm, lsh_bucket_tables

    bk = lsh_bucket_tables(
        df, id_col, vec_col, n_planes, n_tables, carry_all=True
    )
    earlier = [F.col(f"_b{t}") for t in range(n_tables - 1)]
    a = bk.select(
        F.col("_id").alias("id_a"),
        "tbl",
        "bkt",
        *[c.alias(f"_ea{t}") for t, c in enumerate(earlier)],
    )
    b = bk.select(
        F.col("_id").alias("id_b"),
        "tbl",
        "bkt",
        *[c.alias(f"_eb{t}") for t, c in enumerate(earlier)],
    )
    # first-collision filter: drop the pair here if any EARLIER table
    # already bucketed it together (scalar int compares, no array alloc)
    earlier_match = None
    for t in range(n_tables - 1):
        term = (F.col("tbl") > t) & (F.col(f"_ea{t}") == F.col(f"_eb{t}"))
        earlier_match = term if earlier_match is None else earlier_match | term
    n_part = 4 * df.sparkSession.sparkContext.defaultParallelism
    cand = (
        a.repartition(n_part)
        .join(F.broadcast(b), on=["tbl", "bkt"])
        .where(F.col("id_a") < F.col("id_b"))
    )
    if earlier_match is not None:
        cand = cand.where(~earlier_match)
    cand = cand.select("id_a", "id_b")
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("norm", _norm(F.col("v")))
    va = F.broadcast(vecs.withColumnsRenamed({"id": "id_a", "v": "va", "norm": "na"}))
    vb = F.broadcast(vecs.withColumnsRenamed({"id": "id_b", "v": "vb", "norm": "nb"}))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def simhash60(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) 60-bit sign fingerprint — the production-width SimHash
    (Manku et al., WWW'07 use 64 bits; 16 bits collide on any corpus that
    shares vocabulary).

    Bit independence comes from TWO portable 31-bit token hashes (the
    second over a prefixed token), 30 low bits each — both reproducible
    bit-for-bit in the DuckDB oracle, unlike a native 64-bit hash whose
    algorithm differs between engines. Same relational shape as simhash16:
    token explode → one codegen'd conditional-sum aggregate → bit math.
    """
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("w")
    ).select(
        "id",
        portable_hash31(F.col("w")).alias("h1"),
        portable_hash31(F.concat(F.lit("s2#"), F.col("w"))).alias("h2"),
    )
    half = 30
    lane = lambda b: F.col("h1") if b < half else F.col("h2")  # noqa: E731
    bit_sums = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(lane(b), b % half).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(60)
        ]
    )
    fp = None
    for b in range(60):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return bit_sums.select("id", fp.cast("long").alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(id_a, id_b, hamming) — near-duplicate pairs whose 60-bit simhash
    fingerprints differ in at most ``max_hamming`` bits.

    Scale shape (the SimHash analogue of minhash_lsh_pairs' banding, and
    the classic near-dup design over a web corpus): split the fingerprint
    into ``bands`` equal bit-slices; by pigeonhole, two fingerprints within
    hamming distance bands-1 share at least one identical slice, so
    candidates come from ``bands`` equality joins on (band_no, 15-bit slice
    value) — never an all-pairs product — and the verify is one
    bit_count(xor) per candidate, O(candidates) total. Requires
    max_hamming <= bands - 1 for exact recall (asserted).
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"banding loses recall: max_hamming={max_hamming} needs >= "
            f"{max_hamming + 1} bands (got {bands})"
        )
    bits = 60
    if bits % bands:
        raise ValueError(f"{bits}-bit fingerprint not divisible into {bands} bands")
    width = bits // bands
    mask = (1 << width) - 1
    s = simhash60(df, id_col, text_col)
    stacked = s.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_no"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("id", "simhash", F.col("e.band_no").alias("band_no"), F.col("e.bv").alias("bv"))
    cand = (
        stacked.alias("a")
        .join(stacked.alias("b"), on=["band_no", "bv"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def semdedup_keep(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_centroids: int = 8,
    sample_per_centroid: int = 32,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings, then pruning — WITHIN each cluster only — every
    vector that has a smaller-id cluster-mate with rounded cosine ≥
    ``threshold``. One deterministic representative per semantic-duplicate
    group survives (the paper keeps a random member; smallest-id makes the
    result — and the DuckDB oracle — reproducible across cluster sizes).

    Plan shape, in corpus passes: the deterministic sampled-Lloyd centroid
    build (``ivf_centroids`` — every build row sample-bounded), assignment
    via broadcast centroids + ONE per-vector max_by aggregation that
    CARRIES the vector (no join back on the corpus id), then SemDeDup's
    defining move — the pairwise check is an equality self-join on cid, so
    the candidate set is Σ|cluster|² instead of n²; at 100 TB
    ``n_centroids`` scales with the corpus (the paper uses ~100k clusters
    on LAION) keeping every cluster bounded. A final left-anti join drops
    the pruned ids. No all-pairs product anywhere.

    Returns the KEPT rows as (id_col, cid).
    """
    from .similarity import _dot, _norm, _sim, ivf_centroids

    cents = ivf_centroids(df, id_col, vec_col, n_centroids, sample_per_centroid)
    v = df.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cnorm", _norm(F.col("cv")))
    j = v.crossJoin(F.broadcast(cents)).select(
        "nid",
        "cid",
        _sim("cv", "ce", "cnorm", "cenorm").alias("sim"),
        "cv",
        "cnorm",
    )
    # carry the vector through the assignment agg (all 8 candidate rows
    # hold the same cv/cnorm, so any_value is deterministic) — the corpus
    # id is never a join key
    asg = j.groupBy("nid").agg(
        F.max_by(F.col("cid"), F.struct(F.col("sim"), -F.col("cid"))).alias("cid"),
        F.any_value("cv").alias("cv"),
        F.any_value("cnorm").alias("cnorm"),
    )
    # Election-strategy choice (guide §3.1, §4.2): with a SMALL cluster
    # count the within-cluster pair product is bounded (the clusters fit
    # the broadcast-gate memory posture), so the election runs as the
    # vectorized blocked-BLAS kernel — each vector crosses the Python
    # boundary once, the Σ|cluster|² ≈ 25 M-pair product at sf1.0 is a
    # handful of matmuls, and parallelism comes from row-block work units
    # instead of the 8-ary cid key. At 100 TB ``n_centroids`` scales with
    # the corpus (the paper uses ~100k clusters) and the corpus no longer
    # fits one broadcast — there the cid key has enough cardinality to
    # parallelize a plain shuffle join, so past a cid-cardinality
    # threshold we keep the relational equality join. Decision is on key
    # CARDINALITY, not a local core count — scale-adaptive by
    # construction. (Non-integer ids take the relational path too: the
    # kernel indexes ids as int64.)
    if n_centroids <= 4096 and _int_id(df, id_col):
        return semdedup_elect_vectorized(
            asg.select("nid", "cid", "cv", "cnorm"), threshold, id_out=id_col
        )
    a = asg.select(
        "cid",
        F.col("nid").alias("nid_a"),
        F.col("cv").alias("va"),
        F.col("cnorm").alias("na"),
    )
    b = asg.select(
        "cid",
        F.col("nid").alias("nid_b"),
        F.col("cv").alias("vb"),
        F.col("cnorm").alias("nb"),
    )
    dups = (
        a.join(b, "cid")
        .where(F.col("nid_a") < F.col("nid_b"))
        .where(
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4)
            >= F.lit(threshold)
        )
        .select(F.col("nid_b").alias("nid"))
        .distinct()
    )
    return (
        asg.join(dups, "nid", "left_anti")
        .select(F.col("nid").alias(id_col), "cid")
    )
