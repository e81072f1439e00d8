"""Fixed-iteration PageRank over an edge table — graph importance scoring
for corpus curation (link-graph quality weighting of web/code documents is
a standard training-data signal, the natural next step after the
connected-components resolution in operators/dedup.py).

EXACT integer arithmetic, the repo's determinism discipline: ranks are e9
fixed-point longs; each edge's contribution is ``(rank_e9 * d_pct) div
(outdeg * 100)`` — pure integer multiply/divide, so per-node sums are
order-independent and the DuckDB oracle reproduces every iteration
bit-identically (float PageRank sums are partition-order-dependent).
This is the "leaky" PageRank variant: dangling nodes (no out-edges) leak
their damped mass instead of redistributing it, and integer division
truncates sub-e-9 remainders — both deliberate, documented trade-offs
that keep the computation exactly reproducible across engines. Ranks
still order nodes identically to the float variant at e9 resolution.

Plan shape per iteration: ranks join the (src, dst, outdeg) edge relation
on src — both sides hash-partitioned by src, the join reuses one
partitioning — then ONE aggregation shuffle on dst; the node spine
left-join keeps contribution-less nodes at the teleport base. The edge
relation's identical subtrees across iterations canonicalize equal, so
AQE exchange reuse materializes the edge scan/degree shuffle once. Total:
O(iters) shuffles over edge-sized data, the textbook distributed PR
schedule. The single driver-side scalar is the node COUNT (needed inside
integer literals); it is one aggregate, not a collect of rows.

Reference analogue: none — downstream corpus-analytics surface (SURVEY.md
"LLM-data-pipeline operators"), same category as retrieval/dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank_e9) after ``iters`` synchronous iterations.

    ``damping_pct`` is the damping factor in integer percent (85 = the
    classic 0.85) so every expression stays in long arithmetic. Duplicate
    edges are collapsed (a link counts once); null endpoints are rejected
    loudly — an edge table with null keys is a broken upstream join, not
    data."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .withColumn(
            "src",
            F.when(
                F.assert_true(
                    F.col("src").isNotNull() & F.col("dst").isNotNull(),
                    "pagerank: null edge endpoint",
                ).isNull(),
                F.col("src"),
            ),
        )
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # NOT persisted: every iteration references the IDENTICAL (src, dst,
    # outdeg) subtree, so within the one final plan the subtrees
    # canonicalize equal and AQE's exchange reuse materializes the edge
    # scan + dedup + degree shuffle once (the retrieval.py discipline) —
    # no cache to leak from a library call.
    ed = e.join(deg, "src")
    n_nodes = nodes.count()  # one aggregate-sized driver scalar
    if n_nodes == 0:
        return nodes.withColumn("rank_e9", F.lit(0).cast("long"))
    init = 10**9 // n_nodes
    if init == 0:
        # past ~1e9 nodes the e9 grid has no resolution left: init (and
        # the teleport base) floor to 0 and every rank is silently 0.
        # Fail naming the ceiling — a larger graph needs a wider grid
        # (e12/e15 variant), not garbage output.
        raise ValueError(
            f"pagerank: {n_nodes} nodes exceed the e9 fixed-point "
            "resolution (init floors to 0); use a wider-grid variant"
        )
    base = (100 - damping_pct) * 10**9 // (100 * n_nodes)
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_e9"))
    for it in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(rank_e9 * {int(damping_pct)}L)"
                    f" div (outdeg * 100L)"
                ).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_c"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("_c"), F.lit(0)))
            .cast("long")
            .alias("rank_e9"),
        )
        # lineage control for convergence-grade iteration counts: each
        # round nests a join over the previous plan, and past a few dozen
        # levels Catalyst analysis cost grows super-linearly (train_bpe's
        # persist_every discipline). Values are unchanged — localCheckpoint
        # just cuts the logical plan.
        if (it + 1) % 16 == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
