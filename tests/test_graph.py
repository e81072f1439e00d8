"""PageRank (operators/graph.py): exact equality with a pure-Python
integer reference, dangling/contribution-less node handling, determinism
across partitionings, guards."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.graph import pagerank


def _reference(edges, iters=3, d_pct=85):
    """The identical integer recurrence in plain Python."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    init = 10**9 // n
    base = (100 - d_pct) * 10**9 // (100 * n)
    r = {v: init for v in nodes}
    for _ in range(iters):
        c = {v: 0 for v in nodes}
        for s, t in e:
            c[t] += (r[s] * d_pct) // (outdeg[s] * 100)
        r = {v: base + c[v] for v in nodes}
    return r


GRAPH = [
    (1, 2), (1, 3), (2, 3), (3, 1),
    (4, 3),          # 4 has out-edges but nothing points at it
    (2, 5),          # 5 is dangling (no out-edges): leaks its mass
    (1, 2),          # duplicate edge: must collapse
]


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_matches_integer_reference_exactly(spark):
    got = {r.node: r.rank_e9 for r in pagerank(_df(spark, GRAPH), iters=3).collect()}
    assert got == _reference(GRAPH, iters=3)


def test_single_iteration_and_high_damping(spark):
    got = {r.node: r.rank_e9
           for r in pagerank(_df(spark, GRAPH), iters=1, damping_pct=100).collect()}
    assert got == _reference(GRAPH, iters=1, d_pct=100)


def test_dangling_and_source_only_nodes(spark):
    ranks = {r.node: r.rank_e9 for r in pagerank(_df(spark, GRAPH), iters=2).collect()}
    ref = _reference(GRAPH, iters=2)
    # node 4 receives nothing: exactly the teleport base
    n = len(ref)
    assert ranks[4] == (100 - 85) * 10**9 // (100 * n)
    # node 5 is present despite having no out-edges
    assert 5 in ranks and ranks[5] == ref[5]


def test_deterministic_across_partitionings(spark):
    big = [(i, (i * 7 + 3) % 40) for i in range(200)] + [
        (i, (i * 13 + 1) % 40) for i in range(120)
    ]
    a = sorted(map(tuple, pagerank(_df(spark, big).coalesce(1), iters=3).collect()))
    b = sorted(map(tuple, pagerank(_df(spark, big).repartition(16), iters=3).collect()))
    assert a == b == sorted(_reference(big, iters=3).items())


def test_guards(spark):
    df = _df(spark, GRAPH)
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(df, damping_pct=101)
    with pytest.raises(Exception, match="null edge endpoint"):
        pagerank(
            spark.createDataFrame([(1, None)], "src long, dst long")
        ).collect()
