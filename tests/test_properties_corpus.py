"""Property-based invariants (hypothesis) for the session-7 corpus
operators: span_dedup vs a pure-Python first-occurrence model, and
pack_chunks vs a pure-Python hash-packing model (including the portable
sha256 hash itself)."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from oplogtoredis_spark.operators.packing import pack_chunks
from oplogtoredis_spark.operators.spandedup import span_dedup

# tiny alphabet so cross-document span collisions actually happen
docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=9),
    min_size=1,
    max_size=8,
)


def _py_span_dedup(docs, w):
    spans = []  # (doc_id, idx, span)
    for did, toks in docs:
        n = max(1, math.ceil(len(toks) / w))
        for i in range(n):
            spans.append((did, i, " ".join(toks[i * w : (i + 1) * w])))
    winner = {}
    for did, i, s in spans:
        if s not in winner or (did, i) < winner[s]:
            winner[s] = (did, i)
    out = {}
    for did, toks in docs:
        kept, total, dropped = [], 0, 0
        n = max(1, math.ceil(len(toks) / w))
        for i in range(n):
            s = " ".join(toks[i * w : (i + 1) * w])
            total += 1
            if winner[s] == (did, i):
                kept.append(s)
            else:
                dropped += 1
        if kept:
            out[did] = (" ".join(kept), total, dropped)
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(word_lists=docs_strategy, w=st.integers(min_value=1, max_value=4))
def test_span_dedup_matches_reference_model(spark, word_lists, w):
    docs = [(i, toks) for i, toks in enumerate(word_lists)]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_spans"], r["n_spans_dropped"])
        for r in span_dedup(df, span_words=w).collect()
    }
    assert got == _py_span_dedup(docs, w)


def _h64(key: str) -> int:
    return int(hashlib.sha256(key.encode()).hexdigest()[:15], 16)


def _py_pack(chunks, budget):
    total = sum(t for _i, _c, t in chunks)
    ns = max(1, -(-total // budget))
    placed = [(_h64(f"{i}|{c}"), i, c, t) for i, c, t in chunks]
    out = {}
    by_shard = {}
    for h, i, c, t in placed:
        by_shard.setdefault(h % ns, []).append((h, i, c, t))
    for sid, rows in by_shard.items():
        rows.sort()
        off = 0
        for pos, (h, i, c, t) in enumerate(rows):
            out[(i, c)] = (sid, pos, off)
            off += t
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=30),
    budget=st.integers(min_value=5, max_value=200),
)
def test_pack_chunks_matches_reference_model(spark, toks, budget):
    chunks = [(i // 3, i % 3, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(chunks, "doc_id long, chunk_idx int, n_tokens int")
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["shard_id"],
            r["pack_pos"],
            r["token_offset"],
        )
        for r in pack_chunks(df, budget=budget).collect()
    }
    assert got == _py_pack(chunks, budget)
