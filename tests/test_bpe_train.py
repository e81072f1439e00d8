"""BPE TRAINING (operators/text.py train_bpe): the learning half of the
tokenizer, re-expressed relationally — word histogram once, then per-round
pair-count/argmax/separator-guarded-replace — pinned against a pure-Python
classic BPE trainer (explicit symbol lists, non-overlapping left-to-right
merge application, (count DESC, lhs, rhs) tie-break)."""

import re
from collections import Counter

import pytest

from oplogtoredis_spark.operators.text import train_bpe


def ref_train(texts, n):
    words = Counter()
    for t in texts:
        words.update(re.findall(r"[a-z0-9]+", t.lower()))
    enc = Counter({tuple(w): c for w, c in words.items()})
    out = []
    for rank in range(1, n + 1):
        pc = Counter()
        for syms, c in enc.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, l, r, c))
        new = Counter()
        for syms, cnt in enc.items():
            res, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new[tuple(res)] += cnt
        enc = new
    return out


def _train(spark, texts, n, mode="rounds", **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = train_bpe(df, n_merges=n, mode=mode, **kw).collect()
    return sorted(
        (r.merge_rank, r.lhs, r.rhs, r.pair_count) for r in rows
    )


@pytest.mark.parametrize("mode", ["rounds", "plan"])
def test_matches_reference_trainer(spark, mode):
    texts = [
        "banana banana bandana",
        "aaa baa naan ananas",
        "low lower lowest newest wider new",
        "a1 b2 a1a1 a1a1a1",
    ]
    assert _train(spark, texts, 8, mode=mode) == ref_train(texts, 8)


def test_modes_agree_with_tiny_persist_interval(spark):
    texts = ["banana bandana low lower lowest", "aaa naan a1a1a1 b2"]
    assert (
        _train(spark, texts, 6, mode="rounds", persist_every=2)
        == _train(spark, texts, 6, mode="plan")
        == ref_train(texts, 6)
    )


def test_overlapping_runs_merge_left_to_right(spark):
    # 'aaaa' must yield [aa][aa] and 'aaa' [aa][a] in round 2's input:
    # the rank-1 (a,a) count is 5 (3 from aaaa + 2 from aaa), and rank 2
    # sees (aa,aa) once and (aa,a) once
    texts = ["aaaa aaa"]
    got = _train(spark, texts, 3)
    assert got == ref_train(texts, 3)
    assert got[0] == (1, "a", "a", 5)


def test_tie_break_is_lexicographic(spark):
    # (a,b) and (c,d) both occur exactly twice: lhs asc wins
    texts = ["ab ab cd cd"]
    got = _train(spark, texts, 1)
    assert got == [(1, "a", "b", 2)] == ref_train(texts, 1)


@pytest.mark.parametrize("mode", ["rounds", "plan"])
def test_pair_exhaustion_leaves_later_ranks_absent(spark, mode):
    texts = ["ab ab"]
    got = _train(spark, texts, 5, mode=mode)
    assert got == [(1, "a", "b", 2)] == ref_train(texts, 5)


def test_randomized_corpus(spark):
    import random

    rng = random.Random(42)
    alpha = "abcde12"
    texts = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(3, 12))
        )
        for _ in range(40)
    ]
    assert _train(spark, texts, 10) == ref_train(texts, 10)


def test_validation(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(df, n_merges=0)
    with pytest.raises(ValueError, match="unknown mode"):
        train_bpe(df, mode="magic")
