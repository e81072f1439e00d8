"""SemanticCorpus: incremental SemDeDup equals the batch recompute.

The invariant under test: after ANY sequence of epochs (inserts, deletes,
re-embeds), ``kept(spark)`` equals ``semdedup_keep`` over the live
embeddings — given a stable centroid sample (the frozen-quantizer contract;
every scenario here keeps the batch operator's smallest-id sample fixed so
the comparison is exact, not approximate)."""

import pytest
from pyspark.sql import functions as F

from oplogtoredis_spark.operators.dedup import semdedup_keep
from oplogtoredis_spark.operators.semantic_corpus import SemanticCorpus

SF = "/root/testdata/sf0.001"


def _batch(spark, rows):
    """rows: [(doc_id, embedding|None, op)]"""
    return spark.createDataFrame(
        rows, "doc_id long, embedding array<double>, op string"
    )


def _kept_batch(spark, live_rows, **kw):
    df = spark.createDataFrame(live_rows, "vec_id long, embedding array<double>")
    return {
        (r.vec_id, r.cid) for r in semdedup_keep(df, **kw).collect()
    }


def _kept_inc(spark, corpus):
    return {(r.doc_id, r.cid) for r in corpus.kept(spark).collect()}


@pytest.fixture()
def emb_rows(spark):
    return [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    ]


def test_multi_epoch_parity_with_batch(spark, tmp_path, emb_rows):
    """Three epochs over the real sf0.001 embeddings — inserts, deletes,
    re-inserts — and after EVERY epoch the incremental keep set equals the
    batch semdedup_keep over the live rows. Epoch 1 carries ids 0..299, so
    the frozen sample (smallest 256) equals the batch operator's sample at
    every step (ids <256 are never touched again)."""
    by_id = dict(emb_rows)
    corpus = SemanticCorpus(str(tmp_path / "sem"), threshold=0.4)

    e1 = [(i, by_id[i], "u") for i in range(300)]
    corpus.apply_epoch(spark, _batch(spark, e1), 1)
    live = [(i, by_id[i]) for i in range(300)]
    assert _kept_inc(spark, corpus) == _kept_batch(spark, live, threshold=0.4)

    e2 = [(i, by_id[i], "u") for i in range(300, 400)] + [
        (i, None, "d") for i in range(280, 300)
    ]
    corpus.apply_epoch(spark, _batch(spark, e2), 2)
    live = [(i, by_id[i]) for i in list(range(280)) + list(range(300, 400))]
    assert _kept_inc(spark, corpus) == _kept_batch(spark, live, threshold=0.4)

    e3 = [(i, by_id[i], "u") for i in list(range(280, 300)) + list(range(400, 500))]
    corpus.apply_epoch(spark, _batch(spark, e3), 3)
    live = [(i, by_id[i]) for i in range(500)]
    want = _kept_batch(spark, live, threshold=0.4)
    assert _kept_inc(spark, corpus) == want
    # final state must ALSO equal the plain full-table batch operator
    full = semdedup_keep(
        spark.read.parquet(f"{SF}/embeddings.parquet"), threshold=0.4
    )
    assert {(r.vec_id, r.cid) for r in full.collect()} == want


BUNDLES = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.0, 0.0, 1.0]}


def _planted(bundle, i, eps=0.0):
    v = list(BUNDLES[bundle])
    v[(bundle + 1) % 3] += eps
    return v


def test_delete_promotes_pruned_mate(spark, tmp_path):
    """ids 0,1 are near-duplicates (same bundle): 1 is pruned. Deleting 0
    must promote 1 back into the keep set — and the keep delta for that
    epoch records exactly the flip."""
    corpus = SemanticCorpus(
        str(tmp_path / "sem"), threshold=0.95, n_centroids=3,
        sample_per_centroid=4,
    )
    e1 = [
        (0, _planted(0, 0), "u"),
        (1, _planted(0, 1, 0.01), "u"),
        (4, _planted(1, 0), "u"),
        (8, _planted(2, 0), "u"),
    ]
    corpus.apply_epoch(spark, _batch(spark, e1), 1)
    k1 = {d for d, _ in _kept_inc(spark, corpus)}
    assert 0 in k1 and 1 not in k1 and {4, 8} <= k1

    stats = corpus.apply_epoch(spark, _batch(spark, [(0, None, "d")]), 2)
    k2 = {d for d, _ in _kept_inc(spark, corpus)}
    assert 1 in k2 and 0 not in k2 and {4, 8} <= k2
    # the epoch emitted exactly one member 'd' and the two keep flips
    assert stats["member_delta_rows"] == 1
    assert stats["keep_delta_rows"] == 2  # d:0, a:1


def test_untouched_clusters_emit_zero_delta_rows(spark, tmp_path):
    """An epoch touching only bundle-0 ids writes keep deltas only for
    bundle 0's cluster — untouched clusters contribute zero rows (the
    incrementality invariant, pinned on actual delta contents)."""
    corpus = SemanticCorpus(
        str(tmp_path / "sem"), threshold=0.95, n_centroids=3,
        sample_per_centroid=4,
    )
    e1 = [(b * 4 + i, _planted(b, i, 0.01 * i), "u")
          for b in range(3) for i in range(4)]
    corpus.apply_epoch(spark, _batch(spark, e1), 1)
    cid_of = {r.doc_id: r.cid for r in corpus.members(spark).collect()}
    b0_cid = cid_of[0]

    corpus.apply_epoch(spark, _batch(spark, [(1, None, "d")]), 2)
    import os

    kdir = os.path.join(str(tmp_path / "sem"), "keep", "e000002")
    delta = spark.read.parquet(kdir).collect()
    assert all(r.cid == b0_cid or r.cid is None for r in delta)
    # parity after the churn
    live = [(d, _planted(d // 4, d % 4, 0.01 * (d % 4)))
            for d in sorted(cid_of) if d != 1]
    assert _kept_inc(spark, corpus) == _kept_batch(
        spark, live, threshold=0.95, n_centroids=3, sample_per_centroid=4
    )


def test_reembed_moves_cluster_and_reelects(spark, tmp_path):
    """Re-upserting a NON-sample id with a vector pointing at another
    bundle moves its membership to that cluster and re-elects both
    clusters; parity with the batch recompute over the updated vectors
    holds (the changed id is outside the smallest-id sample, so the
    frozen model equals the batch build)."""
    corpus = SemanticCorpus(
        str(tmp_path / "sem"), threshold=0.95, n_centroids=3,
        sample_per_centroid=4,
    )
    rows = [(b * 4 + i, _planted(b, i, 0.01 * i)) for b in range(3) for i in range(4)]
    rows.append((13, _planted(0, 0, 0.02)))  # bundle-0 near-dup, pruned (id 13 > 0)
    corpus.apply_epoch(
        spark, _batch(spark, [(d, v, "u") for d, v in rows]), 1
    )
    assert 13 not in {d for d, _ in _kept_inc(spark, corpus)}

    # re-embed 13 into an empty direction of bundle 1's cluster
    moved = _planted(1, 0, 0.3)
    corpus.apply_epoch(spark, _batch(spark, [(13, moved, "u")]), 2)
    live = [(d, v) for d, v in rows if d != 13] + [(13, moved)]
    assert _kept_inc(spark, corpus) == _kept_batch(
        spark, live, threshold=0.95, n_centroids=3, sample_per_centroid=4
    )


def test_replay_idempotent(spark, tmp_path):
    corpus = SemanticCorpus(
        str(tmp_path / "sem"), threshold=0.95, n_centroids=3,
        sample_per_centroid=4,
    )
    e1 = [(i, _planted(i % 3, i // 3), "u") for i in range(6)]
    corpus.apply_epoch(spark, _batch(spark, e1), 1)
    before = _kept_inc(spark, corpus)
    out = corpus.apply_epoch(spark, _batch(spark, e1), 1)
    assert out == {"skipped_replay": True}
    assert _kept_inc(spark, corpus) == before


def test_param_freeze_guard(spark, tmp_path):
    corpus = SemanticCorpus(str(tmp_path / "sem"), threshold=0.95,
                            n_centroids=3, sample_per_centroid=4)
    corpus.apply_epoch(
        spark, _batch(spark, [(0, _planted(0, 0), "u")]), 1
    )
    with pytest.raises(ValueError, match="frozen with the model"):
        SemanticCorpus(str(tmp_path / "sem"), threshold=0.5,
                       n_centroids=3, sample_per_centroid=4)


def test_null_embedding_fails_loud(spark, tmp_path):
    corpus = SemanticCorpus(str(tmp_path / "sem"), threshold=0.95,
                            n_centroids=3, sample_per_centroid=4)
    with pytest.raises(Exception, match="NULL embedding for doc_id 7"):
        corpus.apply_epoch(
            spark, _batch(spark, [(0, _planted(0, 0), "u"), (7, None, "u")]), 1
        )


# ---------------- follow a CDC lake ----------------
def _lake_vec_batch(spark, rows, ts):
    """Embeddings as CDC envelopes: path=str(doc_id), content=json(vector)."""
    import json as _json

    cols = (
        "repo string, path string, ts long, tx_idx int, op string,"
        " commit string, lang string, content string"
    )
    return spark.createDataFrame(
        [
            ("emb", str(i), ts << 32, int(i), op,
             f"c{ts}", "en", None if v is None else _json.dumps(v))
            for (i, v, op) in rows
        ],
        cols,
    )


def test_follow_lake_converges_through_churn(spark, tmp_path):
    """Lake commit 1 inserts the three prototypes (ids 0-2 — the entire
    frozen centroid sample at sample_per_centroid=1, never touched again),
    a near-dup pair (10, 11) off-axis, and a sign-flipped draft (12);
    commit 2 fixes the draft (update → cluster move), deletes 10 (promoting
    its pruned mate 11), and inserts 13. After each follow the keep set
    equals the batch semdedup over the lake's live vectors; the second
    follow is driven by the NET changelog only."""
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    kw = dict(threshold=0.95, n_centroids=3, sample_per_centroid=1)
    c = SemanticCorpus(str(tmp_path / "sem"), **kw)

    protos = {i: BUNDLES[i] for i in range(3)}
    # near-dup pair: mutually >=0.95, but only ~0.92 to prototype 0 (same
    # cluster as 0, below tau to it — 10 prunes 11, nothing prunes 10)
    d45, d45b = [1.0, 0.42, 0.0], [1.0, 0.45, 0.0]
    wrong = [-1.0, 0.0, -1.0]                          # sign-flipped draft
    fixed, extra = [1.0, 0.0, 1.0], [0.0, 1.0, 1.0]
    t.merge_batch(
        _lake_vec_batch(
            spark,
            [(i, protos[i], "u") for i in range(3)]
            + [(10, d45, "u"), (11, d45b, "u"), (12, wrong, "u")],
            1,
        ),
        0,
    )
    s1 = c.follow_lake(spark, t, repo="emb")
    assert s1["lake_version"] == t.current_version()
    live = [(i, protos[i]) for i in range(3)] + [
        (10, d45), (11, d45b), (12, wrong)
    ]
    k1 = _kept_inc(spark, c)
    assert k1 == _kept_batch(spark, live, **kw)
    assert 10 in {d for d, _ in k1} and 11 not in {d for d, _ in k1}

    # commit 2: fix 12's vector (cluster move), delete 10 (promotes 11),
    # insert 13 — the sample ids 0-2 are untouched
    t.merge_batch(
        _lake_vec_batch(
            spark, [(12, fixed, "u"), (10, None, "d"), (13, extra, "u")], 2
        ),
        1,
    )
    s2 = c.follow_lake(spark, t, repo="emb")
    assert s2["lake_version"] == t.current_version()
    live = [(i, protos[i]) for i in range(3)] + [
        (11, d45b), (12, fixed), (13, extra)
    ]
    kept = _kept_inc(spark, c)
    assert kept == _kept_batch(spark, live, **kw)
    ids = {d for d, _ in kept}
    assert 11 in ids and 10 not in ids and 12 in ids and 13 in ids

    # idempotent: nothing new to fold
    assert c.follow_lake(spark, t, repo="emb")["up_to_date"] is True


def test_follow_lake_rejects_mixed_numbering_and_bad_json(spark, tmp_path):
    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(
        _lake_vec_batch(spark, [(0, _planted(0, 0), "u")], 1), 0
    )
    c = SemanticCorpus(str(tmp_path / "sem"), threshold=0.95, n_centroids=3,
                       sample_per_centroid=4)
    c.apply_epoch(
        spark,
        _batch(spark, [(0, _planted(0, 0), "u")]),
        t.current_version() + 10,
    )
    with pytest.raises(ValueError, match="beyond the lake"):
        c.follow_lake(spark, t, repo="emb")

    # undecodable content trips the loud NULL guard, naming the doc_id
    t2 = LakeTable.create(str(tmp_path / "tbl2"), TARGET_SCHEMA, n_buckets=4)
    rows = [("emb", "5", 1 << 32, 5, "u", "c1", "en", "not-a-vector")]
    t2.merge_batch(
        spark.createDataFrame(
            rows,
            "repo string, path string, ts long, tx_idx int, op string,"
            " commit string, lang string, content string",
        ),
        0,
    )
    c2 = SemanticCorpus(str(tmp_path / "sem2"), threshold=0.95,
                        n_centroids=3, sample_per_centroid=4)
    with pytest.raises(Exception, match="NULL embedding for doc_id 5"):
        c2.follow_lake(spark, t2, repo="emb")


def test_compact_preserves_state_and_bounds_dirs(spark, tmp_path):
    import os

    corpus = SemanticCorpus(str(tmp_path / "sem"), threshold=0.95,
                            n_centroids=3, sample_per_centroid=4)
    e1 = [(b * 4 + i, _planted(b, i, 0.01 * i), "u")
          for b in range(3) for i in range(4)]
    corpus.apply_epoch(spark, _batch(spark, e1), 1)
    corpus.apply_epoch(spark, _batch(spark, [(1, None, "d")]), 2)
    corpus.apply_epoch(
        spark, _batch(spark, [(1, _planted(0, 1, 0.01), "u")]), 3
    )
    before = _kept_inc(spark, corpus)
    corpus.compact(spark)
    assert _kept_inc(spark, corpus) == before
    for log in ("members", "keep"):
        dirs = [d for d in os.listdir(tmp_path / "sem" / log)
                if d.startswith("e")]
        assert dirs == ["e000003"]
    # epochs still applied; a replay of e2 is still skipped
    assert corpus.apply_epoch(
        spark, _batch(spark, [(1, None, "d")]), 2
    ) == {"skipped_replay": True}


# ---------------- crash recovery ----------------
def test_replay_of_crashed_epoch_is_lossless(spark, tmp_path):
    """A crash between the delta write and the marker update leaves orphan
    e-dirs; the applied-epochs fold gate makes them invisible, so
    re-applying the epoch recomputes its flips against the TRUE previous
    state (without the gate the replay would see its own half-applied rows
    as 'previous' and emit an empty delta — losing the epoch)."""
    import json, os

    corpus = SemanticCorpus(str(tmp_path / "sem"), threshold=0.95,
                            n_centroids=3, sample_per_centroid=4)
    e1 = [
        (0, _planted(0, 0), "u"), (1, _planted(0, 1, 0.01), "u"),
        (4, _planted(1, 0), "u"), (8, _planted(2, 0), "u"),
    ]
    corpus.apply_epoch(spark, _batch(spark, e1), 1)
    corpus.apply_epoch(spark, _batch(spark, [(0, None, "d")]), 2)
    want = _kept_inc(spark, corpus)  # 1 promoted, 0 gone

    # simulate the crash: epoch 2's dirs exist but the marker says only 1
    marker = tmp_path / "sem" / "_applied.json"
    with open(marker) as f:
        meta = json.load(f)
    meta["epochs"] = [1]
    with open(marker, "w") as f:
        json.dump(meta, f)

    # readers must not see the unapplied epoch
    assert 0 in {d for d, _ in _kept_inc(spark, corpus)}
    # replaying the epoch restores the exact post-epoch state
    corpus.apply_epoch(spark, _batch(spark, [(0, None, "d")]), 2)
    assert _kept_inc(spark, corpus) == want


def test_crashed_compact_recovers_from_success_staging(spark, tmp_path):
    """A compact that crashed after writing its _SUCCESS staging but before
    finishing the promotion is completed by the next read; a marker-less
    staging dir is swept as garbage, never folded."""
    import os, shutil

    corpus = SemanticCorpus(str(tmp_path / "sem"), threshold=0.95,
                            n_centroids=3, sample_per_centroid=4)
    e1 = [(b * 4 + i, _planted(b, i, 0.01 * i), "u")
          for b in range(3) for i in range(4)]
    corpus.apply_epoch(spark, _batch(spark, e1), 1)
    corpus.apply_epoch(spark, _batch(spark, [(1, None, "d")]), 2)
    want = _kept_inc(spark, corpus)

    # simulate: staging written (complete), originals partially removed
    keep_base = str(tmp_path / "sem" / "keep")
    from oplogtoredis_spark.operators.semantic_corpus import KEEP_SCHEMA
    from pyspark.sql import Window

    folded = (
        spark.read.schema(KEEP_SCHEMA)
        .parquet(*(os.path.join(keep_base, d)
                   for d in sorted(os.listdir(keep_base))))
        .withColumn("_maxe", F.max("epoch").over(Window.partitionBy("doc_id")))
        .where((F.col("epoch") == F.col("_maxe")) & (F.col("op") == "a"))
        .drop("_maxe")
    )
    stage = os.path.join(keep_base, "e000002_compact_staging")
    folded.write.mode("overwrite").parquet(stage)
    assert os.path.exists(os.path.join(stage, "_SUCCESS"))
    shutil.rmtree(os.path.join(keep_base, "e000001"))  # crash mid-promotion

    assert _kept_inc(spark, corpus) == want  # recovery promoted the staging
    assert sorted(os.listdir(keep_base)) == ["e000002"]

    # a marker-less staging dir is garbage: swept, state unchanged
    bogus = os.path.join(keep_base, "e000002_compact_staging")
    os.makedirs(bogus)
    assert _kept_inc(spark, corpus) == want
    assert not os.path.exists(bogus)


def test_incremental_corpus_crashed_epoch_replay_is_lossless(spark, tmp_path):
    """The same applied-epochs gate protects IncrementalCorpus (the gate
    lives in the shared helper): a crashed epoch's orphan dirs are
    invisible and its replay restores the exact post-epoch state."""
    import json

    from oplogtoredis_spark.operators.incremental_corpus import IncrementalCorpus

    from tests.test_incremental_corpus import GATE, LONG_A, LONG_B

    long_a, long_b = LONG_A, LONG_B
    c = IncrementalCorpus(str(tmp_path / "corpus"), chunk_tokens=5, overlap=1,
                          **GATE)

    def b(rows):
        return spark.createDataFrame(rows, "doc_id long, text string, op string")

    c.apply_epoch(spark, b([(3, long_a, "u"), (4, long_a, "u"), (6, long_b, "u")]), 1)
    c.apply_epoch(spark, b([(3, long_a, "d")]), 2)  # survivor seat flips 3 -> 4
    want = {(r.doc_id, r.split, r.chunk_idx)
            for r in c.chunks(spark).collect()}
    assert 4 in {d for d, _, _ in want} and 3 not in {d for d, _, _ in want}

    marker = tmp_path / "corpus" / "_applied.json"
    with open(marker) as f:
        meta = json.load(f)
    meta["epochs"] = [1]
    with open(marker, "w") as f:
        json.dump(meta, f)
    assert 3 in {r.doc_id for r in c.chunks(spark).collect()}  # gate holds
    c.apply_epoch(spark, b([(3, long_a, "d")]), 2)
    assert {(r.doc_id, r.split, r.chunk_idx)
            for r in c.chunks(spark).collect()} == want


def test_apply_epoch_rejects_lower_epoch(spark, tmp_path):
    """An epoch below the latest applied one would write rows that
    immediately lose the LWW fold — a silent no-op; rejected loudly.
    Replays of exact applied epochs still short-circuit."""
    corpus = SemanticCorpus(str(tmp_path / "sem"), threshold=0.95,
                            n_centroids=3, sample_per_centroid=4)
    corpus.apply_epoch(spark, _batch(spark, [(0, _planted(0, 0), "u")]), 5)
    assert corpus.apply_epoch(
        spark, _batch(spark, [(0, _planted(0, 0), "u")]), 5
    ) == {"skipped_replay": True}
    with pytest.raises(ValueError, match="below the latest applied"):
        corpus.apply_epoch(spark, _batch(spark, [(1, _planted(1, 0), "u")]), 3)


def test_follow_lake_marker_update_is_atomic(spark, tmp_path):
    """The lake watermark lands in the SAME marker write as the epoch
    list — after a follow, both are present together (a crash can never
    record the epoch without its lake_version)."""
    import json

    from oplogtoredis_spark.sources.schemas import TARGET_SCHEMA
    from oplogtoredis_spark.streaming.lake import LakeTable

    t = LakeTable.create(str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4)
    t.merge_batch(_lake_vec_batch(spark, [(0, _planted(0, 0), "u")], 1), 0)
    c = SemanticCorpus(str(tmp_path / "sem"), threshold=0.95,
                       n_centroids=3, sample_per_centroid=4)
    c.follow_lake(spark, t, repo="emb")
    with open(str(tmp_path / "sem" / "_applied.json")) as f:
        meta = json.load(f)
    assert meta["lake_version"] == t.current_version()
    assert meta["epochs"] == [t.current_version()]
