"""Incremental SEMANTIC dedup (SemDeDup) over a stream of embedding changes.

``semdedup_keep`` (operators/dedup.py) is the batch recompute: cluster the
corpus, keep — per cluster — only vectors with no smaller-id cluster-mate at
rounded cosine ≥ τ. The production job is INCREMENTAL: each CDC epoch
delivers a bounded batch of new/changed/deleted embeddings (documents get
re-embedded, retracted, added), and the keep set must converge to exactly
what the batch recompute would produce — without re-scoring the unaffected
part of the corpus. This is the semantic sibling of
``IncrementalCorpus`` (exact-hash dedup) and reuses its state discipline.

The coarse quantizer is FROZEN at first fit — the IVF-index posture
(a 100 TB vector index does not retrain its centroids per insert; it
re-fits offline and rebuilds). Centroids come from the deterministic
sampled-Lloyd build (``ivf_centroids``) over the FIRST epoch's batch and
are persisted in a json sidecar, so restarts and the DuckDB oracle see the
identical model. Batch-parity therefore holds whenever the batch
operator's centroid sample (the corpus's 256 smallest live ids) matches
the fitted sample — the parity tests and the driver query construct their
epochs that way; a drifted sample degrades RECALL of the prune, never
correctness of the fold.

State: two append-only LWW delta logs (merge-on-read, as incremental_corpus):

  members/e{epoch}/  (epoch, op a|d, doc_id, cid, vec, nrm)
                     every live embedding with its frozen-model cluster id;
                     vec/nrm ride along so re-election never needs a second
                     store.
  keep/e{epoch}/     (epoch, op a|d, doc_id, cid) — the OUTPUT keep set.

Incrementality invariant (what makes an epoch O(affected), not O(corpus)):
under the frozen quantizer, an epoch can only change keep-status within the
CLUSTERS it touches — the cids its upserts land in plus the previous cids
of every batched doc_id. Keep seats are re-elected only inside that
affected cid set (the same within-cluster smaller-id-wins rule as the
batch operator), and keep deltas are emitted only for (doc_id, cid) pairs
that actually flipped. Untouched clusters contribute zero delta rows
(pinned in tests/test_semantic_corpus.py).

100 TB notes: the per-epoch joins are keyed on doc_id (folded state, LWW
window) and cid (re-election self-join — Σ|affected cluster|², SemDeDup's
defining bound, with n_centroids scaled so clusters stay bounded); the
affected-cid semi-joins broadcast a bounded set. Reference parity: this is
a CDC *consumer* composition — the ordered per-key delivery it relies on is
exactly the reference's publish guarantee (oplogtoredis README "ordered
within a document"), the same contract streaming/history.py builds on.
"""

from __future__ import annotations

import contextlib
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .incremental_corpus import _EDIR_RE, _applied_delta_dirs, _footer_rows

MEMBER_SCHEMA = (
    "epoch long, op string, doc_id long, cid int, vec array<double>, nrm double"
)
KEEP_SCHEMA = "epoch long, op string, doc_id long, cid int"


class SemanticCorpus:
    """SemDeDup keep-set maintained epoch-by-epoch; after any number of
    epochs, ``kept(spark)`` equals the batch ``semdedup_keep`` over the
    live embeddings (given a stable centroid sample — see module doc)."""

    def __init__(
        self,
        path: str,
        threshold: float = 0.4,
        n_centroids: int = 8,
        sample_per_centroid: int = 32,
    ):
        self.path = path
        self._members_dir = os.path.join(path, "members")
        self._keep_dir = os.path.join(path, "keep")
        self._marker = os.path.join(path, "_applied.json")
        self._model = os.path.join(path, "centroids.json")
        self.threshold = threshold
        self.n_centroids = n_centroids
        self.sample_per_centroid = sample_per_centroid
        os.makedirs(self._members_dir, exist_ok=True)
        os.makedirs(self._keep_dir, exist_ok=True)
        if os.path.exists(self._model):
            with open(self._model) as f:
                cfg = json.load(f)["config"]
            mine = [threshold, n_centroids, sample_per_centroid]
            if cfg != mine:
                raise ValueError(
                    f"SemanticCorpus at {path} was fitted with "
                    f"(threshold, n_centroids, sample_per_centroid)={cfg}; "
                    f"got {mine} — parameters are frozen with the model"
                )

    # ---------------- state read (MoR fold) ----------------
    def applied_epochs(self) -> list[int]:
        if not os.path.exists(self._marker):
            return []
        with open(self._marker) as f:
            return json.load(f)["epochs"]

    def _delta_dirs(self, base: str) -> list[str]:
        # applied-epochs gate + staging-recovery: see _applied_delta_dirs —
        # makes epoch application atomic to readers and to replays
        return _applied_delta_dirs(base, set(self.applied_epochs()))

    def _fold(self, spark: SparkSession, base: str, schema: str) -> DataFrame:
        """LWW per doc_id by epoch: the row of each doc's HIGHEST epoch
        stands; a 'd' at that epoch retires it. One shuffle keyed on
        doc_id (storage-partitioned on a bucketed layout)."""
        dirs = self._delta_dirs(base)
        if not dirs:
            return spark.createDataFrame([], schema)
        d = spark.read.schema(schema).parquet(*dirs)
        w = Window.partitionBy("doc_id")
        return (
            d.withColumn("_maxe", F.max("epoch").over(w))
            .where((F.col("epoch") == F.col("_maxe")) & (F.col("op") == "a"))
            .drop("_maxe")
        )

    def members(self, spark: SparkSession) -> DataFrame:
        """(doc_id, cid, vec) of every live embedding."""
        return self._fold(spark, self._members_dir, MEMBER_SCHEMA).select(
            "doc_id", "cid", "vec"
        )

    def kept(self, spark: SparkSession) -> DataFrame:
        """The output keep set: (doc_id, cid) — the incremental equivalent
        of ``semdedup_keep`` over the live corpus."""
        return self._fold(spark, self._keep_dir, KEEP_SCHEMA).select(
            "doc_id", "cid"
        )

    # ---------------- frozen coarse quantizer ----------------
    def _fit_or_load_centroids(self, spark: SparkSession, up: DataFrame):
        """Centroid table (cid, ce, cenorm). Fitted ONCE from the first
        epoch's upserts via the deterministic sampled-Lloyd build, then
        persisted as a json sidecar (bounded: n_centroids rows) so every
        later epoch, restart, and the oracle see the identical model."""
        if os.path.exists(self._model):
            with open(self._model) as f:
                rows = json.load(f)["centroids"]
            return spark.createDataFrame(
                [(r["cid"], r["ce"], r["cenorm"]) for r in rows],
                "cid int, ce array<double>, cenorm double",
            )
        from .similarity import ivf_centroids

        if up.isEmpty():
            raise ValueError(
                "first SemanticCorpus epoch has no upserts — cannot fit "
                "the coarse quantizer (provide embeddings in epoch 1)"
            )
        cents = ivf_centroids(
            up, "doc_id", "vec", self.n_centroids, self.sample_per_centroid
        ).collect()
        payload = {
            "config": [self.threshold, self.n_centroids, self.sample_per_centroid],
            "centroids": [
                {"cid": r["cid"], "ce": list(r["ce"]), "cenorm": r["cenorm"]}
                for r in sorted(cents, key=lambda r: r["cid"])
            ],
        }
        tmp = self._model + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._model)
        return self._fit_or_load_centroids(spark, up)

    # ---------------- epoch step ----------------
    _ROWS_PER_PARTITION = 50_000

    @contextlib.contextmanager
    def _epoch_shuffle_scale(self, spark: SparkSession):
        """Epoch jobs run at data-scaled parallelism (incremental_corpus's
        measured fix: the session's reduce floor schedules 128 near-empty
        tasks per tiny shuffle otherwise). Partitions = clamp(state_rows /
        50k, 4, session ceiling); state_rows from parquet footers —
        driver-side metadata, no Spark job."""
        state_rows = sum(
            _footer_rows(d)
            for base in (self._members_dir, self._keep_dir)
            for d in self._delta_dirs(base)
        )
        ceil_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        p = max(4, min(ceil_p, state_rows // self._ROWS_PER_PARTITION + 4))
        if p >= ceil_p:
            yield
            return
        floor_key = "spark.sql.adaptive.coalescePartitions.minPartitionNum"
        old_floor = spark.conf.get(floor_key, None)
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        spark.conf.set(floor_key, str(p))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(ceil_p))
            if old_floor is None:
                spark.conf.unset(floor_key)
            else:
                spark.conf.set(floor_key, old_floor)

    def apply_epoch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        epoch: int,
        _extra_meta: dict | None = None,
    ) -> dict:
        """Apply one change batch: (doc_id long, embedding array, op 'u'|'d'),
        at most one row per doc_id (collapse upstream — the CDC lake's LWW
        merge already guarantees this for lake-sourced deltas). A 'u' with a
        NULL embedding fails loudly JVM-side naming the doc_id.

        Work is bounded by the batch and its affected clusters; returns
        counters for observability. Idempotent per epoch (marker replay);
        an epoch BELOW the latest applied one is rejected loudly — its
        rows would be written but immediately lose the LWW fold, a silent
        no-op the caller would misread as success."""
        from .similarity import _dot, _norm, _sim

        applied = self.applied_epochs()
        if epoch in applied:
            return {"skipped_replay": True}
        if applied and epoch < max(applied):
            raise ValueError(
                f"epoch {epoch} is below the latest applied epoch "
                f"{max(applied)} — its rows would lose the LWW fold; "
                "replay only the exact epochs already applied"
            )

        # the batch feeds FOUR branches (upserts, prev-cid lookup, next-
        # state anti-join, deletes) — persist it once so a lake-changelog
        # batch doesn't re-run the bucket-diff scan per branch
        batch = batch.persist()
        up = batch.where(F.col("op") != "d").select(
            "doc_id",
            F.when(
                F.col("embedding").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("SemanticCorpus: NULL embedding for doc_id "),
                        F.col("doc_id").cast("string"),
                    )
                ).cast("array<double>"),
            )
            .otherwise(F.col("embedding").cast("array<double>"))
            .alias("vec"),
        )
        cents = self._fit_or_load_centroids(spark, up)

        # assign upserts under the frozen model; the vector is CARRIED
        # through the max_by aggregation (doc_id never a join key)
        j = (
            up.withColumn("nrm", _norm(F.col("vec")))
            .withColumnsRenamed({"vec": "cv", "nrm": "cnorm"})
            .crossJoin(F.broadcast(cents))
            .select(
                "doc_id",
                "cid",
                _sim("cv", "ce", "cnorm", "cenorm").alias("sim"),
                "cv",
                "cnorm",
            )
        )
        new_rows = (
            j.groupBy("doc_id")
            .agg(
                F.max_by(
                    F.col("cid"), F.struct(F.col("sim"), -F.col("cid"))
                ).alias("cid"),
                F.any_value("cv").alias("vec"),
                F.any_value("cnorm").alias("nrm"),
            )
            .persist()
        )

        members_prev = self._fold(
            spark, self._members_dir, MEMBER_SCHEMA
        ).persist()

        # the incrementality boundary: clusters this epoch can affect
        prev_of_batch = members_prev.join(
            batch.select("doc_id"), "doc_id"
        ).select("cid")
        affected = (
            new_rows.select("cid").union(prev_of_batch).distinct().persist()
        )

        members_next = members_prev.select(
            "doc_id", "cid", "vec", "nrm"
        ).join(batch.select("doc_id"), "doc_id", "left_anti").unionByName(
            new_rows
        )

        # keep-seat re-election WITHIN affected clusters only: the batch
        # operator's rule (no smaller-id cluster-mate at rounded cos >= tau)
        aff = members_next.join(F.broadcast(affected), "cid").persist()
        # Re-election strategy (guide §3.1, §4.2): the pair product is
        # Σ|affected cluster|² rows keyed on cid, whose cardinality is the
        # (small) affected-cluster count. Under the n_centroids gate the
        # affected member set is bounded (the exact memory posture of the
        # broadcast join this replaces), so the election runs as the
        # vectorized blocked-BLAS kernel (dedup.semdedup_elect_vectorized):
        # each vector crosses the Python boundary once, the ~25 M-pair
        # product at sf1.0 is a handful of matmuls, and parallelism comes
        # from row-block work units (exempt from _epoch_shuffle_scale's
        # linear-row clamp — the quadratic re-election is the one epoch
        # job whose work is NOT linear in state rows). Past a
        # cid-cardinality threshold the plain equality join parallelizes
        # by itself — same scale-adaptive decision as semdedup_keep's.
        if self.n_centroids <= 4096:
            from .dedup import semdedup_elect_vectorized

            keep_next = semdedup_elect_vectorized(
                aff.select("doc_id", "cid", "vec", "nrm"),
                self.threshold,
                id_out="doc_id",
            )
        else:
            a = aff.select(
                "cid",
                F.col("doc_id").alias("id_a"),
                F.col("vec").alias("va"),
                F.col("nrm").alias("na"),
            )
            b = aff.select(
                "cid",
                F.col("doc_id").alias("id_b"),
                F.col("vec").alias("vb"),
                F.col("nrm").alias("nb"),
            )
            dups = (
                a.join(b, "cid")
                .where(F.col("id_a") < F.col("id_b"))
                .where(
                    F.round(
                        _dot(F.col("va"), F.col("vb"))
                        / (F.col("na") * F.col("nb")),
                        4,
                    )
                    >= F.lit(self.threshold)
                )
                .select(F.col("id_b").alias("doc_id"))
                .distinct()
            )
            keep_next = aff.select("doc_id", "cid").join(
                dups, "doc_id", "left_anti"
            )

        # keep_next and keep_prev_aff each feed BOTH flip branches below —
        # persist them so the election kernel and the keep-log fold run
        # once per epoch, not once per branch (measured r6: ~1 s/epoch of
        # re-evaluated mapInPandas + fold at sf1.0)
        keep_next = keep_next.persist()
        keep_prev_aff = (
            self._fold(spark, self._keep_dir, KEEP_SCHEMA)
            .select("doc_id", "cid")
            .join(F.broadcast(affected), "cid")
            .persist()
        )
        # flips only: an 'a' when the (doc_id, cid) seat is new or moved,
        # a 'd' when a previously-kept doc lost its seat everywhere
        keep_adds = keep_next.join(keep_prev_aff, ["doc_id", "cid"], "left_anti")
        keep_dels = keep_prev_aff.join(
            keep_next, "doc_id", "left_anti"
        ).select("doc_id")

        gone = batch.where(F.col("op") == "d").select("doc_id")
        member_delta = new_rows.select(
            F.lit(epoch).alias("epoch"),
            F.lit("a").alias("op"),
            "doc_id",
            "cid",
            "vec",
            "nrm",
        ).unionByName(
            gone.select(
                F.lit(epoch).alias("epoch"),
                F.lit("d").alias("op"),
                "doc_id",
                F.lit(None).cast("int").alias("cid"),
                F.lit(None).cast("array<double>").alias("vec"),
                F.lit(None).cast("double").alias("nrm"),
            )
        )
        keep_delta = keep_adds.select(
            F.lit(epoch).alias("epoch"), F.lit("a").alias("op"), "doc_id", "cid"
        ).unionByName(
            keep_dels.select(
                F.lit(epoch).alias("epoch"),
                F.lit("d").alias("op"),
                "doc_id",
                F.lit(None).cast("int").alias("cid"),
            )
        )

        mdir = os.path.join(self._members_dir, f"e{epoch:06d}")
        kdir = os.path.join(self._keep_dir, f"e{epoch:06d}")
        try:
            # the two delta writes are independent sinks (the marker below
            # is the only commit point) — run them concurrently so the
            # second's stages back-fill the first's tail (guide §2.6);
            # shared persisted branches materialize once
            with self._epoch_shuffle_scale(spark):
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=2) as pool:
                    f1 = pool.submit(
                        lambda: member_delta.write.mode("overwrite").parquet(mdir)
                    )
                    f2 = pool.submit(
                        lambda: keep_delta.write.mode("overwrite").parquet(kdir)
                    )
                    f1.result()
                    f2.result()
        finally:
            for df in (
                batch, new_rows, members_prev, affected, aff,
                keep_next, keep_prev_aff,
            ):
                df.unpersist()

        epochs = self.applied_epochs() + [epoch]
        meta = {"epochs": epochs}
        if os.path.exists(self._marker):
            with open(self._marker) as f:
                meta = {**json.load(f), "epochs": epochs}
        # extra keys (e.g. follow_lake's lake_version) land in the SAME
        # os.replace as the epoch list — a crash can never record the
        # epoch without its lake watermark (or vice versa)
        meta.update(_extra_meta or {})
        tmp = self._marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._marker)
        return {
            "epoch": epoch,
            "member_delta_rows": _footer_rows(mdir),
            "keep_delta_rows": _footer_rows(kdir),
        }

    # ---------------- follow a CDC lake (changelog-driven epochs) -------
    def followed_lake_version(self) -> int:
        """Last lake snapshot this corpus has folded in (-1 = never)."""
        if not os.path.exists(self._marker):
            return -1
        with open(self._marker) as f:
            return json.load(f).get("lake_version", -1)

    def follow_lake(
        self,
        spark: SparkSession,
        table,
        repo: str | None = None,
        vec_format: str = "array<double>",
    ) -> dict:
        """Catch the keep set up to ``table``'s current snapshot via the NET
        changelog (LakeTable.changes) — the CDC lake is the system of
        record and the semantic-dedup state follows it without rescanning
        either side (O(changed buckets) diff + O(batch) epoch fold); the
        same composition discipline as IncrementalCorpus.follow_lake.

        Embedding mapping: a vector rides the lake's generic change
        envelope as ``path = str(doc_id), content = to_json(embedding)``
        (the reference's publish payload IS a JSON document —
        lib/redispub/publisher.go:41-62); ``from_json(content,
        vec_format)`` decodes it here. An UNDECODABLE content decodes to
        NULL and trips apply_epoch's loud NULL-embedding guard naming the
        doc_id — a corrupt vector never silently drops. The corpus epoch
        number IS the lake snapshot version, and the lake watermark is
        written in the SAME atomic marker update as the epoch (a crash can
        never record one without the other); idempotent replay; mixed
        manual numbering rejected. With ``repo=None`` the caller asserts
        paths are globally unique across repos — the lake key is (repo,
        path) but doc_id here is path alone, so a cross-repo path
        collision would violate apply_epoch's one-row-per-doc_id
        contract."""
        from_v = self.followed_lake_version()
        to_v = table.current_version()
        if any(e > to_v for e in self.applied_epochs()):
            raise ValueError(
                "corpus holds epochs beyond the lake's current version — "
                "don't mix follow_lake with manual apply_epoch numbering"
            )
        if from_v < 0:
            base = table.read(spark)
            if repo is not None:
                base = base.where(F.col("repo") == repo)
            batch = base.select(
                F.col("path").cast("long").alias("doc_id"),
                F.from_json(F.col("content"), vec_format).alias("embedding"),
                F.lit("u").alias("op"),
            )
        elif to_v <= from_v:
            return {"lake_version": from_v, "up_to_date": True}
        else:
            ch = table.changes(spark, from_v, to_v)
            if repo is not None:
                ch = ch.where(F.col("repo") == repo)
            batch = ch.where(F.col("_change_type") != "update_preimage").select(
                F.col("path").cast("long").alias("doc_id"),
                F.from_json(F.col("content"), vec_format).alias("embedding"),
                F.when(F.col("_change_type") == "delete", F.lit("d"))
                .otherwise(F.lit("u"))
                .alias("op"),
            )
        stats = self.apply_epoch(
            spark, batch, epoch=to_v, _extra_meta={"lake_version": to_v}
        )
        stats["lake_version"] = to_v
        return stats

    # ---------------- maintenance ----------------
    def compact(self, spark: SparkSession) -> None:
        """Fold all deltas into one base per log (bounds the per-read delta
        scan exactly like LakeTable.compact / IncrementalCorpus.compact).
        Winning epochs are preserved per row so later epochs keep LWW
        semantics."""
        import shutil

        if not self.applied_epochs():
            return
        last = max(self.applied_epochs())
        with self._epoch_shuffle_scale(spark):
            for base, schema in (
                (self._members_dir, MEMBER_SCHEMA),
                (self._keep_dir, KEEP_SCHEMA),
            ):
                dirs = self._delta_dirs(base)
                if not dirs:
                    continue
                folded = (
                    spark.read.schema(schema)
                    .parquet(*dirs)
                    .withColumn(
                        "_maxe",
                        F.max("epoch").over(Window.partitionBy("doc_id")),
                    )
                    .where(
                        (F.col("epoch") == F.col("_maxe")) & (F.col("op") == "a")
                    )
                    .drop("_maxe")
                )
                out = os.path.join(base, f"e{last:06d}_compact_staging")
                folded.write.mode("overwrite").parquet(out)
                # sweep unapplied orphan e-dirs (crashed, never-replayed
                # epochs — already invisible to folds via the applied gate)
                applied = set(self.applied_epochs())
                for d in os.listdir(base):
                    m = _EDIR_RE.match(d)
                    if m and int(m.group(1)) not in applied:
                        shutil.rmtree(os.path.join(base, d))
                # promotion is crash-safe: _recover_compact finishes it
                # from the _SUCCESS-marked staging if we die below
                for d in dirs:
                    shutil.rmtree(d)
                os.replace(out, os.path.join(base, f"e{last:06d}"))
