"""A minimal snapshot-committed lake table (the Iceberg-analogue sink).

No Iceberg/Delta jars ship in this environment, so the engine provides its own
parquet-backed table format with the three properties the north_rule needs —
the same properties Iceberg gives on a real cluster (swap `LakeTable` for
`spark.table(...)` + `MERGE INTO` there; the sink interface is identical):

  1. **Atomic snapshot commit**: a table version is a JSON manifest listing
     one immutable parquet directory per hash bucket. Commit = write data,
     write manifest vN+1, then atomically `os.replace` the CURRENT pointer.
     Readers resolve CURRENT → manifest → file list; they never see a
     half-written snapshot. (Analogue of Iceberg's snapshot commit; replaces
     the reference's Lua-scripted atomic check-and-publish,
     /root/reference/lib/redispub/publisher.go:41-62.)
  2. **Idempotent batch replay**: the manifest records every applied
     foreachBatch ``batch_id``; a replayed batch (restart, HA double-run) is
     recognized and skipped, so the Iceberg-style contract "one commit per
     epoch" holds. (Analogue of the reference's ``processed::<ts>::<txIdx>``
     SETEX dedup keys, publisher.go:315-317.)
  3. **Bucketed copy-on-write MERGE**: rows hash to ``pmod(xxhash64(repo,
     path), n_buckets)``; a merge rewrites ONLY the buckets the batch touches
     (manifest-level partition pruning). Deletes persist as tombstones so a
     late-arriving older event can never resurrect a deleted row; the read
     view filters them.

Single-writer assumption: exactly one streaming query writes a table (true
for Structured Streaming sinks; Iceberg would arbitrate concurrent writers
with optimistic retry — out of scope here and unneeded by the design).

Scale notes: the manifest is O(n_buckets) — thousands of entries, driver-side
JSON, no data-plane cost. At 100 TB you size n_buckets so a bucket's live
data is a few GB (e.g. 8192), keeping copy-on-write rewrite bounded and merge
parallelism high; buckets also make the MERGE join co-partitioned by
construction when the batch is repartitioned by the same function.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions.routing import bucket_for
from ..sources.schemas import TARGET_KEY

_CURRENT = "CURRENT"


#: Memoized (file path -> column -> (min, max) | None) footer stats. Data
#: files are immutable once linked into a manifest (rewrites go to NEW
#: dirs), so the cache never invalidates; it lives for the driver process,
#: entries are a few bytes each.
_FOOTER_STATS_CACHE: dict = {}

#: parquet writers omit or truncate min/max for long binary values; past
#: this length a string max can no longer be trusted as an upper bound.
_STATS_MAX_STR = 4000

#: File-level Bloom index hashing seed (manifest entries record their own
#: seed/bits/k/type, so changing the default never corrupts old entries).
_BLOOM_SEED = 0xB100F

#: Memoized probe positions: (value_repr, type, bits, k, seed) -> tuple of
#: bit positions, or None when the value does not cast to the recorded
#: column type (bloom pruning is then skipped — never a false negative).
_BLOOM_PROBE_CACHE: dict = {}

#: Memoized bloom sidecar contents: (table path, sidecar name) -> dict.
#: Sidecars are immutable once linked (uuid-named, written tmp+replace),
#: so the cache can never serve stale bits.
_BLOOM_SIDECAR_CACHE: dict = {}


def _footer_col_range(path: str, col: str):
    """(min, max) for ``col`` across a parquet file's row groups, from the
    footer only (no data read) — None when stats are absent/unusable."""
    key = (path, col)
    if key in _FOOTER_STATS_CACHE:
        return _FOOTER_STATS_CACHE[key]
    rng = None
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = None
        for i in range(md.num_columns):
            if md.schema.column(i).name == col:
                idx = i
                break
        if idx is not None:
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if (
                ok
                and lo is not None
                and not (
                    isinstance(hi, (str, bytes)) and len(hi) >= _STATS_MAX_STR
                )
            ):
                rng = (lo, hi)
    except Exception:
        rng = None  # unreadable footer: caller keeps the file
    _FOOTER_STATS_CACHE[key] = rng
    return rng


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the snapshot version this writer was about
    to claim (optimistic-concurrency loss — re-read and retry)."""


class SnapshotExpiredError(RuntimeError):
    """A time-travel read (``read(version=...)`` / ``changes(from_version)``)
    named a snapshot whose data directories have been reclaimed by
    ``expire_snapshots`` — the manifest still exists, but the bytes are
    gone. Without this guard the failure would surface lazily as an opaque
    path-not-found from the parquet scan (or, for a changelog consumer,
    mid-catch-up). Raised eagerly at plan time with the retention cause
    named (Iceberg raises the same way for expired snapshot ids)."""


# --- schema evolution helpers (SURVEY.md §7.1 M5) ---------------------------
_WIDENINGS = {
    ("int", "bigint"): "bigint",
    ("bigint", "int"): "bigint",
    ("float", "double"): "double",
    ("double", "float"): "double",
    ("int", "double"): "double",
    ("bigint", "double"): "double",
}


def merge_schemas(current: T.StructType, incoming: T.StructType) -> T.StructType:
    """Iceberg-style additive evolution: new columns append (nullable); common
    columns may widen (int→long, float→double); anything else must match."""
    out = []
    incoming_by_name = {f.name: f for f in incoming.fields}
    for f in current.fields:
        g = incoming_by_name.get(f.name)
        if g is None or g.dataType == f.dataType:
            out.append(f)
            continue
        widened = _WIDENINGS.get((f.dataType.simpleString(), g.dataType.simpleString()))
        if widened is None:
            raise ValueError(
                f"incompatible type change for column {f.name}: "
                f"{f.dataType.simpleString()} -> {g.dataType.simpleString()}"
            )
        out.append(T.StructField(f.name, T._parse_datatype_string(widened), True))
    current_names = {f.name for f in current.fields}
    for g in incoming.fields:
        if g.name not in current_names:
            out.append(T.StructField(g.name, g.dataType, True))
    return T.StructType(out)


def conform_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project df onto schema: missing columns → null, types cast."""
    cols = []
    have = {f.name for f in df.schema.fields}
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


class LakeTable:
    """One upsert target table. See module docstring for the format."""

    def __init__(self, path: str):
        self.path = path
        self._manifest_dir = os.path.join(path, "_manifests")
        self._lineage_dir = os.path.join(path, "_lineage")
        self._refs_dir = os.path.join(path, "_refs")
        # single-slot cache of batch-invariant merge expressions (see
        # _epoch_exprs): (key, dict) — streaming epochs share one batch
        # schema, so the hit rate is every epoch after the first
        self._expr_cache: tuple[tuple, dict] | None = None
        # lineage ordinal: seeded lazily from one listdir, then local
        self._lineage_seq: int | None = None

    # ---------------- creation / metadata ----------------
    @staticmethod
    def create(
        path: str, schema: T.StructType, n_buckets: int = 32
    ) -> "LakeTable":
        t = LakeTable(path)
        os.makedirs(t._manifest_dir, exist_ok=True)
        os.makedirs(t._lineage_dir, exist_ok=True)
        if os.path.exists(os.path.join(t._manifest_dir, _CURRENT)):
            return t  # already exists — idempotent create
        manifest = {
            "version": 0,
            "schema": schema.json(),
            # schema-id bookkeeping (Iceberg analogue: schema-id per data
            # file): buckets written at the CURRENT schema id are read with
            # an explicit schema — no per-epoch mergeSchema footer scan.
            "schema_id": 0,
            "schemas": {"0": schema.json()},
            "bucket_schema_id": {},
            "n_buckets": n_buckets,
            "buckets": {},
            # merge-on-read deltas per bucket: [{dir, seq, sid}] — empty for
            # pure copy-on-write tables (read() then takes the fast path)
            "bucket_deltas": {},
            "applied_batch_ids": [],
            # replay high-watermark per epoch namespace (checkpoint lineage):
            # batch ids are monotonic within a lineage, so id <= watermark ⇒
            # already applied. applied_batch_ids keeps only a recent window
            # (commit cost stays O(1) over the stream's lifetime).
            "applied_watermarks": {},
        }
        t._write_manifest(manifest)
        return t

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, "_manifests", _CURRENT))

    #: a vN+1 manifest younger than this, with CURRENT still at vN, is
    #: presumed to belong to a LIVE writer between its claim and its CURRENT
    #: advance (that window is milliseconds); only older ones are reclaimed
    #: as crash orphans. Class attribute so tests can shrink it.
    ORPHAN_STALENESS_SECS = 60.0

    def _write_manifest(self, manifest: dict) -> None:
        """Optimistic snapshot commit (Iceberg's commit-conflict analogue):
        version vN+1 is claimed by hardlinking a fully-written tmp file into
        place — atomic on POSIX AND never torn (the manifest appears whole or
        not at all), so of two concurrent writers that both read vN exactly
        one wins. The loser distinguishes THREE cases by re-reading CURRENT
        and the existing manifest's age:

          * CURRENT >= vN+1 — a live concurrent writer won and fully
            committed: raise ConcurrentCommitError; the caller re-reads the
            table and retries at the next version.
          * CURRENT still vN, manifest FRESH (< ORPHAN_STALENESS_SECS) — a
            live writer is mid-commit between its claim and its CURRENT
            advance: raise ConcurrentCommitError rather than clobber it
            (reclaiming here would let both writers "succeed" while one
            commit silently vanishes — ADVICE r3).
          * CURRENT still vN, manifest STALE — an ORPHAN from a writer that
            crashed between claiming the manifest and advancing CURRENT (a
            committed-looking file no reader can yet see). ADOPT it: raise
            CURRENT over it (it is complete-on-link, the same premise the
            monotonic repair relies on) and retry this commit at the next
            version — without this, a crash at that point wedges the table
            forever; REPLACING it instead (the pre-round-5 behavior) could
            destroy a manifest a repair or successor had already built on.

        Defense in depth for token races (nothing replaces claims anymore,
        but an external actor still could): every attempt
        embeds a fresh ``writer_token``. IMMEDIATELY before advancing
        CURRENT the token and CURRENT are both re-read — a writer that
        stalled past ORPHAN_STALENESS between claim and advance therefore
        cannot regress CURRENT over a reclaimer's commits (ADVICE r4). After
        the advance the token is re-read once more; a mismatch means a
        reclaimer raced inside that two-syscall window, so CURRENT is
        repaired monotonically (``_repair_current_monotonic``) before the
        loss is raised — the table stays consistent and exactly one attempt
        per version reports success.

        Structured Streaming runs a single writer per table so the conflict
        arms never fire in normal operation — they are the safety net the
        reference gets from Redis' single-threaded Lua."""
        v = manifest["version"]
        token = uuid.uuid4().hex
        manifest = {**manifest, "writer_token": token}
        mpath = os.path.join(self._manifest_dir, f"v{v:08d}.json")
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        if v > 0:
            try:
                os.link(tmp, mpath)
                os.unlink(tmp)
            except FileExistsError:
                if self.current_version() >= v:
                    os.unlink(tmp)
                    raise ConcurrentCommitError(
                        f"version {v} was already committed by another writer "
                        f"({mpath} exists and CURRENT advanced); re-read the "
                        "table and retry"
                    ) from None
                try:
                    age = time.time() - os.path.getmtime(mpath)
                except OSError:
                    # the claimant finished or vanished between our link
                    # failure and the stat — treat as a lost race
                    age = 0.0
                if age < self.ORPHAN_STALENESS_SECS:
                    os.unlink(tmp)
                    raise ConcurrentCommitError(
                        f"version {v} is claimed by a live writer mid-commit "
                        f"({mpath} is {age:.1f}s old, CURRENT not yet "
                        "advanced); retry"
                    ) from None
                # Abandoned orphan (crash between claim and CURRENT advance):
                # ADOPT it, never replace it. A linked manifest is
                # complete-on-link — the exact premise _repair_current_
                # monotonic relies on to expose such manifests — so another
                # writer's repair (or a successor building on it) may
                # already treat the orphan as committed; replacing its file
                # here could destroy a manifest the chain depends on and let
                # this writer report success for a merge that is not in the
                # chain (round-5 review). Raising CURRENT over the orphan
                # unwedges the table identically, and our own retry then
                # recommits this merge on top of the adopted state.
                os.unlink(tmp)
                self._repair_current_monotonic()
                raise ConcurrentCommitError(
                    f"version {v} was an abandoned orphan (complete-on-link); "
                    "adopted it by raising CURRENT — re-read the table and "
                    "retry at the next version"
                ) from None
        else:
            os.replace(tmp, mpath)
        if v > 0:
            # Pre-advance guard (ADVICE r4): a writer stalled past
            # ORPHAN_STALENESS between its claim above and this point may
            # have been reclaimed, and the reclaimer (plus successors) may
            # have committed v and beyond — blindly advancing CURRENT here
            # would move it BACKWARD, hiding fully-committed epochs and
            # exposing them to orphan reclamation. Re-check both sides of
            # the claim immediately before the advance.
            with open(mpath) as f:
                claimed_token = json.load(f).get("writer_token")
            if self.current_version() >= v:
                if claimed_token == token:
                    # our manifest IS the committed one and CURRENT already
                    # covers it (another writer advanced past our claim):
                    # the commit stands — nothing left to do
                    return
                raise ConcurrentCommitError(
                    f"CURRENT is already at or past version {v} with another "
                    "writer's manifest committed; advancing would regress it "
                    "— re-read the table and retry"
                )
            if claimed_token != token:
                raise ConcurrentCommitError(
                    f"lost the claim on version {v} before advancing CURRENT "
                    "(reclaimed as a stale orphan by another writer); "
                    "re-read the table and retry"
                )
        cur_tmp = os.path.join(self._manifest_dir, f".current-{uuid.uuid4().hex}")
        with open(cur_tmp, "w") as f:
            f.write(str(v))
        # the readers' atomic visibility point:
        os.replace(cur_tmp, os.path.join(self._manifest_dir, _CURRENT))
        if v > 0:
            with open(mpath) as f:
                committed_token = json.load(f).get("writer_token")
            if committed_token != token:
                # a reclaimer raced inside the (now two-syscall) window
                # between the guard above and our os.replace — our advance
                # may have regressed CURRENT over its commit(s); restore
                # monotonicity before reporting the loss (ADVICE r4)
                self._repair_current_monotonic()
                raise ConcurrentCommitError(
                    f"lost the claim on version {v} after advancing CURRENT "
                    "(another writer's token is in the committed manifest); "
                    "its commit stands — re-read the table and retry"
                )

    def _repair_current_monotonic(self) -> None:
        """Raise CURRENT to the highest linked manifest version if it fell
        behind. Sound because a manifest can only be claimed at version w
        when CURRENT had already reached w-1 (so every version < w is fully
        committed), and a linked manifest is complete-on-link (data files
        are written before the claim) — making it visible early is safe; its
        writer's own advance then lands in the already-covered arm above.
        Only ever raises CURRENT, never lowers it."""
        versions = [
            int(n[1:-5])
            for n in os.listdir(self._manifest_dir)
            if n.startswith("v") and n.endswith(".json")
        ]
        h = max(versions, default=0)
        if self.current_version() >= h:
            return
        cur_tmp = os.path.join(self._manifest_dir, f".current-{uuid.uuid4().hex}")
        with open(cur_tmp, "w") as f:
            f.write(str(h))
        os.replace(cur_tmp, os.path.join(self._manifest_dir, _CURRENT))

    def current_version(self) -> int:
        with open(os.path.join(self._manifest_dir, _CURRENT)) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        try:
            with open(
                os.path.join(self._manifest_dir, f"v{v:08d}.json")
            ) as f:
                return json.load(f)
        except FileNotFoundError:
            # commits are contiguous, so a missing manifest BELOW the
            # current version can only mean expire_snapshots(
            # expire_metadata=True) reclaimed it — name the cause, same
            # posture as the expired-data-dir check in read()
            if version is not None and 0 <= v < self.current_version():
                raise SnapshotExpiredError(
                    f"snapshot v{v} of {self.path}: manifest expired "
                    "(reclaimed by expire_snapshots(expire_metadata=True));"
                    " only retained snapshots are readable"
                ) from None
            raise

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.manifest()["schema"]))

    #: optimistic-commit retry budget per epoch (Iceberg's
    #: commit.retry.num-retries analogue). Each loss requires another
    #: writer's full committed epoch, so a single straggler needs 1-2
    #: retries — but an HA DOUBLE-RUN (two live streams draining the same
    #: log, HA_test.go:12-41) can lose once per concurrent epoch of the
    #: other writer; the budget covers that with the jittered backoff below
    #: breaking commit lockstep.
    COMMIT_RETRIES = 10

    #: adaptive pruning threshold: when the manifest's last TWO affected-
    #: fraction measurements are both at least this, merge_batch(prune=True)
    #: skips the per-epoch bucket-discovery job (driver-serial 2-stage job +
    #: collect) and takes the dense posture; pruned epochs re-measure the
    #: fraction exactly, dense ones estimate it balls-into-bins, so the
    #: policy is self-correcting in both directions (VERDICT r4 #2)
    ADAPTIVE_DENSE_FRAC = 0.6

    #: adaptive-dense is only worth the risk on SMALL tables: the discovery
    #: job's ~0.3-0.5 s serial cost matters when epochs are fast (a few tens
    #: of buckets), while a mispredicted dense epoch costs an O(live buckets)
    #: CoW rewrite — catastrophic at thousands of buckets, noise at 32. Above
    #: this bucket count the engine always runs discovery.
    ADAPTIVE_DENSE_MAX_BUCKETS = 64

    #: recent epoch keys kept verbatim in the manifest; older epochs are
    #: covered by the per-namespace high-watermark (ADVICE: manifest size and
    #: commit cost must not grow O(total batches) on a long-lived stream)
    _REPLAY_WINDOW = 64

    def applied_batch_ids(self) -> set:
        """Epoch keys in the recent replay window (older applied epochs are
        summarized by ``applied_watermarks``; use :meth:`epoch_applied`)."""
        return set(self.manifest()["applied_batch_ids"])

    def epoch_applied(self, epoch_ns: str, batch_id: int) -> bool:
        m = self.manifest()
        if f"{epoch_ns}:{batch_id}" in set(m["applied_batch_ids"]):
            return True
        # the watermark shortcut (id <= wm ⇒ applied) is only sound when
        # batch ids commit in monotonic order, which holds for streaming
        # checkpoint lineages (non-empty epoch_ns) but NOT for ad-hoc
        # batch-mode callers of merge_batch (epoch_ns="") that may apply
        # out of order — those get exact-set semantics only
        if not epoch_ns:
            return False
        wm = m.get("applied_watermarks", {}).get(epoch_ns)
        return wm is not None and batch_id <= wm

    # ---------------- read ----------------
    def history(self) -> list[dict]:
        """Snapshot history (Iceberg's snapshots metadata-table analogue):
        one record per retained manifest version."""
        out = []
        for name in sorted(os.listdir(self._manifest_dir)):
            if name.startswith("v") and name.endswith(".json"):
                m = self.manifest(int(name[1:-5]))
                out.append(
                    {
                        "version": m["version"],
                        "n_buckets_live": len(m["buckets"]),
                        "applied_watermarks": m.get("applied_watermarks", {}),
                    }
                )
        return out

    def read(
        self,
        spark: SparkSession,
        include_deleted: bool = False,
        buckets: list[int] | None = None,
        version: int | None = None,
        tag: str | None = None,
        _file_filter=None,
    ) -> DataFrame:
        """Read the table state. ``version`` time-travels to an older
        snapshot (Iceberg's VERSION AS OF analogue) — valid while that
        snapshot's data dirs are retained (see expire_snapshots);
        ``tag`` time-travels by name (a tag PINS its snapshot's dirs
        through expiry, so tag reads stay valid until the tag is dropped).

        With merge-on-read deltas present (merge_batch(merge_mode="mor")),
        the read unions base rows with every live delta and re-runs the LWW
        collapse — newest (last_ts, last_tx_idx) wins; base rows win exact
        ties (a replayed event must not look like a change); between deltas
        the OLDEST epoch wins an exact tie (first apply stands, replay is a
        no-op). Pure-CoW tables take the untouched zero-extra-cost path.

        ``_file_filter`` (internal, see read_pruned) maps (bucket, base
        dir) -> kept parquet file paths, None = whole dir, [] = bucket
        skipped. It is consulted ONLY for buckets with no live deltas: a
        delta can carry a row OLDER than the base row for the same key (MoR
        merges never read the target, so a redelivered stale event lands in
        a later delta), and the read-time LWW collapse needs the base row
        present to outvote it — pruning base files under live deltas could
        resurrect superseded rows."""
        if tag is not None:
            if version is not None:
                raise ValueError("pass either version= or tag=, not both")
            version = self.resolve_ref(tag)
        m = self.manifest(version)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        sel = dict(m["buckets"])
        dsel = m.get("bucket_deltas", {})
        if buckets is not None:
            keep = set(buckets)
            sel = {b: d for b, d in sel.items() if int(b) in keep}
            dsel = {b: ds for b, ds in dsel.items() if int(b) in keep}
        dirs = [os.path.join(self.path, d) for d in sel.values()]
        if version is not None:
            # time travel only (never the hot path): fail loud NOW if the
            # named snapshot's bytes were reclaimed by expire_snapshots,
            # instead of an opaque lazy path-not-found at action time
            ddirs = [
                os.path.join(self.path, e["dir"])
                for entries in dsel.values()
                for e in entries
            ]
            missing = [d for d in (*dirs, *ddirs) if not os.path.isdir(d)]
            if missing:
                raise SnapshotExpiredError(
                    f"snapshot v{version} of {self.path} references "
                    f"{len(missing)} expired data dir(s) (first: "
                    f"{os.path.relpath(missing[0], self.path)}) — reclaimed "
                    "by expire_snapshots; only retained snapshots are "
                    "readable"
                )
        # per-bucket path lists: normally the bucket dir; under a file
        # filter, the kept files of delta-free buckets (a fully-pruned
        # bucket leaves the read entirely)
        paths = {b: [os.path.join(self.path, d)] for b, d in sel.items()}
        if _file_filter is not None:
            for b, d in list(sel.items()):
                if dsel.get(b):
                    continue  # live deltas: full base required (docstring)
                kept = _file_filter(b, os.path.join(self.path, d))
                if kept is None:
                    continue
                if kept:
                    paths[b] = list(kept)
                else:
                    del paths[b]
                    del sel[b]
        cur_sid = m.get("schema_id", object())
        if not paths:
            df = spark.createDataFrame([], schema)
        elif all(
            m.get("bucket_schema_id", {}).get(b) == cur_sid for b in sel
        ):
            # fast path: every selected bucket was written at the current
            # schema id — read with the explicit schema (no driver-side
            # mergeSchema footer scan, measured 0.25-0.8 s per epoch)
            df = spark.read.schema(schema).parquet(
                *[p for ps in paths.values() for p in ps]
            )
        else:
            # buckets written at older schema ids → per-sid conformed reads
            df = self._read_conformed(
                spark,
                m,
                schema,
                [
                    (m.get("bucket_schema_id", {}).get(b), p)
                    for b, ps in paths.items()
                    for p in ps
                ],
            )
        if dsel:
            df = self._merge_deltas_on_read(spark, df, dsel, schema, cur_sid, m)
        if not include_deleted:
            df = df.where(~F.col("deleted"))
        return df

    def prune_plan(
        self,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
        eq=None,
        spark: SparkSession | None = None,
    ) -> dict:
        """File-skipping plan for ``lo <= col <= hi`` from parquet FOOTER
        min/max stats (Iceberg's manifest column-stats pruning posture —
        here the stats live in the immutable data files and are memoized
        driver-side, so the hot write path pays nothing; a cluster-scale
        variant would persist them into the manifest at commit).

        Sound because (a) every base file is written by a merge/compact/
        rewrite, whose LWW collapse leaves at most ONE row per key in the
        base — skipping a file can only remove FINAL rows whose stat value
        is provably outside the range, never an older version whose newer
        row survives elsewhere; (b) buckets with live MoR deltas are left
        whole (see read); (c) the exact predicate is re-applied on read.
        Files lacking stats for ``col`` (or with truncation-length string
        values, where footer max may not be an upper bound) are kept.

        ``eq`` plans an EQUALITY lookup instead (mutually exclusive with
        lo/hi): min/max stats are consulted with lo = hi = eq, and — when
        ``spark`` is given and the manifest carries file Blooms for ``col``
        (written by ``rewrite_clustered(bloom_cols=...)``) — a file is
        additionally skipped when any probe bit position is unset in its
        bitmap. Blooms have no false negatives; a false positive only keeps
        a file; files without an entry are kept.

        Returns {"kept": {bucket: [files] | None}, "files_total",
        "files_kept", "files_skipped", "buckets_dropped"} — ``None`` marks
        a bucket read whole (live deltas)."""
        if eq is not None:
            if lo is not None or hi is not None:
                raise ValueError("eq is mutually exclusive with lo/hi")
            lo = hi = eq
        m = self.manifest(version)
        dsel = m.get("bucket_deltas", {})
        manifest_stats = m.get("file_stats", {})
        blooms = self._load_blooms(m) if eq is not None else {}
        kept: dict = {}
        total = n_kept = 0
        dropped = []
        for b, d in m["buckets"].items():
            bdir = os.path.join(self.path, d)
            if dsel.get(b):
                kept[b] = None
                continue
            files = sorted(
                f for f in os.listdir(bdir) if f.endswith(".parquet")
            )
            total += len(files)
            sel = []
            for f in files:
                p = os.path.join(bdir, f)
                # manifest stats first (zero-IO planning, written by
                # rewrite_clustered); footer fallback otherwise
                ms = manifest_stats.get(f"{d}/{f}", {}).get(col)
                rng = tuple(ms) if ms else _footer_col_range(p, col)
                if rng is not None:
                    fmin, fmax = rng
                    try:
                        if (lo is not None and fmax < lo) or (
                            hi is not None and fmin > hi
                        ):
                            continue  # provably outside the range: skip
                    except TypeError:
                        pass  # probe incomparable with stats: keep the file
                if eq is not None and spark is not None:
                    ent = blooms.get(f"{d}/{f}", {}).get(col)
                    if ent is not None:
                        pos = self._bloom_probe_positions(spark, eq, ent)
                        if pos is not None and any(
                            (ent["w"][pp // 64] >> (pp % 64)) & 1 == 0
                            for pp in pos
                        ):
                            continue  # provably absent: skip
                sel.append(p)
            n_kept += len(sel)
            kept[b] = sel
            if not sel:
                dropped.append(int(b))
        return {
            "kept": kept,
            "files_total": total,
            "files_kept": n_kept,
            "files_skipped": total - n_kept,
            "buckets_dropped": sorted(dropped),
        }

    def read_pruned(
        self,
        spark: SparkSession,
        col: str,
        lo=None,
        hi=None,
        include_deleted: bool = False,
        version: int | None = None,
        eq=None,
    ) -> DataFrame:
        """read() restricted to ``lo <= col <= hi`` (or ``col = eq``) with
        footer-stats — and, for ``eq`` on bloom-indexed columns, per-file
        Bloom — file skipping (see prune_plan): the payoff of
        rewrite_clustered's layout. The exact predicate is applied
        post-collapse, so the result equals ``read().where(...)``
        bit-for-bit; the skipping only changes how many files the scan
        touches."""
        if lo is None and hi is None and eq is None:
            raise ValueError("read_pruned needs lo and/or hi, or eq")
        plan = self.prune_plan(col, lo, hi, version, eq=eq, spark=spark)
        df = self.read(
            spark,
            include_deleted=include_deleted,
            version=version,
            _file_filter=lambda b, d: plan["kept"].get(b),
        )
        c = F.col(col)
        if eq is not None:
            return df.where(c == F.lit(eq))
        if lo is not None:
            df = df.where(c >= F.lit(lo))
        if hi is not None:
            df = df.where(c <= F.lit(hi))
        return df

    def _read_conformed(
        self,
        spark: SparkSession,
        m: dict,
        schema: T.StructType,
        sid_dirs: list,
    ) -> DataFrame:
        """Read a mixed-schema-id set of parquet dirs, every row conformed
        to ``schema``. Grouped by RECORDED schema id; each group is read
        with its registered schema and cast-conformed. This is what makes
        type-WIDENING evolution readable: parquet mergeSchema cannot
        reconcile an int32-file/int64-file column (StructType.merge throws
        'incompatible data types'), so a widened table would otherwise
        wedge every read — and compaction, which reads first — once old
        and new buckets coexist. Dirs with no recorded sid (pre-tracking
        snapshots) keep the legacy mergeSchema path: they can only differ
        additively."""
        groups: dict = {}
        for sid, d in sid_dirs:
            groups.setdefault(sid, []).append(d)
        schemas = m.get("schemas", {"0": m["schema"]})
        parts = []
        unknown = groups.pop(None, [])
        for sid, ds in groups.items():
            sj = schemas.get(str(sid))
            if sj is None:
                unknown += ds
                continue
            s = T.StructType.fromJson(json.loads(sj))
            parts.append(
                conform_to_schema(spark.read.schema(s).parquet(*ds), schema)
            )
        if unknown:
            parts.append(
                conform_to_schema(
                    spark.read.option("mergeSchema", "true").parquet(*unknown),
                    schema,
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _merge_deltas_on_read(
        self,
        spark: SparkSession,
        base: DataFrame,
        dsel: dict,
        schema: T.StructType,
        cur_sid,
        m: dict,
    ) -> DataFrame:
        """Merge-on-read: base ∪ deltas → one LWW max_by collapse per key.
        ALL live deltas are ONE scan regardless of epoch count — the delta's
        epoch seq is recovered from its directory name
        (``delta/v{seq:08d}-…``) via the file-metadata column, so a stream
        that ran many epochs between compactions costs one multi-dir scan,
        not one scan per epoch. The collapse is the same single wide shuffle
        the CoW merge runs at write time — MoR just moves it to read time.
        On a bucketed layout both sides are co-partitioned by construction,
        so a real cluster's storage-partitioned join/agg keeps this
        shuffle-free."""
        sid_dirs: list = []
        sids: set = set()
        for entries in dsel.values():
            for e in entries:
                sid_dirs.append((e.get("sid"), os.path.join(self.path, e["dir"])))
                sids.add(e.get("sid"))
        # anchored to the table-relative suffix (delta-dir/pb=N/file at the
        # END of the path): a table path that itself contains a
        # "delta/vNNNNNNNN-" substring can no longer alias every delta to the
        # same seq (ADVICE r4 — first-match regexp was unanchored)
        seq_expr = F.regexp_extract(
            F.col("_metadata.file_path"),
            r"delta/v(\d{8})-[0-9a-f]+/pb=\d+/[^/]+$",
            1,
        ).cast("long")
        if sids == {cur_sid}:
            d = spark.read.schema(schema).parquet(
                *[p for _, p in sid_dirs]
            ).withColumn("_seq", seq_expr)
        else:
            # mixed schema ids: per-sid conformed reads, like
            # _read_conformed — but _seq must be captured PER SCAN
            # (file-metadata columns do not resolve across a union)
            target = T.StructType(
                list(schema.fields) + [T.StructField("_seq", T.LongType(), True)]
            )
            schemas_reg = m.get("schemas", {"0": m["schema"]})
            groups: dict = {}
            for sid, p in sid_dirs:
                groups.setdefault(sid, []).append(p)
            parts = []
            for sid, ds in groups.items():
                sj = schemas_reg.get(str(sid)) if sid is not None else None
                if sj is not None:
                    raw = spark.read.schema(
                        T.StructType.fromJson(json.loads(sj))
                    ).parquet(*ds)
                else:
                    raw = spark.read.option("mergeSchema", "true").parquet(*ds)
                parts.append(
                    conform_to_schema(raw.withColumn("_seq", seq_expr), target)
                )
            d = parts[0]
            for p in parts[1:]:
                d = d.unionByName(p)
        u = base.withColumn("_seq", F.lit(-1).cast("long")).unionByName(d)
        key = ["repo", "path"]
        data_cols = [f.name for f in schema.fields if f.name not in key]
        order = F.struct(
            F.col("last_ts"),
            F.col("last_tx_idx"),
            (F.col("_seq") < 0).cast("int"),  # base wins exact ties
            -F.col("_seq"),                   # then the OLDEST delta epoch
        )
        collapsed = u.groupBy(*key).agg(
            F.max_by(F.struct(*[F.col(c) for c in data_cols]), order).alias("_w")
        )
        out = collapsed.select(
            *key, *[F.col(f"_w.{c}").alias(c) for c in data_cols]
        )
        return out.select(*[f.name for f in schema.fields])

    # ---------------- changelog scan (CDC feed OUT of the table) --------
    def changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """NET row-level changes between two snapshots — the lake-side
        changelog feed (Delta CDF `table_changes` / Iceberg
        `create_changelog_view` with net_changes=true analogue; the
        reference's downstream-facing counterpart is the per-op Redis
        publication stream, lib/redispub/publisher.go:41-62 — this is the
        same "what changed" contract served from the table itself, so a
        downstream consumer can follow the lake without re-reading it).

        Returns the ``to_version`` schema plus:
          * ``_change_type`` — 'insert' | 'delete' | 'update_preimage' |
            'update_postimage' (updates emit BOTH rows, Delta CDF shape)
          * ``_commit_version`` — the ``to_version`` snapshot id

        NET semantics: a key is classified by its LIVE state at the two
        snapshots only — inserted-then-deleted within the window emits
        nothing, a key whose winning row is byte-identical emits nothing,
        and a tombstone that stays a tombstone emits nothing (per-epoch
        granularity is the streaming runner's job; this is the batch
        catch-up feed).

        Scale: the two snapshots are diffed ONLY on buckets whose manifest
        entries changed between the versions (data dir moved, or the
        merge-on-read delta list differs) — an epoch that touched 3 of
        4096 buckets costs a 3-bucket read, not O(table). The classify
        join is an equality join on the bucketed key, so a
        storage-partitioned layout keeps it shuffle-free. Validity follows
        time travel: ``from_version``'s data dirs must still be retained
        (see ``expire_snapshots``).
        """
        import functools

        if to_version is None:
            to_version = self.current_version()
        if from_version > to_version:
            raise ValueError(
                f"from_version {from_version} > to_version {to_version}"
            )
        m_from = self.manifest(from_version)
        m_to = self.manifest(to_version)
        schema = T.StructType.fromJson(json.loads(m_to["schema"]))
        key = list(TARGET_KEY)
        data_cols = [f.name for f in schema.fields if f.name not in key]
        out_fields = [*schema.fields,
                      T.StructField("_change_type", T.StringType(), False),
                      T.StructField("_commit_version", T.LongType(), False)]

        # manifest-diff bucket pruning: a bucket can only contribute
        # changes if its data dir or its delta list differs
        fb, tb = m_from["buckets"], m_to["buckets"]
        fd = m_from.get("bucket_deltas", {})
        td = m_to.get("bucket_deltas", {})
        changed = sorted(
            int(b)
            for b in set(fb) | set(tb) | set(fd) | set(td)
            if fb.get(b) != tb.get(b) or (fd.get(b) or []) != (td.get(b) or [])
        )
        if from_version == to_version or not changed:
            return spark.createDataFrame([], T.StructType(out_fields))

        old = conform_to_schema(
            self.read(
                spark, include_deleted=True, buckets=changed,
                version=from_version,
            ),
            schema,
        )
        new = self.read(
            spark, include_deleted=True, buckets=changed, version=to_version
        )
        pack = F.struct(*[F.col(c) for c in data_cols])
        j = old.select(*key, pack.alias("_o")).join(
            new.select(*key, pack.alias("_n")), key, "full_outer"
        )
        o_live = F.col("_o").isNotNull() & ~F.col("_o.deleted")
        n_live = F.col("_n").isNotNull() & ~F.col("_n.deleted")
        same = functools.reduce(
            lambda a, b: a & b,
            [F.col(f"_o.{c}").eqNullSafe(F.col(f"_n.{c}")) for c in data_cols],
        )
        typed = j.withColumn(
            "_ct",
            F.when(~o_live & n_live, F.lit("insert"))
            .when(o_live & ~n_live, F.lit("delete"))
            .when(o_live & n_live & ~same, F.lit("update")),
        ).where(F.col("_ct").isNotNull())
        # both emissions in ONE pass: a union of a pre-branch and a
        # post-branch would execute the full-outer diff join twice; instead
        # each diffed key explodes into its 1-2 changelog rows map-side
        arr = F.array_compact(
            F.array(
                F.when(
                    F.col("_ct") != "insert",
                    F.struct(
                        F.when(F.col("_ct") == "delete", F.lit("delete"))
                        .otherwise(F.lit("update_preimage"))
                        .alias("t"),
                        F.col("_o").alias("img"),
                    ),
                ),
                F.when(
                    F.col("_ct") != "delete",
                    F.struct(
                        F.when(F.col("_ct") == "insert", F.lit("insert"))
                        .otherwise(F.lit("update_postimage"))
                        .alias("t"),
                        F.col("_n").alias("img"),
                    ),
                ),
            )
        )
        return (
            typed.select(*key, F.explode(arr).alias("_e"))
            .select(
                *key,
                *[F.col(f"_e.img.{c}").alias(c) for c in data_cols],
                F.col("_e.t").alias("_change_type"),
            )
            .withColumn("_commit_version", F.lit(to_version).cast("long"))
        )

    # ---------------- merge (the MERGE INTO analogue) ----------------
    def merge_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        extra_payload_cols: tuple[str, ...] = (),
        epoch_ns: str = "",
        n_salts: int = 0,
        prune: bool = True,
        merge_mode: str = "cow",
    ) -> dict:
        """Idempotent LWW upsert of a change batch.

        ``batch``: event rows (repo, path, ts, tx_idx, op, commit, lang,
        content, [extra...]) — NOT yet collapsed; collapse happens here so the
        merge owns its correctness.

        MERGE semantics (the predicate the north_star specifies):
          WHEN MATCHED AND src.(ts,tx_idx) > tgt.(last_ts,last_tx_idx)
            THEN UPDATE (or mark tombstone if op='d')
          WHEN NOT MATCHED THEN INSERT
        expressed as a full-outer join per key, which on a bucketed Iceberg
        table is exactly what MERGE INTO plans.

        ``n_salts``: 0/1 = single-phase max_by — its map-side partial
        aggregation already bounds a hot key's reducer fan-in to one partial
        row per map task, which holds at any executor count. >1 enables the
        two-phase salted reduce for merges whose combine step is NOT
        algebraic (e.g. diff folding), where partial agg can't pre-collapse.

        ``prune``: True (default, the 100 TB posture) runs a column-pruned
        discovery job so only affected buckets are read and rewritten.
        False = single-job dense mode for tables whose batches touch ~every
        bucket anyway (small bucket counts / uniform keys): skips the
        discovery job (one less serial driver round-trip per epoch), reads
        the whole table, and derives the affected set from the written
        partition dirs — valid because a touched bucket always has ≥1
        output row (tombstones persist; rows never vanish in a merge).

        ``merge_mode``: "cow" (default) rewrites every affected bucket —
        read-optimized, but a HIGH-DISPERSION batch (random keys across all
        buckets) rewrites the whole table per epoch. "mor" (merge-on-read,
        the SCALE.md §1/§5 escape hatch) writes ONLY the batch's collapsed
        per-key winners as a bucket-partitioned DELTA — no target read, no
        bucket rewrite, write amplification ~1 — and defers the merge to
        read time: read() unions base + deltas and re-runs the same LWW
        max_by collapse (a tombstone delta row is the equality-delete — it
        outranks and thereby suppresses older base rows). compact() folds
        deltas back into the base. Iceberg v2 analogue: data files +
        equality-delete files with write.merge.mode=merge-on-read
        (IcebergSinkPlanner emits the matching DDL). Trade-offs are the
        standard ones: reads pay one extra shuffle until compaction, and
        matched/not-matched accounting is unknowable without the target
        read, so ``dedup_hits`` is reported as 0 and ``applied`` counts
        delta rows (final-state correctness is unchanged — pinned against
        CoW in tests/test_lake_mor.py).
        """
        # Epoch identity = (stream namespace, batch id): Spark batch ids are
        # only unique within one checkpoint lineage. A replay of the SAME
        # epoch (foreachBatch re-invocation after restart) is skipped here;
        # a DIFFERENT stream (e.g. lost checkpoint ⇒ full re-read) flows
        # through the MERGE, where LWW + identity dedup make the effects
        # exactly-once anyway (reference HA semantics, HA_test.go:12-41).
        epoch_key = f"{epoch_ns}:{batch_id}"
        # Optimistic-concurrency retry (Iceberg commit-retry analogue,
        # HA_test.go:12-41): losing a snapshot claim re-reads the table and
        # re-applies against the winner's state — final state is the serial
        # application of both batches. Bounded: a loss requires another
        # writer's progress, so livelock needs an adversarial writer.
        import random

        last_err: Exception | None = None
        for attempt in range(self.COMMIT_RETRIES):
            if attempt and last_err is not None:
                # jittered exponential backoff (Iceberg commit.retry.*-wait-ms
                # analogue): two live writers otherwise re-apply in lockstep
                # and the same one can lose every round
                time.sleep(
                    min(0.05 * (2 ** (attempt - 1)), 2.0) * random.uniform(0.5, 1.5)
                )
            if self.epoch_applied(epoch_ns, batch_id):
                self._append_lineage(
                    epoch_key,
                    {"batch_id": batch_id, "skipped_replay": True, "wall_secs": 0.0},
                )
                return {"skipped_replay": True}
            # the batch feeds two jobs: affected-bucket discovery (column-
            # pruned to repo/path — cheap) and the merge write. Caching the
            # batch was measured SLOWER than the second scan (full-row
            # materialization costs more than a pruned re-read) and would be
            # memory-hostile for large micro-batches on a real cluster.
            try:
                return self._apply_epoch(
                    batch, batch_id, epoch_key, epoch_ns, extra_payload_cols,
                    n_salts, prune, merge_mode,
                )
            except ConcurrentCommitError as e:
                last_err = e
                continue
        raise last_err

    def _epoch_exprs(
        self, batch: DataFrame, m: dict, extra_payload_cols: tuple[str, ...]
    ) -> dict:
        """Batch-invariant merge plan fragments, cached per (batch schema,
        table schema, payload, bucket count).

        Unresolved Column trees are immutable and not bound to any plan, so
        they can be built once and attached to every epoch's DataFrames.
        Rebuilding them per epoch cost ~550 py4j round-trips (~0.5-0.7 s)
        of driver-serial time per micro-batch — the dominant term of the
        streaming Amdahl serial fraction after the O(1) manifest commit.
        The ONE schema analysis probe (for schema evolution) also moves
        here, so steady-state epochs trigger no analysis round-trip at all.
        """
        batch_schema_json = batch.schema.json()
        key_t = (
            batch_schema_json,
            m["schema"],
            tuple(extra_payload_cols),
            m["n_buckets"],
        )
        if self._expr_cache is not None and self._expr_cache[0] == key_t:
            return self._expr_cache[1]

        from ..functions.histograms import hist_bucket_col_sql, hist_observe_aggs_on

        n_buckets = m["n_buckets"]
        current_schema = T.StructType.fromJson(json.loads(m["schema"]))
        batch_schema = T.StructType.fromJson(json.loads(batch_schema_json))
        payload = ["commit", "lang", "content", *extra_payload_cols]
        # unprocessable envelopes (reference metric lib/oplog/tail.go:109-114;
        # fail-loud rule SURVEY §7.3): rows missing the identity the merge
        # keys on can neither order nor route — they are COUNTED on the
        # batch's observe pass and quarantined to the _deadletter side
        # output before the commit, never silently dropped
        dl_reason = (
            F.when(F.col("repo").isNull(), F.lit("null_repo"))
            .when(F.col("path").isNull(), F.lit("null_path"))
            .when(F.col("ts").isNull(), F.lit("null_ts"))
            .when(F.col("tx_idx").isNull(), F.lit("null_tx_idx"))
            .when(F.col("op").isNull(), F.lit("null_op"))
        )
        in_aggs = [
            F.count(F.lit(1)).alias("events_in"),
            F.sum((F.col("op") == "d").cast("long")).alias("deletes_in"),
            F.sum(dl_reason.isNotNull().cast("long")).alias("unprocessable_in"),
        ]
        if any(f.name == "wall" for f in batch_schema.fields):
            in_aggs.append(F.max(F.col("wall")).alias("max_wall"))
        src_cols = [
            F.col("repo"),
            F.col("path"),
            *[F.col(c) for c in payload],
            F.lit(None).cast("string").alias("content_sha256"),
            F.col("ts").alias("last_ts"),
            F.col("tx_idx").cast("int").alias("last_tx_idx"),
            (F.col("op") == F.lit("d")).alias("deleted"),
            bucket_for(F.col("repo"), F.col("path"), n_buckets).alias("bucket"),
        ]
        # entry-size histogram fragments (reference
        # prometheus.ExponentialBuckets(8,2,29), lib/oplog/tail.go:71-137):
        # bucket CASE materialized once per row, aggregates are equality-sums
        hist_bucket = F.expr(hist_bucket_col_sql("octet_length(content)"))
        hist_aggs = hist_observe_aggs_on("_esz_le", "esz")

        # schema evolution: ONE analysis probe of the source shape
        src_schema = batch.select(*src_cols).schema
        new_schema = merge_schemas(current_schema, src_schema)
        conform_cols = None
        if new_schema.json() != src_schema.json():
            have = {f.name for f in src_schema.fields}
            conform_cols = [
                (
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    if f.name in have
                    else F.lit(None).cast(f.dataType).alias(f.name)
                )
                for f in new_schema.fields
            ]

        key = ["repo", "path"]
        data_cols = [f.name for f in new_schema.fields if f.name not in key]
        order = F.struct(
            F.col("last_ts"), F.col("last_tx_idx"), F.col("_is_tgt").cast("int")
        )
        pay = F.struct(*[F.col(c) for c in data_cols], F.col("_is_tgt"))
        win_applied = ~F.col("_w._is_tgt")
        cx = {
            "new_schema": new_schema,
            "dl_reason": dl_reason,
            "in_aggs": in_aggs,
            "src_cols": src_cols,
            "hist_bucket": hist_bucket,
            "hist_aggs": hist_aggs,
            "conform_cols": conform_cols,
            "order": order,
            "pay": pay,
            "collapse_aggs": [
                F.max_by(pay, order).alias("_w"),
                F.max((~F.col("_is_tgt")).cast("int")).alias("_had_src"),
            ],
            "merged_cols": [
                *key,
                *[
                    (
                        # winner sha256 computed once per surviving row;
                        # target winners keep their stored hash
                        F.coalesce(
                            F.col("_w.content_sha256"),
                            F.sha2(F.col("_w.content"), 256),
                        ).alias(c)
                        if c == "content_sha256"
                        else F.col(f"_w.{c}").alias(c)
                    )
                    for c in data_cols
                ],
                win_applied.alias("_applied"),
                (F.col("_w._is_tgt") & (F.col("_had_src") == 1)).alias("_dedup_hit"),
            ],
            "merge_aggs": [
                F.count(F.lit(1)).alias("rows_out"),
                F.sum(F.col("_applied").cast("long")).alias("applied"),
                F.sum(F.col("_dedup_hit").cast("long")).alias("dedup_hits"),
                F.sum((F.col("_applied") & F.col("deleted")).cast("long")).alias(
                    "deletes"
                ),
            ],
            "bucket_b": bucket_for(F.col("repo"), F.col("path"), n_buckets).alias(
                "b"
            ),
        }
        self._expr_cache = (key_t, cx)
        return cx

    def _apply_epoch(
        self,
        batch: DataFrame,
        batch_id: int,
        epoch_key: str,
        epoch_ns: str,
        extra_payload_cols: tuple[str, ...],
        n_salts: int,
        prune: bool = True,
        merge_mode: str = "cow",
    ) -> dict:
        t0 = time.time()
        spark = batch.sparkSession
        m = self.manifest()
        n_buckets = m["n_buckets"]

        # Batch-invariant plan fragments come from a single-slot cache: a
        # streaming epoch's driver-serial cost was ~55% py4j expression
        # construction (~550 round-trips/epoch rebuilding identical Column
        # trees — measured ~0.5-0.7 s/epoch), which is an Amdahl term wall
        # clock can't parallelize away. Unresolved Column trees are immutable
        # and plan-independent, so they are built once per (batch schema,
        # table schema) and reused every epoch.
        cx = self._epoch_exprs(batch, m, extra_payload_cols)
        new_schema: T.StructType = cx["new_schema"]

        from pyspark.sql import Observation as _Obs

        from ..functions.histograms import hist_from_observed, observed_row
        from ..operators.deadletter import split_dead_letters

        # input-side metrics ride the batch's own pass (M1 analogues:
        # received-by-op counters + read-side staleness gauge,
        # lib/oplog/tail.go:71-137, lib/redispub/publisher.go:101-114)
        in_obs = _Obs(f"in_{batch_id}")
        batch = batch.observe(in_obs, *cx["in_aggs"])
        batch_ok, batch_dead = split_dead_letters(batch, cx["dl_reason"])
        # events mapped straight to the target row shape (sha256 is computed
        # AFTER winner selection — never for losing duplicates); then the
        # entry-size histogram rides the merge-write scan only (NOT the
        # shared batch root, which must stay column-prunable for the
        # affected-bucket discovery scan), over a bucket column materialized
        # once per row and dropped before schema evolution
        hist_obs = _Obs(f"esz_{batch_id}")
        src = (
            batch_ok.select(*cx["src_cols"])
            .withColumn("_esz_le", cx["hist_bucket"])
            .observe(hist_obs, *cx["hist_aggs"])
            .drop("_esz_le")
        )

        # ---- schema evolution (added columns / widening) ----
        if cx["conform_cols"] is not None:
            src = src.select(*cx["conform_cols"])

        # ---- manifest-level partition pruning: touch only affected buckets.
        # Derived from the RAW batch (cheap scan), not from src: every key's
        # winner lives in the same bucket as its events, and computing it
        # from src would run the whole LWW collapse once for this collect
        # and again for the write (measured 2x batch cost).
        t_plan = time.time()
        adaptive_dense = False
        empty_table_dense = False
        if merge_mode == "mor":
            # merge-on-read: NO target read, NO discovery job — the batch's
            # collapsed winners append as a delta; the affected set is
            # derived from the written partition dirs (as in dense mode)
            affected = None
            tgt = None
            t_affected = t_tgt = time.time()
        elif prune:
            # ADAPTIVE pruning (VERDICT r4 #2): the discovery job is a
            # per-epoch driver-serial term (a 2-stage job + collect) that
            # buys nothing when batches touch most buckets anyway. The
            # manifest carries a running affected-fraction estimate — exact
            # in pruned epochs, balls-into-bins (1 - exp(-applied/live)) in
            # dense ones — and when the last TWO measurements both say
            # dense AND the table is small enough that a misprediction is
            # cheap (see ADAPTIVE_DENSE_MAX_BUCKETS), the epoch skips
            # discovery and reads every live bucket; a stream that turns
            # sparse recalibrates and resumes pruning by itself (pinned in
            # tests/test_lake.py).
            live = sorted(int(b) for b in m["buckets"])
            fracs = ((m.get("affected_frac") or 0.0), (m.get("affected_frac_prev") or 0.0))
            if (
                live
                and len(live) <= self.ADAPTIVE_DENSE_MAX_BUCKETS
                and min(fracs) >= self.ADAPTIVE_DENSE_FRAC
            ):
                affected = live
                adaptive_dense = True
            elif not live:
                # EMPTY table (first epoch): there is nothing to prune and
                # nothing to read, so the discovery job's only product —
                # the affected set — is cheaper derived from the written
                # partition dirs, exactly like dense mode (drops a 2-stage
                # job + collect from every table's first merge; guide §2.4).
                # Distinct from the adaptive-dense heuristic: this branch
                # needs no history and holds at ANY bucket count (the write
                # width is capped below, so a sparse first batch into a
                # many-bucket table never fans out to n_buckets tasks).
                affected = None
                empty_table_dense = True
            else:
                affected = sorted(
                    r.b for r in batch_ok.select(cx["bucket_b"]).distinct().collect()
                )
        else:
            # dense mode: no discovery job; the true affected set is derived
            # from the written partition dirs after the merge action
            affected = sorted(int(b) for b in m["buckets"]) or None
        if merge_mode != "mor":
            t_affected = time.time()
            # read() always emits exactly the manifest schema, so the target
            # needs conforming only when this batch evolves the schema — the
            # steady state skips a per-epoch analysis round-trip
            tgt = self.read(spark, include_deleted=True, buckets=affected)
            if new_schema.json() != m["schema"]:
                tgt = conform_to_schema(tgt, new_schema)
            t_tgt = time.time()
            if affected is None:
                affected = []  # empty table: nothing to prune, nothing to read

        # ---- the LWW MERGE as ONE union + aggregate (single shuffle) ----
        # Existing rows and batch events union into one stream of candidate
        # rows; the winner per key is max_by total order, with existing rows
        # preferred on exact (ts, tx_idx) ties (a replayed event must read as
        # a dedup hit, not an apply). Equivalent to
        #   WHEN MATCHED AND src > tgt THEN UPDATE / WHEN NOT MATCHED INSERT
        # but with no join: one hash-shuffled aggregate with map-side partial
        # reduction — the same shape as the in-batch collapse, so the merge
        # costs ONE wide shuffle total instead of agg + join.
        key = ["repo", "path"]
        if merge_mode == "mor":
            # delta = the batch's own per-key LWW winners (in-batch collapse
            # only; the base merge is deferred to read time)
            u = src.withColumn("_is_tgt", F.lit(False))
        else:
            u = src.withColumn("_is_tgt", F.lit(False)).unionByName(
                tgt.withColumn("_is_tgt", F.lit(True))
            )
        # skew mitigation (north_rule): max_by is algebraic, so map-side
        # partial aggregation (partial_max_by, verified in BENCH/PLANS.md)
        # already bounds a hot key's reducer fan-in to ONE partial row per
        # map task — at 1000 executors a hot repo costs the reducer
        # O(map tasks), not O(events). The optional two-phase salted reduce
        # (n_salts > 1) spreads a hot key over n_salts reducers first; it is
        # for merges whose combine step is not algebraic (diff folding) —
        # for this LWW merge it adds a full extra exchange+sort (measured
        # ~35% of epoch wall time) for no additional bound.
        order = cx["order"]
        pay = cx["pay"]
        if n_salts and n_salts > 1:
            salted = u.withColumn(
                "_salt",
                F.pmod(F.xxhash64(F.col("last_ts"), F.col("last_tx_idx")), F.lit(n_salts)),
            )
            p1 = salted.groupBy(*key, "_salt").agg(
                F.max_by(pay, order).alias("_w"),
                F.max((~F.col("_is_tgt")).cast("int")).alias("_had_src"),
            )
            p2 = p1.groupBy(*key).agg(
                F.max_by(
                    F.col("_w"),
                    F.struct(F.col("_w.last_ts"), F.col("_w.last_tx_idx"), F.col("_w._is_tgt").cast("int")),
                ).alias("_w"),
                F.max("_had_src").alias("_had_src"),
            )
            one_shuffle = False
        else:
            # Single-payload-shuffle plan (guide §8): ``bucket`` is a pure
            # function of the key (pmod(xxhash64(repo,path), n_buckets) —
            # the invariant fsck checks per file), so hash-partitioning by
            # bucket co-locates each key, and a groupBy on (bucket, *key)
            # is satisfied by that partitioning (subset rule) with NO
            # second exchange — the bucketed write below then reuses the
            # same layout, so the full payload crosses the wire ONCE
            # instead of key-collapse + bucket-repartition. Only taken
            # when the touched bucket count keeps reduce parallelism at or
            # above the core count (a 100 TB table has thousands of
            # buckets, so this IS the production branch); small-bucket
            # fixtures keep the two-step plan whose collapse runs at full
            # session width.
            nb_eff = len(affected) if affected else n_buckets
            cores = spark.sparkContext.defaultParallelism
            if nb_eff >= cores:
                u = u.repartition(min(nb_eff, 4 * cores), F.col("bucket"))
                p2 = u.groupBy("bucket", *key).agg(*cx["collapse_aggs"])
                one_shuffle = True
            else:
                p2 = u.groupBy(*key).agg(*cx["collapse_aggs"])
                one_shuffle = False
        merged = p2.select(*cx["merged_cols"])
        # metrics ride the same pass via observe() — no second job
        # (reference metrics analogue, SURVEY.md §2 M1; lib/redispub/publisher.go:64-114)
        obs = _Obs(f"merge_{batch_id}")
        merged = merged.observe(obs, *cx["merge_aggs"])
        merged = merged.drop("_applied", "_dedup_hit")

        # ---- write new snapshot dirs for affected buckets only ----
        # the data dir carries a per-attempt suffix so it is PRIVATE until
        # the manifest claim: two racing writers (or a crashed attempt's
        # replay) can never overwrite each other's files; losing/orphaned
        # dirs are unreferenced and reclaimed by expire_snapshots
        new_version = m["version"] + 1
        prefix = "delta" if merge_mode == "mor" else "data"
        rel_dir = f"{prefix}/v{new_version:08d}-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.path, rel_dir)
        t_write0 = time.time()
        if merge_mode == "mor" or affected or not prune or empty_table_dense:
            to_write = merged.withColumn("pb", F.col("bucket"))
            if not one_shuffle:
                write_n = (
                    len(affected)
                    if affected
                    else min(n_buckets, 4 * spark.sparkContext.defaultParallelism)
                )
                to_write = to_write.repartition(write_n, F.col("pb"))
            # (one_shuffle: already hash-partitioned by bucket — the
            # partitionBy writer splits per dir within each task)
            to_write.write.partitionBy("pb").mode("overwrite").parquet(out_dir)
            metrics = observed_row(obs)
            if merge_mode == "mor" or not prune or adaptive_dense or empty_table_dense:
                affected = sorted(
                    int(d[3:]) for d in os.listdir(out_dir) if d.startswith("pb=")
                )
        else:
            # empty batch (everything filtered): no data change, but the
            # batch id must still commit so replay recognizes the epoch
            metrics = {"rows_out": 0, "applied": 0, "dedup_hits": 0, "deletes": 0}
        t_written = time.time()

        # schema-id bookkeeping: rewritten buckets carry the (possibly newly
        # evolved) current schema id; untouched buckets keep their old id and
        # read through the mergeSchema fallback until rewritten/compacted
        schemas = dict(m.get("schemas", {"0": m["schema"]}))
        schema_id = int(m.get("schema_id", 0))
        if new_schema.json() != m["schema"]:
            schema_id = max(int(k) for k in schemas) + 1
            schemas[str(schema_id)] = new_schema.json()
        bucket_schema_id = dict(m.get("bucket_schema_id", {}))

        buckets = dict(m["buckets"])
        bucket_deltas = {b: list(ds) for b, ds in m.get("bucket_deltas", {}).items()}
        bucket_rows: dict[str, int] = {}

        def _footer_rows(bdir: str) -> int | None:
            # per-partition lineage (north_star): row count per written
            # bucket, read from the parquet footers just written —
            # driver-side metadata only, no extra Spark job
            try:
                import pyarrow.parquet as pq

                return sum(
                    pq.ParquetFile(os.path.join(bdir, f)).metadata.num_rows
                    for f in os.listdir(bdir)
                    if f.endswith(".parquet")
                )
            except Exception:
                return None

        if merge_mode == "mor":
            for b in affected:
                bdir = os.path.join(out_dir, f"pb={b}")
                bucket_deltas.setdefault(str(b), []).append(
                    {
                        "dir": os.path.join(rel_dir, f"pb={b}"),
                        "seq": new_version,
                        "sid": schema_id,
                    }
                )
                nrows = _footer_rows(bdir)
                if nrows is not None:
                    bucket_rows[str(b)] = nrows
        else:
            for b in affected:
                bdir = os.path.join(out_dir, f"pb={b}")
                if os.path.exists(bdir):
                    buckets[str(b)] = os.path.join(rel_dir, f"pb={b}")
                    bucket_schema_id[str(b)] = schema_id
                    nrows = _footer_rows(bdir)
                    if nrows is not None:
                        bucket_rows[str(b)] = nrows
                else:
                    buckets.pop(str(b), None)  # bucket emptied (all rows gone)
                    bucket_schema_id.pop(str(b), None)
                # a CoW rewrite is an incremental compaction for this bucket:
                # the target read above resolved its deltas, so the rewritten
                # base already contains their effects — drop the entries
                # (expire_snapshots reclaims the dirs once unreferenced)
                bucket_deltas.pop(str(b), None)

        # index bookkeeping: file_stats/file_blooms (written by
        # rewrite_clustered) CARRY FORWARD across merges, minus the entries
        # of buckets whose BASE this merge replaced (their files are gone;
        # keeping the keys would be dead weight, though never unsound — a
        # missing entry means "keep the file"). MoR merges leave bases in
        # place, so every entry survives (delta-carrying buckets are read
        # whole regardless — the stale-redelivery rule). Without this,
        # point-lookup bloom pruning silently died at the first merge after
        # a rewrite, for UNTOUCHED buckets too.
        replaced_dirs = (
            {
                m["buckets"][str(b)]
                for b in affected
                if str(b) in m["buckets"]
            }
            if merge_mode != "mor"
            else set()
        )

        def _live_entries(idx: dict) -> dict:
            return {
                k: v
                for k, v in idx.items()
                if k.rsplit("/", 1)[0] not in replaced_dirs
            }

        # the bloom index travels by sidecar REFERENCE: an epoch that
        # replaces no bloom-carrying bucket copies one string (no IO, no
        # re-serialization); one that does writes a filtered sidecar once
        blooms_ref = self._filtered_blooms_ref(m, replaced_dirs)

        # replay bookkeeping: recent epoch keys verbatim (bounded window) +
        # per-namespace high-watermark covering everything older — manifest
        # size and commit cost are O(1) over the stream's lifetime
        recent = [str(x) for x in m["applied_batch_ids"]] + [epoch_key]
        recent = recent[-self._REPLAY_WINDOW:]
        watermarks = dict(m.get("applied_watermarks", {}))
        prev_wm = watermarks.get(epoch_ns)
        watermarks[epoch_ns] = batch_id if prev_wm is None else max(prev_wm, batch_id)

        # running affected-fraction estimate for adaptive pruning: exact
        # where a discovery job measured it; balls-into-bins from the
        # applied count where it was skipped (P(bucket hit) under uniform
        # key hashing) — self-correcting hysteresis either way
        live_before = len(m["buckets"])
        if merge_mode == "mor":
            affected_frac = m.get("affected_frac")
            affected_frac_prev = m.get("affected_frac_prev")
        else:
            if not live_before:
                affected_frac = 1.0  # fresh table: first real epoch is dense
            elif adaptive_dense or not prune:
                import math as _math

                applied_n = int(metrics.get("applied") or 0)
                affected_frac = round(1.0 - _math.exp(-applied_n / live_before), 4)
            else:
                affected_frac = round(len(affected) / live_before, 4)
            affected_frac_prev = m.get("affected_frac")

        new_manifest = {
            "version": new_version,
            "schema": new_schema.json(),
            "schema_id": schema_id,
            "schemas": schemas,
            "bucket_schema_id": bucket_schema_id,
            "n_buckets": n_buckets,
            "buckets": buckets,
            "bucket_deltas": bucket_deltas,
            "applied_batch_ids": recent,
            "applied_watermarks": watermarks,
            "affected_frac": affected_frac,
            "affected_frac_prev": affected_frac_prev,
            "file_stats": _live_entries(m.get("file_stats", {})),
            "file_blooms": {},
            "file_blooms_ref": blooms_ref,
        }

        # quarantine BEFORE the manifest commit: once the manifest marks the
        # epoch applied, a replay skips the batch entirely — dead letters
        # written after the commit would be silently lost on a crash between
        # the two (violating the never-silently-drop contract, SURVEY §7.3).
        # The write is epoch-keyed + overwrite, so a pre-commit crash/replay
        # is idempotent (append would duplicate). Only runs when the observed
        # count says the dead branch is non-empty (healthy logs pay zero
        # extra jobs); the merge write action above completed the input
        # observation, so the count is final here.
        im = observed_row(in_obs)
        n_dead = int(im.get("unprocessable_in") or 0)
        if n_dead:
            from ..operators.deadletter import quarantine

            quarantine(
                batch_dead, os.path.join(self.path, "_deadletter"), epoch_key
            )

        self._write_manifest(new_manifest)

        stats = {
            "batch_id": batch_id,
            "epoch_key": epoch_key,
            "version": new_version,
            "merge_mode": merge_mode,
            "adaptive_dense": adaptive_dense,
            "affected_buckets": len(affected),
            "unprocessable_in": n_dead,
            "schema_evolved": new_schema.json() != m["schema"],
            "rows_out": int(metrics.get("rows_out") or 0),
            "applied": int(metrics.get("applied") or 0),
            "dedup_hits": int(metrics.get("dedup_hits") or 0),
            "deletes": int(metrics.get("deletes") or 0),
            "bucket_rows": bucket_rows,
            "wall_secs": round(time.time() - t0, 3),
            # per-phase breakdown (driver-observed): plan/setup, affected-
            # bucket discovery job, target-read plan build, merge+write job,
            # post-write bookkeeping (footers + manifest)
            "phase_secs": {
                "setup": round(t_plan - t0, 3),
                "affected": round(t_affected - t_plan, 3),
                "tgt_plan": round(t_tgt - t_affected, 3),
                "merge_write": round(t_written - t_write0, 3),
                "bookkeeping": round(time.time() - t_written, 3),
            },
        }
        if affected:
            stats["events_in"] = int(im.get("events_in") or 0)
            stats["deletes_in"] = int(im.get("deletes_in") or 0)
            # the histogram observation completes with the merge-write job;
            # `affected` non-empty ⇒ the write ran ⇒ the get is non-blocking
            hist = hist_from_observed(observed_row(hist_obs), "esz")
            if hist:
                stats["entry_size_hist"] = hist
            mw = im.get("max_wall")
            if mw is not None:
                # read-side staleness gauge (publish lag analogue)
                stats["lag_secs"] = round(time.time() - mw.timestamp(), 3)
        self._append_lineage(epoch_key, stats)
        return stats

    # ---------------- maintenance ----------------
    def compact(self, spark: SparkSession, drop_tombstones_older_than_ts: int) -> dict:
        """Rewrite every bucket, dropping tombstones whose total order is
        older than the given encoded timestamp — the analogue of the
        reference's dedup-key TTL expiry (SETEX, lib/redispub/publisher.go:
        41-62 + lib/config/main.go:88-100): once the replay window has
        passed, a delete's tombstone is no longer needed to fence late
        older events and can be reclaimed.

        Runs as its own snapshot commit; safe between streaming batches
        (single-writer discipline: call it from the same control loop).

        For merge-on-read tables this is ALSO the delta fold: the read below
        resolves base ∪ deltas through the LWW collapse, the rewrite
        materializes that resolved state as the new base, and the new
        manifest clears ``bucket_deltas`` — after compaction reads take the
        delta-free fast path again (Iceberg v2's rewrite_data_files +
        rewrite_position_delete_files analogue, emitted by
        IcebergSinkPlanner.compact).
        """
        m = self.manifest()
        live = self.read(spark, include_deleted=True)
        kept = live.where(
            (~F.col("deleted")) | (F.col("last_ts") >= F.lit(drop_tombstones_older_than_ts))
        )
        new_version = m["version"] + 1
        rel_dir = f"data/v{new_version:08d}-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.path, rel_dir)
        (
            kept.withColumn("pb", F.col("bucket"))
            .repartition(m["n_buckets"], F.col("pb"))
            .write.partitionBy("pb")
            .mode("overwrite")
            .parquet(out_dir)
        )
        buckets = {}
        for b in range(m["n_buckets"]):
            bdir = os.path.join(out_dir, f"pb={b}")
            if os.path.exists(bdir):
                buckets[str(b)] = os.path.join(rel_dir, f"pb={b}")
        # every surviving bucket is rewritten at the current schema
        cur_sid = int(m.get("schema_id", 0))
        new_manifest = {
            **m,
            "version": new_version,
            "buckets": buckets,
            "bucket_schema_id": {b: cur_sid for b in buckets},
            "bucket_deltas": {},  # deltas are folded into the new base
            "file_stats": {},  # described the replaced files
            "file_blooms": {},
            "file_blooms_ref": "",
        }
        self._write_manifest(new_manifest)
        stats = {"compacted": True, "version": new_version}
        self._append_lineage(f"compact:{new_version}", stats)
        return stats

    def compact_buckets(
        self,
        spark: SparkSession,
        buckets: list[int],
        drop_tombstones_older_than_ts: int = 0,
    ) -> dict:
        """Bucket-SCOPED delta fold: resolve base ∪ deltas for only the
        given buckets, rewrite those buckets' bases, clear their delta
        entries — untouched buckets keep their files and manifest entries
        verbatim. This is the 100 TB compaction unit (Iceberg's
        rewrite_data_files with a partition filter): a table with thousands
        of buckets compacts the handful over threshold, never the world.
        Runs as its own snapshot commit (single-writer discipline applies,
        same as compact)."""
        m = self.manifest()
        sel = sorted(int(b) for b in buckets)
        if not sel:
            return {"compacted": False, "buckets": []}
        live = self.read(spark, include_deleted=True, buckets=sel)
        kept = live.where(
            (~F.col("deleted"))
            | (F.col("last_ts") >= F.lit(drop_tombstones_older_than_ts))
        )
        new_version = m["version"] + 1
        rel_dir = f"data/v{new_version:08d}-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.path, rel_dir)
        (
            kept.withColumn("pb", F.col("bucket"))
            .repartition(len(sel), F.col("pb"))
            .write.partitionBy("pb")
            .mode("overwrite")
            .parquet(out_dir)
        )
        buckets_map = dict(m["buckets"])
        bsid = dict(m.get("bucket_schema_id", {}))
        bdeltas = {b: list(ds) for b, ds in m.get("bucket_deltas", {}).items()}
        cur_sid = int(m.get("schema_id", 0))
        replaced_dirs = {m["buckets"][str(b)] for b in sel if str(b) in m["buckets"]}
        for b in sel:
            bdir = os.path.join(out_dir, f"pb={b}")
            if os.path.exists(bdir):
                buckets_map[str(b)] = os.path.join(rel_dir, f"pb={b}")
                bsid[str(b)] = cur_sid
            else:
                buckets_map.pop(str(b), None)
                bsid.pop(str(b), None)
            bdeltas.pop(str(b), None)
        self._write_manifest(
            {
                **m,
                "version": new_version,
                "buckets": buckets_map,
                "bucket_schema_id": bsid,
                "bucket_deltas": bdeltas,
                # untouched buckets keep their stats/bloom entries; the
                # folded buckets' files are gone — drop their keys
                "file_stats": {
                    k: v
                    for k, v in m.get("file_stats", {}).items()
                    if k.rsplit("/", 1)[0] not in replaced_dirs
                },
                "file_blooms": {},
                "file_blooms_ref": self._filtered_blooms_ref(m, replaced_dirs),
            }
        )
        stats = {"compacted": True, "version": new_version, "buckets": sel}
        self._append_lineage(f"compact_buckets:{new_version}", stats)
        return stats

    def rebucket(
        self,
        spark: SparkSession,
        new_n_buckets: int,
        drop_tombstones_older_than_ts: int = 0,
    ) -> dict:
        """Bucket-count EVOLUTION (Iceberg partition-spec evolution with a
        bucket transform, executed eagerly): rewrite the whole table into
        ``new_n_buckets`` hash buckets as one snapshot commit. The day-1
        bucket count never survives 100 TB — a table sized at 32 buckets
        for its first month eventually needs thousands so that a bucket's
        live set still fits an executor during merges — and without this
        operation the count is frozen at create() forever.

        Correctness hinges on one invariant: within any single manifest
        version, EVERY row is placed by THAT version's ``n_buckets`` (the
        merge rewrites only the buckets a batch's keys hash to — a key
        whose old row lived under a different modulus would silently
        duplicate). So the rebucket rewrites ALL live rows (tombstones
        within retention included) with a recomputed ``bucket`` column and
        flips ``n_buckets`` in the same atomic manifest commit; there is no
        mixed-modulus state a reader or merger can ever observe. MoR deltas
        fold into the new base (same as compact). Old snapshots keep their
        own ``n_buckets`` and dirs — time travel and tags read the old
        layout unchanged until expiry. The per-table expression cache keys
        on the bucket count, so a live stream picks up the new modulus on
        its next epoch. ``file_stats``/``file_blooms`` are cleared (they
        describe the replaced files; re-run rewrite_clustered to rebuild
        them — pruning simply keeps everything in between).

        Runs as its own snapshot commit; single-writer discipline applies
        (call it between epochs, like compact). Shape: one full-table scan,
        one shuffle on the new bucket id — the same cost as compact()."""
        if new_n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {new_n_buckets}")
        m = self.manifest()
        if new_n_buckets == m["n_buckets"]:
            return {
                "rebucketed": False,
                "n_buckets": new_n_buckets,
                "version": m["version"],
            }
        live = self.read(spark, include_deleted=True)
        kept = live.where(
            (~F.col("deleted"))
            | (F.col("last_ts") >= F.lit(drop_tombstones_older_than_ts))
        )
        new_version = m["version"] + 1
        rel_dir = f"data/v{new_version:08d}-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.path, rel_dir)
        (
            kept.withColumn(
                "bucket",
                bucket_for(F.col("repo"), F.col("path"), new_n_buckets),
            )
            .withColumn("pb", F.col("bucket"))
            .repartition(new_n_buckets, F.col("pb"))
            .write.partitionBy("pb")
            .mode("overwrite")
            .parquet(out_dir)
        )
        buckets = {}
        for b in range(new_n_buckets):
            bdir = os.path.join(out_dir, f"pb={b}")
            if os.path.exists(bdir):
                buckets[str(b)] = os.path.join(rel_dir, f"pb={b}")
        cur_sid = int(m.get("schema_id", 0))
        self._write_manifest(
            {
                **m,
                "version": new_version,
                "n_buckets": new_n_buckets,
                "buckets": buckets,
                "bucket_schema_id": {b: cur_sid for b in buckets},
                "bucket_deltas": {},  # folded into the new base
                "file_stats": {},  # described the replaced files
                "file_blooms": {},
                "file_blooms_ref": "",
            }
        )
        stats = {
            "rebucketed": True,
            "version": new_version,
            "n_buckets": new_n_buckets,
            "from_n_buckets": m["n_buckets"],
            "buckets_live": len(buckets),
        }
        self._append_lineage(f"rebucket:{new_version}", stats)
        return stats

    def maybe_rebucket(
        self,
        spark: SparkSession,
        target_bucket_bytes: int,
        max_n_buckets: int = 4096,
    ) -> dict:
        """Threshold rebucket policy (the growth half of bucket evolution,
        mirroring maybe_compact's posture): when the mean live bytes per
        bucket exceed ``target_bucket_bytes``, grow to the smallest
        power-of-two bucket count that brings it back under (clamped to
        ``max_n_buckets``). Sizing reads only file sizes from the manifest's
        own dirs — a driver-side listdir, no Spark job — so calling it
        every epoch costs nothing until it fires."""
        if target_bucket_bytes < 1:
            raise ValueError(
                f"target_bucket_bytes must be >= 1, got {target_bucket_bytes}"
            )
        m = self.manifest()
        dirs = [os.path.join(self.path, d) for d in m["buckets"].values()]
        for entries in m.get("bucket_deltas", {}).values():
            dirs += [os.path.join(self.path, e["dir"]) for e in entries]
        total = 0
        for d in dirs:
            if os.path.isdir(d):
                for fn in os.listdir(d):
                    if fn.endswith(".parquet"):
                        total += os.path.getsize(os.path.join(d, fn))
        n = m["n_buckets"]
        if n >= max_n_buckets or total <= target_bucket_bytes * n:
            return {"rebucketed": False, "n_buckets": n, "live_bytes": total}
        want = n
        while want < max_n_buckets and total > target_bucket_bytes * want:
            want *= 2
        st = self.rebucket(spark, min(want, max_n_buckets))
        st["live_bytes"] = total
        return st

    @staticmethod
    def _with_zorder_key(
        df: DataFrame, cols: list, bits: int
    ) -> tuple[DataFrame, list]:
        """Attach the Morton (Z-order) key column ``_z`` built from
        ``bits``-bit QUANTILE ranks of each column in ``cols``.

        Rank normalization (not min/max scaling) is what makes this work
        on skewed data: boundaries come from ONE bounded approxQuantile
        pass (a mergeable sketch — the same driver-side cost shape as
        Delta's range_partition_id sampling), are inlined as a 2^bits-1
        element array literal per column, and the per-row bin is
        ``size(filter(bnds, b -> b <= v))`` — pure JVM array work over a
        broadcast-literal, no join, no window. NULLs bin to 0 (every
        comparison is NULL -> filtered out). Bit interleaving uses literal
        shifts only (the DataFrame-API shiftleft limitation)."""
        if len(cols) < 2:
            raise ValueError(
                "zorder needs >= 2 cluster columns (one column is linear)"
            )
        if not 1 <= bits <= 16:
            raise ValueError("zorder_bits must be in [1, 16]")
        if len(cols) * bits > 62:
            raise ValueError(
                f"{len(cols)} cols x {bits} bits exceeds the 62-bit z key"
            )
        if "_z" in df.columns:
            raise ValueError("input column _z collides with zorder internals")
        numeric = (T.NumericType,)
        for c in cols:
            if not isinstance(df.schema[c].dataType, numeric):
                raise ValueError(f"zorder column {c} is not numeric")
        n_bins = 1 << bits
        probs = [i / n_bins for i in range(1, n_bins)]
        err = max(0.0005, 1.0 / (4 * n_bins))
        bnds = df.stat.approxQuantile(cols, probs, err)
        k = len(cols)
        z = F.lit(0).cast("long")
        for i, c in enumerate(cols):
            if not bnds[i]:
                # all-NULL column: approxQuantile returns no boundaries;
                # every row bins to 0 and the column contributes no bits
                continue
            v = F.col(c).cast("double")
            bin_i = F.size(
                F.filter(
                    F.lit([float(b) for b in bnds[i]]),
                    lambda b: b <= v,  # noqa: B023 — v is loop-final per expr
                )
            ).cast("long")
            for j in range(bits):
                bit = F.shiftright(bin_i, j).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(
                    F.shiftleft(bit.cast("long"), j * k + i)
                )
        return df.withColumn("_z", z), ["_z"]

    def rewrite_clustered(
        self,
        spark: SparkSession,
        cluster_by: list[str] | tuple[str, ...],
        files_per_bucket: int = 4,
        drop_tombstones_older_than_ts: int = 0,
        strategy: str = "linear",
        zorder_bits: int = 8,
        bloom_cols: list[str] | tuple[str, ...] = (),
        bloom_bits: int = 8192,
        bloom_hashes: int = 5,
    ) -> dict:
        """OPTIMIZE-with-sort-order (Iceberg rewrite_data_files with a sort
        strategy / Delta OPTIMIZE ZORDER analogue): fold any deltas and
        rewrite every bucket's base with rows RANGE-CLUSTERED on
        ``cluster_by``, split into ~``files_per_bucket`` files per bucket
        with near-disjoint value ranges — the layout that makes
        read_pruned's footer-stats file skipping bite (a hash-bucketed
        table spreads every value range across every file otherwise).

        ``strategy="linear"`` (default) sorts lexicographically on
        ``cluster_by`` — tight footer ranges on the FIRST column, but a
        diverse leading column scatters every later column across every
        file (pruning on the second column skips nothing).
        ``strategy="zorder"`` interleaves the bits of per-column QUANTILE
        ranks (``zorder_bits`` bits each, boundaries from one bounded
        approxQuantile pass — rank-based like Delta's OPTIMIZE ZORDER
        range_partition_id normalization, so skewed columns still spread
        across the full bin space) into one Morton key: every clustered
        dimension gets usefully tight per-file ranges, the multi-predicate
        trade being each is somewhat looser than linear's leading column.
        Requires >= 2 numeric cluster columns (one column IS linear).

        ``bloom_cols`` additionally persists a per-FILE Bloom bitmap for
        each named column into the manifest (parquet/Iceberg's file-level
        bloom-filter index posture): min/max stats cannot prune an EQUALITY
        lookup on a column uncorrelated with the sort order (every file
        spans nearly the full value range), but a per-file membership
        bitmap can. ``prune_plan(col, eq=..)`` / ``read_pruned(.., eq=..)``
        consult them: a file is skipped when any of the probe's
        ``bloom_hashes`` bit positions is unset. Soundness: Bloom filters
        have no false NEGATIVES (a false positive only KEEPS a file), the
        probe value is hashed under the column type RECORDED with each
        entry (type widening after the rewrite cannot silently change the
        hash), files without an entry are kept, and the same base-file /
        whole-delta-bucket rules as stats pruning apply. Cost: one extra
        Spark job over the just-written files (bit_or per 64-bit word,
        partial-aggregated; output bounded by files x cols x bits/64).

        The bucket-by-key layout is PRESERVED (pb stays the partition
        column — merge correctness depends on a key living in exactly one
        bucket); the clustering happens within buckets: range-partitioning
        the write on (pb, <order>) makes each task hold a contiguous
        (bucket, value-range) slab, so each written file's footer min/max
        is tight. Runs as its own snapshot commit; single-writer discipline
        applies, same as compact."""
        if not cluster_by:
            raise ValueError("cluster_by must name at least one column")
        if strategy not in ("linear", "zorder"):
            raise ValueError(f"unknown strategy {strategy!r}")
        if bloom_bits <= 0 or bloom_bits % 64:
            raise ValueError(
                f"bloom_bits must be a positive multiple of 64: {bloom_bits}"
            )
        if bloom_hashes < 1:
            raise ValueError(f"bloom_hashes must be >= 1, got {bloom_hashes}")
        m = self.manifest()
        live = self.read(spark, include_deleted=True)
        for c in bloom_cols:
            if c not in live.columns or c in ("pb", "_z"):
                raise ValueError(f"bloom column not in the table: {c!r}")
        kept = live.where(
            (~F.col("deleted"))
            | (F.col("last_ts") >= F.lit(drop_tombstones_older_than_ts))
        )
        if strategy == "zorder":
            kept, order_cols = self._with_zorder_key(
                kept, list(cluster_by), int(zorder_bits)
            )
        else:
            order_cols = list(cluster_by)
        n_parts = max(1, len(m["buckets"])) * max(1, int(files_per_bucket))
        new_version = m["version"] + 1
        rel_dir = f"data/v{new_version:08d}-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.path, rel_dir)
        (
            kept.withColumn("pb", F.col("bucket"))
            .repartitionByRange(
                n_parts, F.col("pb"), *[F.col(c) for c in order_cols]
            )
            .sortWithinPartitions("pb", *order_cols)
            .drop("_z")
            .write.partitionBy("pb")
            .mode("overwrite")
            .parquet(out_dir)
        )
        buckets = {}
        for b in range(m["n_buckets"]):
            bdir = os.path.join(out_dir, f"pb={b}")
            if os.path.exists(bdir):
                buckets[str(b)] = os.path.join(rel_dir, f"pb={b}")
        # persist the just-written files' column stats INTO the manifest
        # (Iceberg's manifest min/max layout): prune_plan then plans reads
        # with zero data-file IO. Keyed by table-relative file path, so a
        # later CoW/compact rewrite (new dirs) can never consult stale
        # entries; entries for files this rewrite replaced are dropped.
        file_stats: dict = {}
        for b, rel_bdir in buckets.items():
            bdir = os.path.join(self.path, rel_bdir)
            for f in os.listdir(bdir):
                if not f.endswith(".parquet"):
                    continue
                per_col = {}
                # bloom cols ride along: eq-lookup planning then needs no
                # footer IO either (stats range check with lo = hi = eq)
                for c in dict.fromkeys([*cluster_by, *bloom_cols]):
                    rng = _footer_col_range(os.path.join(bdir, f), c)
                    if rng is not None and all(
                        isinstance(v, (int, float, str, bool))
                        for v in rng
                    ):
                        per_col[c] = [rng[0], rng[1]]
                if per_col:
                    file_stats[f"{rel_bdir}/{f}"] = per_col
        file_blooms: dict = {}
        if bloom_cols:
            file_blooms = self._build_file_blooms(
                spark,
                rel_dir,
                buckets,
                list(bloom_cols),
                live.schema,
                int(bloom_bits),
                int(bloom_hashes),
            )
        cur_sid = int(m.get("schema_id", 0))
        self._write_manifest(
            {
                **m,
                "version": new_version,
                "buckets": buckets,
                "bucket_schema_id": {b: cur_sid for b in buckets},
                "bucket_deltas": {},  # folded into the new base
                "file_stats": file_stats,
                "file_blooms": {},  # legacy inline slot — blooms live in
                "file_blooms_ref": (  # the immutable sidecar
                    self._write_bloom_sidecar(file_blooms)
                    if file_blooms
                    else ""
                ),
            }
        )
        stats = {
            "clustered": True,
            "version": new_version,
            "cluster_by": list(cluster_by),
            "stat_files": len(file_stats),
            "bloom_files": len(file_blooms),
        }
        self._append_lineage(f"rewrite_clustered:{new_version}", stats)
        return stats

    def _build_file_blooms(
        self,
        spark: SparkSession,
        rel_dir: str,
        buckets: dict,
        cols: list,
        schema: T.StructType,
        n_bits: int,
        k: int,
    ) -> dict:
        """Per-file Bloom bitmaps for ``cols`` over the just-written
        ``rel_dir`` files, as one Spark job: k positions per non-null value
        from ``xxhash64(col, seed+i)`` (JVM-side, same mechanics as
        operators/bloomjoin.py), exploded map-side, ``bit_or`` per 64-bit
        word partial-aggregated, collected as a bounded
        (file, col, word) -> bits list. Every written file is pre-seeded
        with an all-zero bitmap so an all-null (or empty) file prunes for
        any probe — sound, since no non-null value lives there. Each entry
        records its own type/bits/k/seed: probes hash under the RECORDED
        column type, so schema widening after the rewrite can never flip a
        hash into a false negative."""
        types = {
            f.name: f.dataType.simpleString() for f in schema.fields
        }
        blooms: dict = {}
        for b, rel_bdir in buckets.items():
            bdir = os.path.join(self.path, rel_bdir)
            for fn in os.listdir(bdir):
                if fn.endswith(".parquet"):
                    blooms[f"{rel_bdir}/{fn}"] = {
                        c: {
                            "t": types[c],
                            "b": n_bits,
                            "k": k,
                            "s": _BLOOM_SEED,
                            "w": [0] * (n_bits // 64),
                        }
                        for c in cols
                    }
        if not blooms:
            return {}
        # anchored table-relative suffix (the delta-seq discipline: a table
        # path containing a look-alike substring can never alias the key)
        rel = F.regexp_extract(
            F.col("_metadata.file_path"),
            "(" + re.escape(rel_dir) + r"/pb=\d+/[^/]+)$",
            1,
        )
        probes = []
        for c in cols:
            for i in range(k):
                probes.append(
                    F.when(
                        F.col(c).isNotNull(),
                        F.struct(
                            F.lit(c).alias("c"),
                            F.pmod(
                                F.xxhash64(F.col(c), F.lit(_BLOOM_SEED + i)),
                                F.lit(n_bits),
                            ).alias("p"),
                        ),
                    )
                )
        dirs = [os.path.join(self.path, d) for d in buckets.values()]
        rows = (
            spark.read.parquet(*dirs)
            .select(rel.alias("_f"), F.explode(F.array(*probes)).alias("_e"))
            .where(F.col("_e").isNotNull())
            .groupBy(
                "_f",
                F.col("_e.c").alias("_c"),
                F.expr("_e.p div 64").alias("_w"),
            )
            .agg(
                F.bit_or(
                    F.expr("shiftleft(1L, cast(_e.p % 64 as int))")
                ).alias("_b")
            )
            .collect()
        )
        for r in rows:
            ent = blooms.get(r._f, {}).get(r._c)
            if ent is None:
                # a position that fails to land in its file's bitmap would
                # surface later as a FALSE NEGATIVE (file wrongly skipped) —
                # fail the rewrite loudly instead
                raise RuntimeError(
                    f"bloom build: unmatched file path {r._f!r}"
                )
            ent["w"][r._w] = r._b
        return blooms

    def _write_bloom_sidecar(self, blooms: dict) -> str:
        """Persist a bloom-index snapshot as an IMMUTABLE sidecar file under
        ``_manifests/`` (Iceberg's puffin/index-file posture) and return its
        name. The manifest carries only this name: bitmaps are files × cols
        × bits/64 longs — MBs of JSON at thousands of files — and inlining
        them would re-serialize the whole index into EVERY epoch commit and
        re-parse it on every per-epoch manifest read. A sidecar is written
        only when the index CHANGES (rewrite, or a merge replacing a
        bloom-carrying bucket); unchanged epochs copy one string. Sidecars
        are uuid-named and never mutated, so manifest versions share them
        safely and reads memoize them process-wide."""
        name = f"idx-{uuid.uuid4().hex[:12]}.json"
        tmp = os.path.join(self._manifest_dir, f".tmp-{name}")
        with open(tmp, "w") as f:
            json.dump(blooms, f)
        os.replace(tmp, os.path.join(self._manifest_dir, name))
        self._cache_sidecar(name, blooms)
        return name

    def _cache_sidecar(self, name: str, blooms: dict) -> None:
        """Memoize ``name`` as this table's LIVE sidecar and evict the
        table's older entries: a long-lived streaming driver mints a new
        uuid sidecar on every rewrite/bloom-dropping merge, and an
        unbounded cache would grow by MBs per rewrite forever (ADVICE r5).
        One live index per table; a time-travel read of an older version
        just re-loads its sidecar from disk."""
        stale = [
            k
            for k in _BLOOM_SIDECAR_CACHE
            if k[0] == self.path and k[1] != name
        ]
        for k in stale:
            del _BLOOM_SIDECAR_CACHE[k]
        _BLOOM_SIDECAR_CACHE[(self.path, name)] = blooms

    def _load_blooms(self, m: dict) -> dict:
        """The manifest's bloom index: the referenced sidecar (memoized —
        immutable once linked), or the legacy inline ``file_blooms`` dict."""
        ref = m.get("file_blooms_ref") or ""
        if not ref:
            return m.get("file_blooms") or {}
        key = (self.path, ref)
        if key not in _BLOOM_SIDECAR_CACHE:
            with open(os.path.join(self._manifest_dir, ref)) as f:
                blooms = json.load(f)
            self._cache_sidecar(ref, blooms)
        return _BLOOM_SIDECAR_CACHE[key]

    def _filtered_blooms_ref(self, m: dict, replaced_dirs: set) -> str:
        """Carry the bloom index forward across a commit that replaced the
        base dirs in ``replaced_dirs``: unchanged index → the SAME sidecar
        name (one string copy, no IO); entries dropped (or legacy inline
        blooms migrating) → one new filtered sidecar; empty → ''."""
        ref = m.get("file_blooms_ref") or ""
        if not ref and not m.get("file_blooms"):
            return ""
        cur = self._load_blooms(m)
        kept = {
            k: v
            for k, v in cur.items()
            if k.rsplit("/", 1)[0] not in replaced_dirs
        }
        if len(kept) == len(cur) and ref:
            return ref
        return self._write_bloom_sidecar(kept) if kept else ""

    @staticmethod
    def _bloom_probe_positions(spark: SparkSession, value, ent: dict):
        """Bit positions of ``value`` under a manifest bloom entry's
        recorded (type, bits, k, seed) — one single-row JVM job, memoized.
        Returns None (= do not bloom-prune) when the value does not cast to
        the recorded type: hashing a NULL would test the seed's positions
        and could produce a false negative."""
        key = (repr(value), ent["t"], ent["b"], ent["k"], ent["s"])
        if key in _BLOOM_PROBE_CACHE:
            return _BLOOM_PROBE_CACHE[key]
        # try_cast: an uncastable probe yields NULL -> positions None (skip
        # bloom pruning) instead of an ANSI runtime error at plan time
        v = F.lit(value).try_cast(ent["t"])
        row = (
            spark.range(1)
            .select(
                v.isNull().alias("n"),
                *[
                    F.pmod(
                        F.xxhash64(v, F.lit(ent["s"] + i)), F.lit(ent["b"])
                    ).alias(f"p{i}")
                    for i in range(ent["k"])
                ],
            )
            .first()
        )
        pos = None if row.n else tuple(row[i + 1] for i in range(ent["k"]))
        _BLOOM_PROBE_CACHE[key] = pos
        return pos

    def maybe_compact(
        self,
        spark: SparkSession,
        min_deltas_per_bucket: int,
        drop_tombstones_older_than_ts: int = 0,
    ) -> dict:
        """Threshold compaction policy (VERDICT r4 #6 — Iceberg's
        commit.manifest.min-count-to-merge posture): fold exactly the
        buckets whose live delta count reached the threshold. Called by the
        streaming runner after each MoR merge, it keeps every bucket's
        delta count < threshold for the stream's lifetime, so read latency
        stays bounded instead of degrading with epoch count (0.48→1.09 s
        measured unbounded in BENCH/MOR.md)."""
        m = self.manifest()
        over = [
            int(b)
            for b, ds in m.get("bucket_deltas", {}).items()
            if len(ds) >= min_deltas_per_bucket
        ]
        if not over:
            return {"compacted": False, "buckets": []}
        return self.compact_buckets(spark, over, drop_tombstones_older_than_ts)

    def expire_snapshots(
        self, keep_last: int = 3, expire_metadata: bool = False
    ) -> int:
        """Delete data directories referenced only by manifests older than
        the last ``keep_last`` versions (Iceberg's expire_snapshots
        analogue). Returns the number of data directories removed.

        ``expire_metadata=True`` additionally deletes the expired manifest
        files themselves and any bloom sidecars no retained manifest
        references (Iceberg's expired-metadata cleanup). Every epoch commits
        one manifest, so a long-lived stream otherwise accumulates O(epochs)
        ``v*.json`` files that every ``history()``/fsck/orphan-scan listdir
        walks — replay correctness is unaffected (the applied-watermark
        ledger lives in the CURRENT manifest), and time travel to an expired
        version still fails eagerly with SnapshotExpiredError (``manifest``
        names the metadata-expiry cause). Tag-pinned versions are always
        retained, data and metadata both.

        Concurrency: safe beside a live writer (the supported HA posture).
        Manifests ABOVE the current version legitimately exist mid-commit
        (the claim-then-advance window in ``_write_manifest``) or as crash
        orphans awaiting adoption — they are never expired, their data dirs
        and sidecars stay referenced. Data/sidecar files referenced by NO
        manifest at all are reclaimed only once older than
        ``ORPHAN_STALENESS_SECS`` (an in-flight commit writes its data and
        sidecar BEFORE linking its manifest; a fresh unreferenced file may
        be exactly that); files referenced only by manifests being expired
        are positively known reclaimable, whatever their age."""
        import shutil as _sh

        now = time.time()

        def _stale(p: str) -> bool:
            try:
                return now - os.path.getmtime(p) >= self.ORPHAN_STALENESS_SECS
            except OSError:
                return False  # vanished concurrently: nothing to reclaim

        cur = self.current_version()
        keep_versions = set(range(max(0, cur - keep_last + 1), cur + 1))
        # named refs PIN their snapshots (Iceberg semantics: expire_snapshots
        # never reclaims a snapshot a tag points at) — drop the tag first to
        # release the bytes
        keep_versions |= set(self.tags().values())
        all_versions = {
            int(n[1:-5])
            for n in os.listdir(self._manifest_dir)
            if n.startswith("v") and n.endswith(".json")
        }
        # versions above CURRENT: in-flight or orphaned claims — protected
        protected = keep_versions | {v for v in all_versions if v > cur}
        expired = sorted(all_versions - protected)

        def _dirs_and_ref(versions) -> tuple[set[str], set[str]]:
            dirs: set[str] = set()
            refs: set[str] = set()
            for v in versions:
                try:
                    mv = self.manifest(v)
                except (FileNotFoundError, SnapshotExpiredError):
                    continue
                dirs |= set(mv["buckets"].values())
                for entries in mv.get("bucket_deltas", {}).values():
                    dirs |= {e["dir"] for e in entries}
                if mv.get("file_blooms_ref"):
                    refs.add(mv["file_blooms_ref"])
            return dirs, refs

        referenced, kept_sidecars = _dirs_and_ref(protected)
        expired_dirs, expired_refs = _dirs_and_ref(expired)
        reclaimable = expired_dirs - referenced
        removed = 0
        for root in ("data", "delta"):
            data_root = os.path.join(self.path, root)
            if not os.path.isdir(data_root):
                continue
            for snap in sorted(os.listdir(data_root)):
                snap_dir = os.path.join(data_root, snap)
                if not os.path.isdir(snap_dir):
                    continue
                # count only real bucket DIRS — plain files (_SUCCESS job
                # markers) must neither inflate `removed` nor linger in
                # emptied snapshot dirs
                buckets = [
                    b
                    for b in os.listdir(snap_dir)
                    if os.path.isdir(os.path.join(snap_dir, b))
                ]
                live = False
                for b in buckets:
                    rel = os.path.join(root, snap, b)
                    full = os.path.join(self.path, rel)
                    if rel in referenced:
                        live = True
                    elif rel in reclaimable or _stale(full):
                        _sh.rmtree(full, ignore_errors=True)
                        removed += 1
                    else:
                        # referenced by nothing but FRESH: possibly an
                        # in-flight commit's write — leave it (and its
                        # shell) for a later pass
                        live = True
                if not live:
                    # nothing referenced remains: sweep the shell (markers)
                    _sh.rmtree(snap_dir, ignore_errors=True)
        if expire_metadata:
            for v in expired:
                p = os.path.join(self._manifest_dir, f"v{v:08d}.json")
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
            for name in os.listdir(self._manifest_dir):
                if not (name.startswith("idx-") and name.endswith(".json")):
                    continue
                if name in kept_sidecars:
                    continue
                p = os.path.join(self._manifest_dir, name)
                # expired manifests' sidecars are known reclaimable; a
                # sidecar referenced by NOTHING may be an in-flight
                # rewrite's (written before its manifest links) — only
                # reclaim it once stale
                if name in expired_refs or _stale(p):
                    os.remove(p)
        return removed

    # ---------------- named refs (tags) + rollback ----------------
    #: ref names are plain path-safe identifiers (Iceberg's ref-name shape);
    #: anything else risks becoming a path traversal through the _refs dir
    _REF_NAME = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")

    def create_tag(
        self, name: str, version: int | None = None, replace: bool = False
    ) -> int:
        """Name a snapshot (Iceberg's ``create_tag`` analogue). A tag PINS
        its snapshot: ``expire_snapshots`` keeps every data dir the tagged
        manifest references until the tag is dropped, and ``read(tag=...)``
        time-travels by name. Returns the pinned version.

        Creation is atomic (tmp + ``os.replace``); an existing tag is only
        moved with ``replace=True`` (Iceberg's REPLACE TAG)."""
        if not self._REF_NAME.match(name or ""):
            raise ValueError(
                f"invalid ref name {name!r}: want [A-Za-z0-9][A-Za-z0-9._-]*"
                " (max 64 chars)"
            )
        v = self.current_version() if version is None else int(version)
        self.manifest(v)  # unknown snapshot -> FileNotFoundError, fail loud
        os.makedirs(self._refs_dir, exist_ok=True)
        p = os.path.join(self._refs_dir, f"{name}.json")
        if not replace and os.path.exists(p):
            raise ValueError(
                f"tag {name!r} already exists (at v{self.resolve_ref(name)});"
                " pass replace=True to move it"
            )
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"name": name, "version": v}, f)
        os.replace(tmp, p)
        return v

    def drop_tag(self, name: str) -> None:
        """Remove a tag; its snapshot's bytes become reclaimable by the next
        ``expire_snapshots`` (unless still inside ``keep_last`` or referenced
        by a later manifest, e.g. a rollback commit)."""
        p = os.path.join(self._refs_dir, f"{name}.json")
        try:
            os.unlink(p)
        except FileNotFoundError:
            raise KeyError(f"no such tag: {name!r}") from None

    def tags(self) -> dict:
        """All named refs as ``{name: version}``."""
        out: dict[str, int] = {}
        if not os.path.isdir(self._refs_dir):
            return out
        for fname in sorted(os.listdir(self._refs_dir)):
            # crashed-writer leftovers are `<name>.json.tmp-<hex>` — they
            # fail the suffix test; the stem must be a VALID ref name (a
            # name like "v1.tmp-x" is legal, so do not substring-filter)
            if not fname.endswith(".json"):
                continue
            stem = fname[: -len(".json")]
            if not self._REF_NAME.match(stem):
                continue
            with open(os.path.join(self._refs_dir, fname)) as f:
                rec = json.load(f)
            out[rec["name"]] = int(rec["version"])
        return out

    def resolve_ref(self, name: str) -> int:
        """Tag name -> snapshot version (KeyError if absent)."""
        p = os.path.join(self._refs_dir, f"{name}.json")
        try:
            with open(p) as f:
                return int(json.load(f)["version"])
        except FileNotFoundError:
            raise KeyError(f"no such tag: {name!r}") from None

    def rollback(self, to_version: int) -> int:
        """Roll the table back to an earlier snapshot (Iceberg's
        ``rollback_to_snapshot``): commits a NEW version whose content —
        buckets, merge-on-read deltas, schema bookkeeping, AND the replay
        idempotency ledger — is the target manifest's. History is preserved
        (the bad snapshots stay readable until expired), ``changes()``
        across the rollback emits the inverse diff by construction (it
        diffs manifests), and epochs applied after the target become
        applicable again: state and ledger roll back together, so a
        re-delivered fix epoch is not silently skipped.

        The new manifest references the TARGET's data dirs, which therefore
        stay pinned through ``expire_snapshots`` for as long as the rollback
        commit itself is retained. Fails loud (``SnapshotExpiredError``) if
        the target's bytes were already reclaimed. Single-writer discipline
        applies (call between epochs, like compact)."""
        to_version = int(to_version)
        cur = self.current_version()
        if to_version > cur:
            raise ValueError(
                f"cannot roll forward: target v{to_version} > CURRENT v{cur}"
            )
        if to_version == cur:
            return cur  # no-op
        target = self.manifest(to_version)  # FileNotFoundError if unknown
        dirs = [os.path.join(self.path, d) for d in target["buckets"].values()]
        ddirs = [
            os.path.join(self.path, e["dir"])
            for entries in target.get("bucket_deltas", {}).values()
            for e in entries
        ]
        missing = [d for d in (*dirs, *ddirs) if not os.path.isdir(d)]
        if missing:
            raise SnapshotExpiredError(
                f"cannot rollback {self.path} to v{to_version}: it references"
                f" {len(missing)} expired data dir(s) (first: "
                f"{os.path.relpath(missing[0], self.path)}) — reclaimed by "
                "expire_snapshots; only retained snapshots are restorable"
            )
        new_version = cur + 1
        self._write_manifest({**target, "version": new_version})
        self._append_lineage(
            f"rollback:{new_version}",
            {"rollback_to": to_version, "version": new_version},
        )
        return new_version

    def fsck(self, spark: SparkSession, deep: bool = True) -> DataFrame:
        """Table integrity report (Delta's FSCK / Iceberg's metadata-
        verification posture): one row per check, ``(check, n_violations)``,
        all zeros on a healthy table.

        Metadata checks (driver-side, O(manifest) — free at any scale):
          * ``missing_base_dir`` / ``missing_delta_dir`` — CURRENT manifest
            references a data dir that is gone (external deletion, botched
            restore); readers would fail lazily, fsck says so eagerly.
          * ``orphan_data_dirs`` — dirs under data/ and delta/ referenced by
            NO retained manifest: reclaimable leakage from crashed writers
            (expire_snapshots sweeps snapshot-version dirs it knows about;
            this counts whatever survived anyway). Informational — orphans
            waste space but cannot corrupt reads.

        Deep checks (``deep=True``, Spark jobs over the live view — cost is
        one table read; run them per maintenance window, not per epoch):
          * ``fsck:duplicate_live_key`` — the collapsed read view must hold
            at most ONE live row per (repo, path); a duplicate means a base
            file was corrupted or hand-copied (the MERGE can never produce
            one).
          * ``fsck:bucket_assignment`` — every row's stored ``bucket``
            column equals ``pmod(xxhash64(repo, path), n_buckets)``; a
            mismatch breaks manifest-level pruning silently (reads that
            prune would MISS the row), which is exactly why it must be
            checked rather than assumed.
          * ``fsck:misplaced_file_row`` — every row LIVES in the ``pb=N``
            dir its bucket column names (checked via the scan's
            ``_metadata.file_path``): a hand-copied or mis-restored file in
            the wrong bucket dir passes the column-vs-hash check yet makes
            bucket-pruned reads and merges miss its rows — location is the
            corruption the column cannot see.

        Implemented on the declarative expectation suite, so the deep pass
        is ONE scan + one key-grouped shuffle (operators/expectations.py).
        """
        from ..functions.routing import bucket_for
        from ..operators.expectations import run_expectations, unique

        m = self.manifest()
        missing_base = sum(
            not os.path.isdir(os.path.join(self.path, d))
            for d in m["buckets"].values()
        )
        missing_delta = sum(
            not os.path.isdir(os.path.join(self.path, e["dir"]))
            for es in m.get("bucket_deltas", {}).values()
            for e in es
        )
        referenced: set[str] = set()
        for name in os.listdir(self._manifest_dir):
            if name.startswith("v") and name.endswith(".json"):
                mv = self.manifest(int(name[1:-5]))
                referenced |= set(mv["buckets"].values())
                for es in mv.get("bucket_deltas", {}).values():
                    referenced |= {e["dir"] for e in es}
        orphans = 0
        for root in ("data", "delta"):
            droot = os.path.join(self.path, root)
            if not os.path.isdir(droot):
                continue
            for snap in os.listdir(droot):
                snap_dir = os.path.join(droot, snap)
                if not os.path.isdir(snap_dir):
                    continue
                for b in os.listdir(snap_dir):
                    if (
                        os.path.isdir(os.path.join(snap_dir, b))
                        and os.path.join(root, snap, b) not in referenced
                    ):
                        orphans += 1
        # index sidecars referenced by any retained manifest must exist (a
        # missing one would silently disable point-lookup pruning — sound
        # but a lost index is still corruption worth surfacing). The ref is
        # extracted with a key-anchored scan instead of a full json.load of
        # every manifest: a long-lived stream commits one manifest per
        # epoch, and before expire_metadata runs this check is O(epochs)
        # driver-side — parsing MB-scale bucket maps per manifest was the
        # dominant term (ADVICE r5). Manifests are engine-written json with
        # a flat string value for this key, so the anchored regex is exact.
        _ref_re = re.compile(r'"file_blooms_ref"\s*:\s*"([^"]*)"')

        def _blooms_ref(name: str) -> str:
            with open(os.path.join(self._manifest_dir, name)) as f:
                mm = _ref_re.search(f.read())
            return mm.group(1) if mm else ""

        missing_sidecars = sum(
            1
            for name in os.listdir(self._manifest_dir)
            if name.startswith("v") and name.endswith(".json")
            for ref in [_blooms_ref(name)]
            if ref
            and not os.path.isfile(os.path.join(self._manifest_dir, ref))
        )
        meta = spark.createDataFrame(
            [
                ("fsck:missing_base_dir", missing_base),
                ("fsck:missing_delta_dir", missing_delta),
                ("fsck:orphan_data_dirs", orphans),
                ("fsck:missing_index_sidecar", missing_sidecars),
            ],
            "check string, n_violations long",
        )
        if not deep or missing_base or missing_delta:
            return meta  # deep reads would crash on missing dirs
        # raw per-file scan (base + delta dirs) for the two location/column
        # checks; _metadata.file_path names each row's actual pb= dir
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        dirs = [os.path.join(self.path, d) for d in m["buckets"].values()] + [
            os.path.join(self.path, e["dir"])
            for es in m.get("bucket_deltas", {}).values()
            for e in es
        ]
        raw_checks = [
            {
                "kind": "row",
                "name": "fsck:bucket_assignment",
                "pred": F.col("bucket")
                != bucket_for(F.col("repo"), F.col("path"), m["n_buckets"]),
            },
            {
                "kind": "row",
                "name": "fsck:misplaced_file_row",
                "pred": F.regexp_extract(
                    F.col("_metadata.file_path"), r"/pb=(\d+)/[^/]+$", 1
                ).cast("int")
                != F.col("bucket"),
            },
        ]
        parts = [meta]
        if dirs:
            raw = spark.read.schema(schema).parquet(*dirs)
            parts.append(run_expectations(raw, raw_checks))
        else:
            parts.append(
                spark.createDataFrame(
                    [(c["name"], 0) for c in raw_checks],
                    "check string, n_violations long",
                )
            )
        # duplicate check runs on the COLLAPSED reader view — what a
        # consumer would actually see twice
        live = self.read(spark, include_deleted=True)
        parts.append(
            run_expectations(
                live,
                [{**unique(["repo", "path"]), "name": "fsck:duplicate_live_key"}],
            )
        )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ---------------- lineage (per-partition/batch records) ----------------
    def _append_lineage(self, epoch_key, stats: dict) -> None:
        # filename = ordinal + random suffix: ordered reads, and two
        # CONCURRENT writers (HA double-run) that race to the same ordinal
        # write two files instead of one clobbering the other's record.
        # The ordinal seeds from ONE listdir per table instance and counts
        # locally after that — a per-epoch listdir over the unboundedly
        # growing lineage dir would be a quadratic-in-stream-lifetime
        # driver-serial term on this slow shared disk.
        if self._lineage_seq is None:
            self._lineage_seq = len(os.listdir(self._lineage_dir))
        n = self._lineage_seq
        self._lineage_seq += 1
        p = os.path.join(
            self._lineage_dir, f"rec-{n:08d}-{uuid.uuid4().hex[:6]}.json"
        )
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"epoch_key": str(epoch_key), **stats}, f)
        os.replace(tmp, p)

    def lineage(self) -> list[dict]:
        out = []
        if not os.path.isdir(self._lineage_dir):
            return out
        for name in sorted(os.listdir(self._lineage_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self._lineage_dir, name)) as f:
                    out.append(json.load(f))
        return out
