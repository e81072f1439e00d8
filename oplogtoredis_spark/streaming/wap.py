"""Write-audit-publish (WAP) merges over the lake — Iceberg's staged-commit
pattern composed from the engine's own primitives.

Iceberg's WAP flow writes to a staging branch, audits the staged snapshot,
then fast-forwards the published ref. This engine's manifest chain is linear,
but the same consumer-facing contract falls out of tags + rollback:

  1. ``merge_batch`` commits the epoch (snapshot vN).
  2. The AUDIT runs the declarative expectation suite
     (operators/expectations.py) against the epoch's effect — by default the
     NET post-images from ``changes(v_pre, vN)`` (O(epoch), the only scope
     that survives 100 TB per-epoch audits), optionally the whole live table.
  3. PUBLISH = move the ``published`` tag to vN (atomic ref write). Consumers
     that read ``table.read(spark, tag="published")`` can never observe an
     unaudited snapshot — the tag is the visibility boundary, exactly the
     role of Iceberg's published branch head.
  4. A failed audit ROLLS BACK to the pre-merge version — state and replay
     ledger restore together, so the corrected epoch re-applies under the
     same batch id — and raises with the violating checks. The tag never
     moved, so tag-pinned consumers never saw the bad snapshot, and the bad
     snapshot remains in history for forensics until expiry.

Distinction from the streaming DQ gate (streaming/gate.py): the gate audits
the incoming BATCH before it merges (cheap, catches malformed input); WAP
audits the MERGED RESULT (catches cross-epoch effects the batch alone cannot
show — e.g. a uniqueness break against already-live rows via a foreign_key /
unique check, or a net state the LWW collapse produces). They compose: gate
for fast rejection, WAP for the publish boundary.

Reference analogue: none — the reference publishes to Redis fire-and-forget
(lib/redispub/publisher.go); an audited publish boundary is lake-sink
capability the north_rule's design space adds.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import SparkSession

from ..operators.expectations import run_expectations

#: changes() post-image change types — the rows an epoch made live
_POST_TYPES = ("insert", "update_postimage")


class WriteAuditError(RuntimeError):
    """A WAP audit failed; the merge was rolled back and never published."""

    def __init__(self, batch_id, version: int, violations: dict):
        self.batch_id = batch_id
        self.version = version
        self.violations = violations  # {check_name: n_violations}
        super().__init__(
            f"write-audit-publish: epoch {batch_id} (snapshot v{version}) "
            f"failed audit and was rolled back; violations: {violations}"
        )


def wap_merge(
    table,
    spark: SparkSession,
    batch,
    batch_id: int,
    checks: Sequence[dict],
    publish_tag: str = "published",
    audit_scope: str = "changes",
    **merge_kwargs,
) -> dict:
    """Merge one epoch, audit its effect, and publish (move ``publish_tag``)
    only if every expectation passes; roll back and raise otherwise.

    ``audit_scope``:
      * ``"changes"`` (default) — audit the epoch's NET post-images
        (``changes(v_pre, v_post)``), O(changed buckets): pre-existing
        violations elsewhere in the table do not re-fail every epoch, and
        the audit cost tracks the epoch, not the table.
      * ``"table"`` — audit the full live state at the new snapshot (the
        strict posture for suites whose checks are global, e.g. unique).

    Checks reference the TABLE's schema (the audit runs over merged rows:
    ``content``/``lang``/``content_sha256``/``last_ts``/``last_tx_idx``/...),
    NOT the batch envelope — e.g. the envelope's ``tx_idx`` lands as
    ``last_tx_idx``.

    Returns ``merge_batch``'s stats plus ``published`` (the tagged version)
    on success; a replayed epoch is skipped untouched (tag keeps its
    version). Single-writer discipline applies, like merge/compact.
    """
    if audit_scope not in ("changes", "table"):
        raise ValueError(f"unknown audit_scope: {audit_scope!r}")
    if not checks:
        raise ValueError("wap_merge: no checks given — use merge_batch")
    # malformed suites must fail BEFORE the merge (afterwards they would
    # abort between commit and audit, leaving an unaudited snapshot)
    names = [c["name"] for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    bad_kinds = [c["name"] for c in checks if c.get("kind") not in
                 ("row", "unique", "fk")]
    if bad_kinds:
        # run_expectations silently IGNORES unknown kinds — a typo'd suite
        # would audit vacuously and publish unaudited data
        raise ValueError(
            f"unknown expectation kind in checks {bad_kinds}: "
            "use the constructors in operators/expectations.py"
        )
    if not table._REF_NAME.match(publish_tag or ""):
        raise ValueError(f"invalid publish_tag name: {publish_tag!r}")
    v_pre = table.current_version()
    stats = table.merge_batch(batch, batch_id, **merge_kwargs)
    v_post = table.current_version()
    if stats.get("skipped_replay") or v_post == v_pre:
        return stats
    try:
        if audit_scope == "changes":
            ch = table.changes(spark, v_pre, v_post)
            target = ch.where(ch["_change_type"].isin(*_POST_TYPES)).drop(
                "_change_type", "_commit_version"
            )
        else:
            target = table.read(spark)
        report = run_expectations(target, checks)
        violations = {
            r["check"]: r["n_violations"]
            for r in report.where(report["n_violations"] > 0).collect()
        }
    except Exception:
        # the audit itself failed (e.g. a check referencing a column the
        # post-image frame lacks): WITHOUT a rollback the unaudited
        # snapshot stays committed, the replay ledger marks the epoch
        # applied (a retry would skip the audit entirely), and the next
        # clean publish would move the tag past it — breaking the "tag
        # readers never observe an unaudited snapshot" invariant. Roll
        # back state AND ledger together, then surface the real error.
        table.rollback(v_pre)
        raise
    if violations:
        table.rollback(v_pre)
        raise WriteAuditError(batch_id, v_post, violations)
    table.create_tag(publish_tag, v_post, replace=True)
    return {**stats, "published": v_post}
