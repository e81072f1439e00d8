"""Per-micro-batch data-quality gate for the CDC apply stream.

Wraps a foreachBatch applier so every micro-batch is checked against a
declarative expectation suite (operators/expectations.py) BEFORE the
lake merge — the streaming posture of the batch DQ report: a bad
upstream batch must not reach the table.

Policies (what happens when a batch has violations):

  fail        — raise DataQualityError: the query terminates and the
                checkpoint still points AT the bad batch, so a restart
                re-sees it (nothing is skipped silently). The fail-loud
                default, matching the engine's carry-over rule.
  quarantine  — violating ROWS route to an epoch-keyed quarantine side
                output (operators/deadletter.py — overwrite-idempotent
                under replay, written BEFORE the merge commit) and the
                clean rows proceed. Row-local checks only: aggregate
                checks (unique / foreign_key) have no per-row culprit.
  log         — record the report and apply the batch unchanged
                (observability without enforcement).

Cost: one extra aggregate pass per micro-batch over a persisted batch
(row-local checks fold into ONE agg regardless of how many there are);
the report itself is check-count-sized. Reports are kept on the applier
(``.reports``) and pushed to ``on_report`` for the control plane.

Reference analogue: none — the reference trusts its oplog; this is the
pipeline-hygiene layer a 100 TB ingest needs in front of the table.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import functions as F

from ..operators.deadletter import quarantine as _quarantine
from ..operators.expectations import run_expectations

POLICIES = ("fail", "quarantine", "log")


class DataQualityError(RuntimeError):
    """A gated micro-batch violated the expectation suite."""

    def __init__(self, batch_id: int, violations: dict):
        self.batch_id = batch_id
        self.violations = violations
        super().__init__(
            f"batch {batch_id} failed data-quality gate: {violations}"
        )


def make_gated_applier(
    inner_apply: Callable,
    checks: Sequence[dict],
    policy: str = "fail",
    quarantine_dir: str | None = None,
    epoch_ns: str = "",
    on_report: Callable[[int, dict], None] | None = None,
) -> Callable:
    """Wrap ``inner_apply(batch_df, batch_id)`` with the expectation gate.

    The expectation dicts are built ONCE per stream (unresolved Column
    trees are immutable and reattach to every micro-batch — the same
    per-epoch py4j discipline the lake's merge expressions use)."""
    if policy not in POLICIES:
        raise ValueError(f"policy must be one of {POLICIES}, got {policy!r}")
    if policy == "quarantine":
        if quarantine_dir is None:
            raise ValueError("quarantine policy needs quarantine_dir")
        non_row = [c["name"] for c in checks if c["kind"] != "row"]
        if non_row:
            raise ValueError(
                "quarantine policy routes individual rows; aggregate checks "
                f"have no per-row culprit: {non_row} (use policy='fail')"
            )
        # first failing check names the quarantine reason
        reason = F.coalesce(
            *[F.when(c["pred"], F.lit(c["name"])) for c in checks],
            F.lit(None).cast("string"),
        )

    reports: list[tuple[int, dict]] = []

    def apply(batch_df, batch_id: int):
        batch_df.persist()
        try:
            rep = {
                r.check: r.n_violations
                for r in run_expectations(batch_df, checks).collect()
            }
            bad = {k: v for k, v in rep.items() if v > 0}
            reports.append((batch_id, rep))
            if on_report is not None:
                on_report(batch_id, rep)
            if not bad:
                inner_apply(batch_df, batch_id)
            elif policy == "fail":
                raise DataQualityError(batch_id, bad)
            elif policy == "quarantine":
                # quarantine BEFORE the merge commit: a crash in between
                # replays the batch and overwrites the same epoch subdir
                _quarantine(
                    batch_df.where(reason.isNotNull()).withColumn(
                        "dl_reason", reason
                    ),
                    quarantine_dir,
                    epoch_key=f"{epoch_ns}#{batch_id}",
                )
                inner_apply(batch_df.where(reason.isNull()), batch_id)
            else:  # log
                inner_apply(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    apply.reports = reports
    return apply
