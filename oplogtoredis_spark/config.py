"""Engine configuration, env-var driven.

Mirrors the shape of the reference's envconfig struct
(/root/reference/lib/config/main.go:13-36) with Spark-appropriate semantics.
Every knob has a safe default so tests never need the environment.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    return int(raw) if raw not in (None, "") else default


def _env_bool(name: str, default: bool) -> bool:
    raw = os.environ.get(name)
    if raw in (None, ""):
        return default
    return raw.lower() in ("1", "true", "yes", "on")


@dataclass(frozen=True)
class EngineConfig:
    # --- delivery semantics ------------------------------------------------
    # Reference MaxCatchUp (lib/config/main.go:19,77-86): checkpoint older than
    # this → skip to end of log. In Spark this becomes the watermark delay /
    # allowed lateness for streaming dedup state.
    max_catch_up_seconds: int = 120
    # Reference dedupe TTL (lib/config/main.go:20,88-100): how long an applied
    # (ts, tx_idx) stays deduplicable. Tombstone/lineage retention analogue.
    dedupe_ttl_seconds: int = 150

    # --- parallelism / layout ----------------------------------------------
    # Number of hash buckets in the lake target table. The analogue of the
    # reference's WriteParallelism shards (lib/config/main.go:26): the unit of
    # copy-on-write rewrite and of merge parallelism. At 100 TB this would be
    # sized so one bucket's live data fits comfortably in an executor
    # (e.g. 4096+ buckets); small here for local tests.
    target_buckets: int = 32
    # Salt fan-out for hot-key mitigation (north_rule explicit skew handling).
    skew_salts: int = 16
    shuffle_partitions: int = 32

    # --- behaviour gates ----------------------------------------------------
    # Reference OTR_OPLOG_V2_EXTRACT_SUBFIELD_CHANGES
    # (lib/oplog/oplog_v2_converter.go:208-220): shallow vs deep (dotted-path)
    # changed-field extraction for v2 diffs.
    v2_extract_subfield_changes: bool = False
    # Reference OTR_RESUME_FROM_END_ON_FAILURE escape hatch
    # (lib/config/main.go:204-219): if the checkpoint is unreadable, never
    # silently skip unless this is set.
    resume_from_end_on_failure: bool = False
    # Reference DEFAULT resume semantics (lib/oplog/tail.go:526-540, distinct
    # from the escape hatch above): "latest" = fresh start begins at the end
    # of the log and a checkpoint older than MaxCatchUp skips to the end,
    # both bounded by max_catch_up_seconds. "replay" (engine default — the
    # only safe mode for replay-to-parity) = fresh start reads everything
    # and a checkpoint of any age resumes with full catch-up.
    start_mode: str = "replay"

    # --- denylist (lib/denylist/) -------------------------------------------
    denylist: tuple[str, ...] = field(default_factory=tuple)

    @staticmethod
    def from_env() -> "EngineConfig":
        deny = tuple(
            x for x in os.environ.get("OTR_SPARK_DENYLIST", "").split(",") if x
        )
        return EngineConfig(
            max_catch_up_seconds=_env_int("OTR_SPARK_MAX_CATCH_UP_SECONDS", 120),
            dedupe_ttl_seconds=_env_int("OTR_SPARK_DEDUPE_TTL_SECONDS", 150),
            target_buckets=_env_int("OTR_SPARK_TARGET_BUCKETS", 32),
            skew_salts=_env_int("OTR_SPARK_SKEW_SALTS", 16),
            shuffle_partitions=_env_int("OTR_SPARK_SHUFFLE_PARTITIONS", 32),
            v2_extract_subfield_changes=_env_bool(
                "OTR_SPARK_OPLOG_V2_EXTRACT_SUBFIELD_CHANGES", False
            ),
            resume_from_end_on_failure=_env_bool(
                "OTR_SPARK_RESUME_FROM_END_ON_FAILURE", False
            ),
            start_mode=os.environ.get("OTR_SPARK_START_MODE", "replay"),
            denylist=deny,
        )


DEFAULT_CONFIG = EngineConfig()
