"""Dead-letter side output — unprocessable events are COUNTED and KEPT.

Reference semantics: an unsupported doc-id type raises
ErrUnsupportedDocIDType and increments a metric instead of publishing
(/root/reference/lib/oplog/processor.go:16,48-66, asserted
processor_test.go:198-213); malformed entries are logged-and-skipped with a
counter (lib/oplog/tail.go:109-114). The engine's carry-over rule (SURVEY
§7.3, "fail loud") forbids silent data loss, so every row an operator cannot
process routes to a quarantine side output with a reason column, and the
count rides the batch's own metrics pass.

Spark-first shape: classification is a null/non-null ``reason`` column
(native expressions, e.g. functions/messages.classify_doc_id); the split is
two filters over the same plan — Catalyst reuses the scan, and at scale the
dead branch is empty for healthy logs so its write is skipped entirely
(guarded by the observed count, not a second blind scan).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F


def split_dead_letters(
    df: DataFrame, reason: Column
) -> tuple[DataFrame, DataFrame]:
    """(ok, dead): rows with a non-null reason route to the dead side with a
    ``dl_reason`` column appended; ok rows pass through unchanged."""
    return df.where(reason.isNull()), df.where(reason.isNotNull()).withColumn(
        "dl_reason", reason
    )


def quarantine(dead: DataFrame, path: str, epoch_key: str = "") -> int:
    """Write the dead rows to an EPOCH-KEYED quarantine subdir in overwrite
    mode, tagged with the epoch that produced them. Epoch-keyed + overwrite
    makes the write idempotent under replay: it runs BEFORE the sink's
    manifest commit (lake.py), so a crash between quarantine and commit
    replays the batch and simply rewrites the same subdir — append mode
    there would duplicate, and writing after the commit would lose the rows
    entirely on a crash in between. Returns the row count (one pass: the
    count rides the write via observe)."""
    import hashlib

    from pyspark.sql import Observation

    obs = Observation(f"dl_{abs(hash(epoch_key))}")
    tagged = dead.withColumn("dl_epoch", F.lit(epoch_key)).observe(
        obs, F.count(F.lit(1)).alias("n")
    )
    # epoch keys embed filesystem-hostile characters (abs paths, ':') —
    # key the subdir by a stable digest; the verbatim key is in dl_epoch
    sub = os.path.join(
        path, f"epoch={hashlib.sha256(epoch_key.encode()).hexdigest()[:16]}"
    )
    os.makedirs(path, exist_ok=True)
    tagged.write.mode("overwrite").parquet(sub)
    from ..functions.histograms import observed_row

    return int(observed_row(obs).get("n") or 0)
