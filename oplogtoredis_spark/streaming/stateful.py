"""Custom stateful streaming operators (applyInPandasWithState).

The reference's interval-max metric is a per-key state machine, not a
windowed aggregate: Report(value) max-updates the CURRENT interval bucket,
a value in a LATER bucket retires the current one (its max becomes the
previous-interval gauge), and values in OLDER buckets are ignored
(/root/reference/lib/util/interval_max_metric.go:18-315 — Report's
bucket==/>/< cases and Collect's previous-bucket discipline).

operators/interval_max.py gives the BATCH re-expression (windowed agg with
the completed-interval reporting rule). This module is the STREAMING
re-expression, carrying the reference's actual state machine across
micro-batches with ``applyInPandasWithState``: state per key =
(current bucket, current max); an emission happens exactly when a bucket
retires — the stream of emissions IS the sequence of gauge values the
reference's Collect() would have served. Spark owns state persistence
(checkpointed to the stream's state store), so restart/replay semantics
come from Structured Streaming, not hand-rolled bookkeeping.

Batch-mode processing within one micro-batch folds buckets in ascending
order, so a single batch containing a whole bucket transition emits the
same values as two batches split across it (asserted in
tests/test_stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = "key string, interval_start_ms long, max_value double"
STATE_SCHEMA = "cur_bucket long, cur_max double"


def interval_max_stream(
    events: DataFrame,
    key_col: str,
    ts_ms_col: str,
    value_col: str,
    interval_ms: int,
) -> DataFrame:
    """Streaming completed-interval maxima: (key, interval_start_ms,
    max_value), one row per key per RETIRED interval bucket.

    Semantics per the reference state machine:
      * value in the current bucket  -> max-update, no emission
      * value in a later bucket      -> emit (current bucket, its max),
        every skipped empty bucket emits nothing (the reference gauge
        reports nothing for empty intervals), new bucket becomes current
      * value in an older bucket     -> dropped (late data past the
        state's horizon — pair with a watermark upstream to bound it)

    One deliberate deviation from the single-threaded reference: WITHIN a
    micro-batch, rows are folded in event-time (bucket) order, so
    intra-batch disorder is absorbed rather than dropped. The reference
    judges lateness by arrival order, but a distributed batch has no
    meaningful row order after a shuffle — event-time order is the only
    deterministic choice. Lateness is therefore judged against the state
    carried from PREVIOUS batches (asserted both ways in
    tests/test_stateful.py).

    The final in-flight bucket is intentionally never emitted: it is not
    complete (same withholding rule as operators/interval_max.py).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            cur_b, cur_m = state.get
        else:
            cur_b, cur_m = None, None
        completed: list[tuple[str, int, float]] = []
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            buckets = (pdf[ts_ms_col] // interval_ms) * interval_ms
            frame = pd.DataFrame({"b": buckets, "v": pdf[value_col]})
            for b, grp in frame.groupby("b", sort=True):
                b = int(b)
                m = float(grp["v"].max())
                if cur_b is None or b == cur_b:
                    cur_m = m if cur_b is None else max(cur_m, m)
                    cur_b = b
                elif b > cur_b:
                    completed.append((key[0], cur_b, cur_m))
                    cur_b, cur_m = b, m
                # b < cur_b: late past horizon — reference Report ignores it
        if cur_b is not None:
            state.update((int(cur_b), float(cur_m)))
        if completed:
            yield pd.DataFrame(
                completed, columns=["key", "interval_start_ms", "max_value"]
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
