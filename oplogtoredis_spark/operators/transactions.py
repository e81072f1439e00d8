"""Transaction flattening T1 (SURVEY.md §2) — the one nested-data operator.

Reference: ``admin.$cmd`` + ``applyOps: [...]`` commands expand recursively
into a flat op list; every child inherits the transaction's ts/wall; tx_idx
numbers the children 0,1,2,… in depth-first order to preserve intra-
transaction ordering (/root/reference/lib/oplog/tail.go:680-766, golden test
incl. a nested-txn-inside-txn tail_test.go:280-393).

Spark-first implementation: raw entries carry their Mongo ``o`` document as a
JSON string; ``applyOps`` elements are pulled out with
``from_json(get_json_object(o,'$.applyOps'), 'array<string>')`` — each child
is again a JSON string, so one ``posexplode`` per nesting level flattens the
log with NO Python in the loop. Real oplogs bound nesting at one level of
applyOps-in-applyOps; ``max_depth`` makes the bound explicit. tx_idx is the
depth-first rank within the parent command, computed from the per-level
positions — no window function, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RAW_COLS = ("ts", "wall", "op", "ns", "o", "o2")  # o/o2 as JSON strings


def _apply_ops(o_col):
    return F.from_json(F.get_json_object(o_col, "$.applyOps"), "array<string>")


def _is_txn(op_col, ns_col, o_col):
    # only admin.$cmd commands with an applyOps key are transactions
    # (tail.go:714-732); any other command is dropped downstream by F3.
    return (
        (op_col == F.lit("c"))
        & (ns_col == F.lit("admin.$cmd"))
        & _apply_ops(o_col).isNotNull()
    )


#: hard bound for the data-driven depth loop — Mongo itself bounds nested
#: applyOps far below this; a log "deeper" than this is corrupt
_MAX_DEPTH_CAP = 16


def _nest_path(k: int) -> str:
    """JSON path matching a depth-k applyOps chain inside a command's o."""
    return "$.applyOps" + "[*].o.applyOps" * (k - 1)


def probe_nesting_depth(raw: DataFrame, cap: int = _MAX_DEPTH_CAP) -> int:
    """Max applyOps nesting depth of the log — ONE column-pruned aggregate
    job (op/ns/o only), no explosion.

    Depth-k nesting is detected with a wildcard JSON path
    (``$.applyOps[*].o.applyOps…``) evaluated directly on the raw command
    document, so the probe never re-executes any explode level — unlike the
    previous per-level ``where(is_txn).limit(1).isEmpty()`` probe, which
    launched one job per depth level and re-ran every explode built so far
    over the full input (a full scan per level on a 100 TB log; the
    reference's recursion is free per-row, tail.go:747-759).

    The path test can OVERestimate (a non-admin.$cmd child carrying
    o.applyOps counts here but is not flattened) — that costs one no-op
    explode pass; it can never UNDERestimate, so the bound is always safe.
    Levels are probed in chunks of 4: depth ≤ 4 (every real oplog) costs
    exactly one job; each deeper chunk adds one more.
    """
    base = (F.col("op") == F.lit("c")) & (F.col("ns") == F.lit("admin.$cmd"))
    depth, lo = 0, 1
    while lo <= cap:
        hi = min(lo + 3, cap)
        flags = [
            F.max(
                F.when(
                    base & F.get_json_object(F.col("o"), _nest_path(k)).isNotNull(),
                    F.lit(k),
                ).otherwise(F.lit(0))
            ).alias(f"d{k}")
            for k in range(lo, hi + 1)
        ]
        row = raw.agg(*flags).first()
        got = max([v for v in row if v is not None] or [0])
        depth = max(depth, got)
        if got < hi:  # chunk not maxed out — nothing deeper exists
            break
        lo = hi + 1
    return depth


def flatten_transactions(raw: DataFrame, max_depth: int | None = None) -> DataFrame:
    """raw entries (ts, wall, op, ns, o, o2 — o/o2 JSON) → flat op stream with
    tx_idx. Non-transaction rows pass through with tx_idx=0.

    Each level is ONE pass: every row maps to an array — a txn row to its
    applyOps children (inheriting ts/wall, tail.go:750-754) tagged with
    their position, a plain row to a one-element array of itself tagged
    pos=-1 — and explodes. The conditional-array shape keeps the plan
    LINEAR: a filter+union formulation duplicates the upstream subtree per
    branch (Catalyst has no common-plan reuse below exchanges), i.e.
    2^depth scans of the log at depth levels — the difference between one
    pass and eight over a 100 TB log.

    ``max_depth=None`` (default) sizes the loop from a ONE-job nesting-depth
    probe over the raw log (probe_nesting_depth — wildcard JSON paths, no
    explode re-execution), matching the reference's unbounded recursion
    (tail.go:747-759) at the cost of a single column-pruned scan. With an
    explicit ``max_depth``, even that probe is skipped. Either way, any
    residual applyOps row past the bound raises at execution time (fail
    loud, SURVEY §7.3) instead of leaking an unexploded command row into
    the stream.
    """
    # _txn_id identifies the originating command; _pos_i the explode positions.
    # Prefer a caller-supplied stable id (seq) — monotonically_increasing_id is
    # only deterministic over a single linear scan.
    base_id = F.col("seq") if "seq" in raw.columns else F.monotonically_increasing_id()
    df = raw.withColumn("_txn_id", F.struct(F.col("ts"), base_id.alias("id")))
    bound = probe_nesting_depth(raw) if max_depth is None else max_depth
    pos_cols: list[str] = []

    def _child(c, i):
        return F.struct(
            i.cast("int").alias("pos"),
            F.get_json_object(c, "$.op").alias("op"),
            F.get_json_object(c, "$.ns").alias("ns"),
            F.get_json_object(c, "$.o").alias("o"),
            F.get_json_object(c, "$.o2").alias("o2"),
        )

    for level in range(bound):
        is_txn = _is_txn(F.col("op"), F.col("ns"), F.col("o"))
        pos = f"_pos{level}"
        pos_cols.append(pos)
        self_row = F.struct(
            F.lit(-1).cast("int").alias("pos"),
            F.col("op").alias("op"),
            F.col("ns").alias("ns"),
            F.col("o").alias("o"),
            F.col("o2").alias("o2"),
        )
        arr = F.when(is_txn, F.transform(_apply_ops(F.col("o")), _child)).otherwise(
            F.array(self_row)
        )
        df = df.select(
            "_txn_id",
            "ts",
            "wall",
            *[f"_pos{i}" for i in range(level)],
            F.explode(arr).alias("_c"),
        ).select(
            "_txn_id",
            "ts",
            "wall",
            *[f"_pos{i}" for i in range(level)],
            F.col("_c.pos").alias(pos),
            F.col("_c.op").alias("op"),
            F.col("_c.ns").alias("ns"),
            F.col("_c.o").alias("o"),
            F.col("_c.o2").alias("o2"),
        )
    # residual applyOps row past the bound ⇒ corrupt/over-deep log: raise at
    # execution (folded into `op` so column pruning can't drop the check)
    residual = _is_txn(F.col("op"), F.col("ns"), F.col("o"))
    df = df.withColumn(
        "op",
        F.when(
            residual,
            F.raise_error(
                F.lit(
                    f"applyOps nested deeper than {bound} levels - raise "
                    "max_depth or use max_depth=None (data-driven)"
                )
            ),
        ).otherwise(F.col("op")),
    )
    # depth-first rank within the parent command = dense position ordering;
    # levels are bounded, so rank = row_number over the lexicographic
    # (pos0, pos1, ...) order. Real transactions are small (Mongo caps
    # applyOps well below 2^16), so a per-command window over at most a few
    # hundred rows is shuffle-local.
    from pyspark.sql.window import Window

    if not pos_cols:  # max_depth=0: pass-through with the residual guard
        return df.withColumn("tx_idx", F.lit(0).cast("int")).drop("_txn_id")
    w = Window.partitionBy("_txn_id").orderBy(*[F.col(c).asc() for c in pos_cols])
    was_txn = (
        F.col(pos_cols[0]) if len(pos_cols) == 1
        else F.greatest(*[F.col(c) for c in pos_cols])
    ) >= 0
    # single window pass: splitting plain/txn rows into filter+union branches
    # would duplicate the whole upstream flatten per branch (no common-plan
    # reuse) — one exchange over everything beats two full recomputes
    out = df.withColumn(
        "tx_idx",
        F.when(was_txn, F.row_number().over(w) - 1).otherwise(F.lit(0)).cast("int"),
    )
    return out.drop("_txn_id", *pos_cols)
