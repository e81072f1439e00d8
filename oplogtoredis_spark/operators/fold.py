"""Diff-folding apply: sequential per-key modifier-update application.

The hot path assumes after-image CDC (every i/u event carries the full row),
which makes LWW a parallel max_by reduction. Some upstream logs are
DIFF-ONLY (a modifier update carries just {"$set":...}/{"$unset":...} or a
v2 diff); folding those requires applying each key's events IN ORDER — an
inherently sequential per-key computation.

Spark-first expression: ``applyInPandas`` over groupBy(key) — Arrow-batched,
one Python invocation per key group, parallel ACROSS keys (the per-key
ordering unit is exactly the reference's ParallelismKey contract,
/root/reference/lib/redispub/publication.go:29-31). Inside a group the fold
is plain pandas over the (ts, tx_idx)-sorted events.

Scale: per-key event counts are bounded in practice (a file's change
history); a pathological key folds in one task but never blocks other keys.
Off the hot path by design — see sources/schemas.py.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FOLDED_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("doc_json", T.StringType(), True),  # final document state
        T.StructField("last_ts", T.LongType(), True),
        T.StructField("last_tx_idx", T.IntegerType(), True),
        T.StructField("deleted", T.BooleanType(), False),
    ]
)


def _apply_modifier(doc: dict, update: dict) -> dict:
    """$set / $unset (v1) and v2 {"$v":2,"diff":{...}} application.

    v2 diffs are applied at top-level granularity (u/i/d subtrees +
    s-field recursion) — the same shapes changed-fields T4-T6 classify.
    """
    if "$set" in update or "$unset" in update:
        for k, v in update.get("$set", {}).items():
            _set_dotted(doc, k, v)
        for k in update.get("$unset", {}):
            _unset_dotted(doc, k)
        return doc
    if update.get("$v") == 2 and isinstance(update.get("diff"), dict):
        _apply_v2_diff(doc, update["diff"])
        return doc
    # replacement update: whole-document replace
    return {k: v for k, v in update.items() if not k.startswith("$")}


def _set_dotted(doc: dict, dotted: str, value) -> None:
    parts = dotted.split(".")
    cur = doc
    for p in parts[:-1]:
        nxt = cur.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[p] = nxt
        cur = nxt
    cur[parts[-1]] = value


def _unset_dotted(doc: dict, dotted: str) -> None:
    parts = dotted.split(".")
    cur = doc
    for p in parts[:-1]:
        cur = cur.get(p)
        if not isinstance(cur, dict):
            return
    cur.pop(parts[-1], None)


def _apply_v2_diff(doc: dict, diff: dict) -> None:
    from ..functions.changed_fields import _is_array_operator

    for key, op in diff.items():
        if key in ("i", "u") and isinstance(op, dict):
            for k, v in op.items():
                doc[k] = v
        elif key == "d" and isinstance(op, dict):
            for k in op:
                doc.pop(k, None)
        elif key.startswith("s") and key not in ("s",) and _is_array_operator(op):
            # array operator {"a": true, "u<idx>": value}: index-set on the
            # list field — checked BEFORE the generic s-recursion, like the
            # reference (oplog_v2_converter.go:97-111); recursing would drop
            # the update (the u<idx> key matches no object-diff case)
            field = key[1:]
            arr = doc.get(field)
            if not isinstance(arr, list):
                arr = []
                doc[field] = arr
            for ak, av in op.items():
                if ak == "a":
                    continue
                idx = int(ak[1:])
                while len(arr) <= idx:
                    arr.append(None)
                arr[idx] = av
        elif key.startswith("s") and isinstance(op, dict) and key not in ("s",):
            field = key[1:]
            sub = doc.get(field)
            if not isinstance(sub, dict):
                sub = {}
                doc[field] = sub
            _apply_v2_diff(sub, op)
        elif key == "a":
            continue


def fold_diff_events(events: DataFrame) -> DataFrame:
    """events (repo, path, ts, tx_idx, op, doc string-JSON) → final per-key
    document state by in-order application. op: 'i' insert (doc = full),
    'u' update (doc = modifier/replacement), 'd' delete."""

    def fold(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "tx_idx"], kind="stable").drop_duplicates(
            subset=["ts", "tx_idx"], keep="first"
        )
        doc: dict | None = None
        deleted = False
        for row in pdf.itertuples():
            if row.op == "i":
                doc = json.loads(row.doc) if row.doc else {}
                deleted = False
            elif row.op == "u":
                update = json.loads(row.doc) if row.doc else {}
                doc = _apply_modifier(doc if isinstance(doc, dict) else {}, update)
                deleted = False
            elif row.op == "d":
                doc = None
                deleted = True
        last = pdf.iloc[-1]
        return pd.DataFrame(
            {
                "repo": [key[0]],
                "path": [key[1]],
                "doc_json": [json.dumps(doc, sort_keys=True) if doc is not None else None],
                "last_ts": [int(last["ts"])],
                "last_tx_idx": [int(last["tx_idx"])],
                "deleted": [deleted],
            }
        )

    return events.groupBy("repo", "path").applyInPandas(fold, schema=FOLDED_SCHEMA)
