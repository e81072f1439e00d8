"""Single-threaded reference replay — the correctness oracle (SURVEY.md §5.6).

Applies the change-event log under the reference's exact delivery semantics
(SURVEY.md §2.2), with zero Spark involvement, producing the expected final
table state:

  1. filters: op ∈ {i,u,d} (lib/oplog/tail.go:686-764); denylisted repos
     dropped (lib/oplog/tail.go:620-627); ``system.``-prefixed paths and the
     ``config`` repo dropped (lib/oplog/processor.go:34-43)
  2. dedup: identical (repo, path, ts, tx_idx) applies exactly once
     (lib/redispub/publisher.go:41-62, 315-317)
  3. per-key order by total order (ts, tx_idx); last writer wins
  4. a winning delete removes the row

Parity contract (north_star): full row-set equality on (repo, path) with
per-row sha2(content, 256) equality.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def apply_filters_pd(events: pd.DataFrame, denylist: tuple[str, ...] = ()) -> pd.DataFrame:
    ev = events
    ev = ev[ev["op"].isin(["i", "u", "d"])]
    if denylist:
        ev = ev[~ev["repo"].isin(denylist)]
    ev = ev[~ev["path"].str.startswith("system.")]
    ev = ev[ev["repo"] != "config"]
    return ev


def replay_oracle(
    events: pd.DataFrame, denylist: tuple[str, ...] = ()
) -> pd.DataFrame:
    """Expected final state: (repo, path, commit, lang, content,
    content_sha256, last_ts, last_tx_idx)."""
    ev = apply_filters_pd(events, denylist).copy()
    # dedup identical identity (replayed/HA duplicates apply once)
    ev = ev.drop_duplicates(subset=["repo", "path", "ts", "tx_idx"], keep="first")
    # total order; stable sort ⇒ deterministic
    ev = ev.sort_values(["ts", "tx_idx"], kind="stable")
    winners = ev.groupby(["repo", "path"], sort=False).tail(1)
    winners = winners[winners["op"] != "d"].copy()
    winners["content_sha256"] = winners["content"].map(
        lambda c: hashlib.sha256(c.encode()).hexdigest() if isinstance(c, str) else None
    )
    out_cols = ["repo", "path", "commit", "lang", "content", "content_sha256"]
    if "stars" in winners.columns:
        out_cols.append("stars")
    out = winners[out_cols + ["ts", "tx_idx"]].rename(
        columns={"ts": "last_ts", "tx_idx": "last_tx_idx"}
    )
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def assert_parity(engine_state: pd.DataFrame, oracle_state: pd.DataFrame) -> None:
    """Full-outer-join parity check with content sha256 equality."""
    e = engine_state.sort_values(["repo", "path"]).reset_index(drop=True)
    o = oracle_state.sort_values(["repo", "path"]).reset_index(drop=True)
    merged = e.merge(
        o, on=["repo", "path"], how="outer", suffixes=("_eng", "_orc"), indicator=True
    )
    dangling = merged[merged["_merge"] != "both"]
    if len(dangling):
        raise AssertionError(
            f"{len(dangling)} dangling keys (engine-only or oracle-only):\n"
            f"{dangling[['repo', 'path', '_merge']].head(20)}"
        )
    bad = merged[merged["content_sha256_eng"] != merged["content_sha256_orc"]]
    if len(bad):
        raise AssertionError(
            f"{len(bad)} rows with content sha256 mismatch:\n"
            f"{bad[['repo', 'path', 'content_sha256_eng', 'content_sha256_orc']].head(20)}"
        )
    bad_ts = merged[
        (merged["last_ts_eng"] != merged["last_ts_orc"])
        | (merged["last_tx_idx_eng"] != merged["last_tx_idx_orc"])
    ]
    if len(bad_ts):
        raise AssertionError(
            f"{len(bad_ts)} rows applied at the wrong total-order position:\n"
            f"{bad_ts[['repo', 'path', 'last_ts_eng', 'last_ts_orc']].head(20)}"
        )
