"""Cross-document repeated-span removal (C4's "discard repeated text" /
intra-corpus boilerplate stripping), span granularity = fixed word windows.

The exact-dedup operators drop whole duplicate DOCUMENTS; real corpora also
carry duplicated *passages* inside otherwise-distinct documents (boilerplate
headers, license blocks, templated paragraphs). This operator removes every
repeated span except its first occurrence corpus-wide and reassembles the
surviving text per document — the C4 recipe (Raffel et al. 2020 §2.2 dedups
three-sentence spans) re-expressed relationally:

  1. tokenize once per document (materialized in a CHILD projection — Spark
     does no CSE across higher-order-function lambda boundaries, the trap
     CLAUDE.md documents),
  2. explode into consecutive non-overlapping ``span_words``-word spans
     (map-side, streams through the scan stage),
  3. first-occurrence election: ``row_number() == 1`` over a window
     partitioned by the span text, ordered by ``(id, span_idx)`` — a total
     order, so the winner is deterministic at any parallelism,
  4. reassemble: per-document ordered concat of the KEPT spans; documents
     whose every span was claimed elsewhere drop from the corpus entirely.

Plan shape / 100 TB posture: exactly TWO shuffles over span-level rows (the
span window, then the per-document regroup), both keyed well; no join, no
UDF. The window's partition key is the span text itself, so a pathological
corpus-wide boilerplate span concentrates its copies in one partition — the
sort there is streaming (spills, never OOMs), and ``row_number`` needs no
full materialization. If that tail dominates, pre-hash spans and salt the
hot hashes exactly like operators/skew.py does for joins.

Reference scope note: the reference engine (tulip/oplogtoredis) has no
corpus operators at all — this belongs to the training-data-pipeline surface
the build brief adds on top of SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens

_INTERNAL = ("_toks", "_n_spans", "_span_idx", "_span", "_keep", "_kept")


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 20,
) -> DataFrame:
    """Remove every repeated ``span_words``-word span except its corpus-wide
    first occurrence; returns one row per SURVIVING document:

      (id_col, text_col = reassembled text,
       n_spans = spans in the original document,
       n_spans_dropped = spans removed as repeats)

    Documents reduced to zero spans are dropped (the C4 posture: a document
    that was pure boilerplate contributes nothing). The winner of each span
    is the smallest ``(id, span_idx)`` — deterministic, partition-order
    independent. Other input columns are not carried (reassembly is a
    regroup; re-join metadata on ``id_col`` afterwards if needed).

    Precondition: ``id_col`` is unique (one row per document) — duplicate
    ids would tie the winner election's order key (nondeterministic
    winner) and the regroup would interleave the two texts' spans; dedup
    upstream (the same collapse-upstream contract as the incremental
    corpus classes).
    """
    if span_words < 1:
        raise ValueError("span_words must be >= 1")
    clash = [c for c in df.columns if c in _INTERNAL]
    if clash:
        raise ValueError(f"input columns collide with internals: {clash}")

    # blank/NULL documents have NO spans to dedup — route them around the
    # machinery verbatim. Without this, tokens('') = [''] gives every
    # blank doc the same empty-string span: one arbitrary winner survives
    # (with text '') and every other blank doc is silently DELETED as "a
    # repeat" — neither keep-all nor drop-all, and not the C4 semantics.
    blank_pred = F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
    passthrough = df.where(blank_pred).select(
        F.col(id_col),
        F.col(text_col),
        F.lit(0).cast("long").alias("n_spans"),
        F.lit(0).cast("long").alias("n_spans_dropped"),
    )
    df = df.where(~blank_pred)

    # tokenize ONCE per row in a child projection; the slice lambda below
    # must not close over the raw split() (per-element re-evaluation)
    base = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).withColumn(
        "_n_spans",
        F.greatest(
            F.ceil(F.size("_toks") / F.lit(float(span_words))).cast("int"),
            F.lit(1),
        ),
    )
    spans = base.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_n_spans") - 1)).alias(
            "_span_idx"
        ),
    ).select(
        id_col,
        "_span_idx",
        F.array_join(
            F.slice(
                F.col("_toks"), F.col("_span_idx") * span_words + 1, span_words
            ),
            " ",
        ).alias("_span"),
    )
    w = Window.partitionBy("_span").orderBy(id_col, "_span_idx")
    flagged = spans.withColumn("_keep", F.row_number().over(w) == 1)
    # collect_list skips nulls: only kept spans enter the reassembly array
    out = (
        flagged.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("_keep"),
                        F.struct(F.col("_span_idx"), F.col("_span")),
                    )
                )
            ).alias("_kept"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).alias(
                "n_spans_dropped"
            ),
        )
        .where(F.size("_kept") > 0)
        .select(
            id_col,
            F.array_join(
                F.transform(F.col("_kept"), lambda x: x["_span"]), " "
            ).alias(text_col),
            "n_spans",
            "n_spans_dropped",
        )
    )
    return out.unionByName(passthrough)
