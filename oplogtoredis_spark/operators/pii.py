"""PII scrubbing for training corpora: regex redaction of emails, phone
numbers, and IPv4 addresses, with per-type match counters.

The standard pre-training privacy pass (the C4/Dolma posture: structured
identifiers are regex-redactable at corpus scale; free-text names need an
NER model and are out of scope for a relational engine). Pure JVM-side
``regexp_replace`` / ``regexp_extract_all`` expressions — a narrow map-only
projection, no UDF, no shuffle: at 100 TB this runs entirely inside the
scan stage, and the per-reason counters aggregate with one partial-agg'd
groupBy if a corpus report is wanted downstream.

Patterns are deliberately RE2-compatible (no backreferences, no lookarounds)
so the DuckDB oracle runs the byte-identical regexes: Java's regex engine
and RE2 agree on this subset. Redaction is STAGED — emails first (their
domains would otherwise be half-eaten by the IP/phone rules), then IPv4,
then phones — and each stage's counter is measured on the text as that
stage sees it, so a token is counted by exactly one rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (name, pattern, replacement) in application order. Order is semantic:
#: earlier rules consume text later rules would half-match.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, redacted, n_email, n_ipv4, n_phone, n_pii) per document.

    ``redacted`` is the text with every match replaced by its placeholder;
    the counters are the number of matches each rule consumed. A NULL
    text keeps ``redacted`` NULL but counts ZERO matches — without the
    coalesce the counters were NULL too, and such a row fell out of BOTH
    ``n_pii = 0`` and ``n_pii > 0`` filters (neither clean nor flagged),
    while corpus-level counter sums silently undercounted.
    """
    cur: Column = F.col(text_col)
    counters = []
    for name, pat, rep in PII_RULES:
        counters.append(
            F.coalesce(
                F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))),
                F.lit(0),
            ).alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, rep)
    out = df.select(F.col(id_col), cur.alias("redacted"), *counters)
    total = sum(
        (F.col(f"n_{name}") for name, _, _ in PII_RULES), F.lit(0)
    )
    return out.withColumn("n_pii", total)


def pii_rules_sql(text_expr: str) -> tuple[str, list[str]]:
    """DuckDB rendering of the staged pipeline: returns (redacted_expr,
    [counter_expr per rule]) over ``text_expr`` — each counter measured on
    the text AFTER the earlier rules ran, mirroring redact_pii exactly."""
    cur = text_expr
    counters = []
    for name, pat, rep in PII_RULES:
        counters.append(
            f"len(regexp_extract_all({cur}, '{pat}')) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{rep}', 'g')"
    return cur, counters
