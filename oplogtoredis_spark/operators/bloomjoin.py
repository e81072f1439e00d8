"""Explicit Bloom-filter semi-join: prune a 100 TB fact side MAP-SIDE
against a compact bitmap of the dimension's keys before the exact join —
shuffle volume becomes proportional to the MATCHES, not the corpus.

Spark 3.3+ injects a runtime bloom filter into eligible join plans on its
own (spark.sql.optimizer.runtime.bloomFilter.enabled); this operator is
the explicit, composable form for when the dimension is produced by a
separate pipeline stage (or persisted), the filter must be reused across
several facts, or the pruning has to be plan-pinned rather than
optimizer-discretionary.

Mechanics: k bit positions per key from ``xxhash64(key, seed+i)`` (k
independent JVM-side hashes — no Python in the row path), bitmap packed
into ``n_bits/64`` longs. The build is one partial-agg'd shuffle over the
DIMENSION (bit_or per word) whose result is a bounded word list (128 KiB
at the default 2^20 bits) — collected once, broadcast as a single
array<bigint> row. The probe is a broadcast single-row cross join + pure
bit arithmetic inside whole-stage codegen: no shuffle touches the fact
side until the candidates (true matches + false positives, rate
~(1-e^{-kn/m})^k) reach the exact semi join that removes the false
positives. Correctness never depends on the filter: Bloom filters have no
false NEGATIVES, so candidates ⊇ matches and the exact join restores
equality.

Reference analogue: none (the reference publishes events and leaves
joining to consumers); this is downstream-consumer infrastructure over the
same tables, same as the retrieval/analytics operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_BITS = 1 << 20
DEFAULT_HASHES = 5
DEFAULT_SEED = 0x5EED


def _positions(col, i: int, n_bits: int, seed: int):
    """Bit position for hash i of a key — pmod handles xxhash64's sign."""
    return F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(n_bits))


def _pos_sql(key_col: str, i: int, n_bits: int, seed: int) -> str:
    return f"pmod(xxhash64(`{key_col}`, {seed + i}), {n_bits})"


def build_bloom(
    df: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_BITS,
    k_hashes: int = DEFAULT_HASHES,
    seed: int = DEFAULT_SEED,
) -> list[int]:
    """Bitmap words (``n_bits/64`` longs) covering every key in ``df``.

    One shuffle over the dimension: explode the k positions map-side,
    bit_or per 64-bit word (partial-aggregated), collect the bounded word
    list. n_bits must be a multiple of 64."""
    if n_bits <= 0 or n_bits % 64:
        raise ValueError(f"n_bits must be a positive multiple of 64: {n_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    c = F.col(key_col)
    pos = F.explode(
        F.array(*[_positions(c, i, n_bits, seed) for i in range(k_hashes)])
    ).alias("_pos")
    words = (
        df.where(c.isNotNull())
        .select(pos)
        .groupBy(F.expr("_pos div 64").alias("_w"))
        # DataFrame-API shiftleft only takes a literal shift; the SQL form
        # accepts a column
        .agg(
            F.bit_or(
                F.expr("shiftleft(1L, cast(_pos % 64 as int))")
            ).alias("_bits")
        )
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[r._w] = r._bits
    return out


def bloom_probe(
    df: DataFrame,
    key_col: str,
    words: list[int],
    k_hashes: int = DEFAULT_HASHES,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Rows of ``df`` whose key MIGHT be in the filter (superset of the
    true matches, no false negatives; null keys never match). Pure
    map-side: broadcast single-row bitmap + codegen'd bit tests."""
    if "_bloom" in df.columns:
        raise ValueError(
            "input must not carry the internal column _bloom"
        )
    n_bits = len(words) * 64
    spark = df.sparkSession
    bmp = spark.createDataFrame([(words,)], "_bloom array<bigint>")
    c = F.col(key_col)
    tests = []
    for i in range(k_hashes):
        p = _pos_sql(key_col, i, n_bits, seed)
        tests.append(
            f"(shiftrightunsigned(element_at(_bloom, cast({p} div 64 as int)"
            f" + 1), cast({p} % 64 as int)) % 2) = 1"
        )
    hit = F.expr(" AND ".join(tests))
    return (
        df.crossJoin(F.broadcast(bmp))
        .where(c.isNotNull() & hit)
        .drop("_bloom")
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_BITS,
    k_hashes: int = DEFAULT_HASHES,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """EXACT ``big LEFT SEMI JOIN small ON key_col`` with the fact side
    bloom-pruned map-side first. The final semi join removes the false
    positives, so the result equals the plain semi join bit-for-bit — the
    filter only shrinks what reaches the exchange."""
    words = build_bloom(small, key_col, n_bits, k_hashes, seed)
    cand = bloom_probe(big, key_col, words, k_hashes, seed)
    # no distinct on the build side: a LEFT SEMI join never multiplies the
    # left, so deduping the dimension would only add a shuffle
    return cand.join(small.select(key_col), key_col, "left_semi")
