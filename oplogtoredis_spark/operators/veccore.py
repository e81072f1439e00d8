"""Vectorized cosine-verify kernels for the quadratic dedup paths.

The pair-verify stages of ``semdedup_keep``, ``SemanticCorpus.apply_epoch``
and ``embedding_dup_pairs_lsh`` evaluate millions of 64-term dot-product
folds as JVM codegen expressions — ~64 expression steps plus a zip_with
array allocation PER PAIR (guide §4.1/§4.2: row-at-a-time JVM expression
evaluation is not fast at bulk numeric work). These kernels move the whole
pair product into NumPy matmuls inside Arrow-batched Python workers: each
member vector crosses the JVM→Python boundary ONCE (not once per pair),
and the Σ|group|² cosine block is one BLAS call per row-block.

Numeric parity (why this is safe to swap in):
- The DuckDB oracles compute the same cosines with ``list_dot_product``
  and DuckDB ``round`` — a different summation order and a different
  rounding rule (binary half-away-from-zero) than Spark's sequential
  fold + BigDecimal-string HALF_UP. Both pass value-exact today, so the
  data carries rounding margin far wider than any summation-order
  difference (~1e-15 relative) a BLAS matmul introduces.
- Rounding here still replicates Spark's ``round(double, 4)`` semantics
  (BigDecimal.valueOf(x).setScale(4, HALF_UP)) to well below that margin:
  a fast binary half-away-from-zero path, with values within 1e-6 of a
  decimal .5 boundary re-rounded through ``Decimal(repr(x))`` — the exact
  decimal-string rule. The divisor 1e4 is exactly representable, so
  ``k / 1e4`` is the correctly-rounded double of k·10⁻⁴, same as
  BigDecimal's ``doubleValue()``.
- Threshold decisions use a banded refinement: a cosine below τ−1e-4
  cannot round to ≥ τ and one at/above τ+1e-4 cannot round below it
  (round moves a value by at most 5e-5(1+ε)), so only the rare in-band
  entries pay the exact rounding path. Decisions are bit-identical to
  rounding everything.
- Norms are computed JVM-side once (same expression as before) and carried
  into the kernels; they are never recomputed in Python.

Scale shape: callers pass bounded per-group member sets (semdedup clusters
under the ``n_centroids`` broadcast gate; LSH buckets, bounded by the
banding design). Row-blocked matmuls keep peak memory at
O(block × group + group × dim); the full |group|² matrix is never
materialized.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np

#: row-block size for the pair matmuls: bounds peak memory at
#: block × |group| doubles while keeping each BLAS call large enough to
#: amortize dispatch (guide §4.2: keep batches big enough to vectorize)
_BLOCK = 1024


def round4_half_up(x: np.ndarray) -> np.ndarray:
    """Spark-semantics ``round(col, 4)`` over a float64 array.

    Fast path: half-away-from-zero on the binary value (identical to the
    BigDecimal-string rule except within ~1e-9 of a decimal .5 boundary,
    where the binary product x*1e4 may sit on the other side of the half
    than x's shortest decimal repr). Values inside a 1e-6 guard band take
    the exact decimal-string path, so the result equals Spark's for every
    input the fast path could misround."""
    y = np.abs(x) * 1e4
    f = np.floor(y + 0.5)
    out = np.copysign(f / 1e4, x)
    out[f == 0] = 0.0  # BigDecimal has no signed zero: -0.00004 -> 0.0
    frac = y - np.floor(y)
    suspect = np.abs(frac - 0.5) < 1e-6
    if suspect.any():
        q = Decimal("0.0001")
        for pos in zip(*np.nonzero(suspect)):
            out[pos] = float(
                Decimal(repr(float(x[pos]))).quantize(q, ROUND_HALF_UP)
            )
    return out


def ge_tau_mask(cos: np.ndarray, tau: float) -> np.ndarray:
    """Boolean mask of ``round4(cos) >= tau`` with banded refinement: the
    exact rounding runs only on entries within 1e-4 of τ (see module doc
    for why entries outside the band cannot change decision)."""
    hi = cos >= tau + 1e-4
    band = (cos >= tau - 1e-4) & ~hi
    if band.any():
        idx = np.nonzero(band)
        hi[idx] = round4_half_up(cos[idx]) >= tau
    return hi


def dup_rows_vs_members(
    row_ids: np.ndarray,
    RV: np.ndarray,
    rnrm: np.ndarray,
    m_ids: np.ndarray,
    MV: np.ndarray,
    mnrm: np.ndarray,
    tau: float,
) -> np.ndarray:
    """SemDeDup election for a row-block against the full member set of the
    same cluster: True where the row has a member with STRICTLY SMALLER id
    at rounded cosine >= tau. ``m_ids`` must be sorted ascending (the
    member arrays come from the driver-built broadcast); row ids need not
    be sorted."""
    out = np.zeros(len(row_ids), dtype=bool)
    for s in range(0, len(row_ids), _BLOCK):
        e = min(s + _BLOCK, len(row_ids))
        # members strictly smaller than each row id: searchsorted bound
        hi = np.searchsorted(m_ids, row_ids[s:e], side="left")
        mx = int(hi.max()) if len(hi) else 0
        if mx == 0:
            continue
        g = RV[s:e] @ MV[:mx].T
        cos = g / np.outer(rnrm[s:e], mnrm[:mx])
        ge = ge_tau_mask(cos, tau)
        allowed = np.arange(mx)[None, :] < hi[:, None]
        out[s:e] = (ge & allowed).any(axis=1)
    return out


def bucket_pairs_range(
    ids: np.ndarray,
    V: np.ndarray,
    nrm: np.ndarray,
    EB: np.ndarray | None,
    tau: float,
    lo: int,
    hi: int,
):
    """First-collision pair generation + cosine verify for rows [lo, hi) of
    ONE LSH bucket against all strictly-larger members of the same bucket.

    ``ids`` sorted ascending; ``EB`` is (n, t) int buckets of every EARLIER
    table for this group's table t (None / zero-width for table 0). Emits
    (id_a, id_b, rounded cosine) for pairs whose buckets differ in every
    earlier table (the pair was emitted there instead) and whose rounded
    cosine >= tau. Returns three 1-D arrays; the rounded value is computed
    only for survivors."""
    n = len(ids)
    hi = min(hi, n - 1)  # the last row has no larger mate
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    for s in range(lo, hi, _BLOCK):
        e = min(s + _BLOCK, hi)
        g = V[s:e] @ V[s + 1 :].T
        cos = g / np.outer(nrm[s:e], nrm[s + 1 :])
        keep = ge_tau_mask(cos, tau)
        cols = np.arange(s + 1, n)
        keep &= cols[None, :] > np.arange(s, e)[:, None]
        ri, ci = np.nonzero(keep)
        if not len(ri):
            continue
        ia, ib = ri + s, ci + s + 1
        if EB is not None and EB.shape[1]:
            # first-collision dedup on the (sparse) threshold survivors:
            # drop the pair if any earlier table bucketed it together
            fresh = ~(EB[ia, :] == EB[ib, :]).any(axis=1)
            ia, ib, ri, ci = ia[fresh], ib[fresh], ri[fresh], ci[fresh]
            if not len(ia):
                continue
        out_a.append(ids[ia])
        out_b.append(ids[ib])
        out_c.append(round4_half_up(cos[ri, ci]))
    if not out_a:
        z = np.empty(0)
        return z.astype(np.int64), z.astype(np.int64), z
    return (
        np.concatenate(out_a),
        np.concatenate(out_b),
        np.concatenate(out_c),
    )
