"""Exact vectorized per-row top-k selection.

The ANN / kNN brute kernels rank every candidate per query row under the
contract (score, index asc) — previously a full O(n log n) argsort/lexsort
PER ROW.  ``topk_rows`` replaces that with linear-time selection
(np.partition for the k-th value, one boolean gather) followed by a stable
sort over only the ~k selected candidates — O(n + k log k) per row, fully
vectorized across rows (no per-row Python loop).

Exactness: ties at the k-th value are all gathered (the mask is
``<= kth``), and the stable argsort over candidates laid out in ascending
column order reproduces the lexicographic (value asc, column asc) rule
bit-for-bit — including +inf sentinel entries (self-exclusion slots), which
sort after every finite value and among themselves by column, exactly as
the full argsort did.  Verified against the lexsort reference on adversarial
tie fixtures in tests/test_topk.py.
"""

from __future__ import annotations

import numpy as np


def topk_rows(vals: np.ndarray, k: int) -> np.ndarray:
    """(m, n) score matrix → (m, min(k, n)) int64 column indices per row in
    exact (value ascending, column-index ascending) order.

    For "largest first" semantics pass ``-vals``.  Rows and ties are
    handled exactly as ``np.argsort(vals, axis=1, kind="stable")[:, :k]``
    would, at O(n) selection cost instead of O(n log n)."""
    vals = np.asarray(vals)
    m, n = vals.shape
    kk = min(k, n)
    if m == 0 or kk == 0:
        return np.empty((m, 0), dtype=np.int64)
    if kk == n:
        return np.argsort(vals, axis=1, kind="stable").astype(np.int64)
    if np.isnan(vals).any():
        # NaN breaks the selection invariant (NaN fails `vals <= kth`, so a
        # row can gather fewer than kk real candidates and surface pad slots
        # as fake index 0; a NaN kth collapses the mask entirely).  Degrade
        # to the full stable argsort, which ranks NaN last — the exact
        # behavior of the pre-selection code path for degenerate inputs.
        return np.argsort(vals, axis=1, kind="stable")[:, :kk].astype(np.int64)
    # k-th smallest value per row (linear-time selection); every candidate
    # with value <= kth is gathered, so boundary ties are never lost
    kth = np.partition(vals, kk - 1, axis=1)[:, kk - 1]
    mask = vals <= kth[:, None]
    counts = mask.sum(axis=1)
    r, c = np.nonzero(mask)  # c is ascending within each row
    starts = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(len(c), dtype=np.int64) - starts[r]
    maxc = int(counts.max())
    # ragged candidate sets padded with +inf AFTER the real entries: a
    # stable sort then ranks real values first (real +inf entries sit at
    # earlier positions than pads, so position order — i.e. column order —
    # breaks those ties too), and the first kk picks are always real
    # because every row has counts >= kk candidates
    cand_val = np.full((m, maxc), np.inf, dtype=vals.dtype)
    cand_idx = np.zeros((m, maxc), dtype=np.int64)
    cand_val[r, pos] = vals[r, c]
    cand_idx[r, pos] = c
    order = np.argsort(cand_val, axis=1, kind="stable")[:, :kk]
    return cand_idx[np.arange(m)[:, None], order]
