"""sim.topk.topk_rows must reproduce the full stable-argsort reference
bit-for-bit — including boundary ties and ±inf sentinel slots — at O(n)
selection cost.  These are pure-numpy tests (no Spark session)."""

import numpy as np
import pytest

from libosmtools_spark.sim.topk import topk_rows


def reference(vals, k):
    return np.argsort(vals, axis=1, kind="stable")[:, : min(k, vals.shape[1])]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("k", [1, 5, 17])
def test_random_matches_argsort(seed, k):
    rng = np.random.default_rng(seed)
    vals = rng.normal(size=(37, 101))
    np.testing.assert_array_equal(topk_rows(vals, k), reference(vals, k))


@pytest.mark.parametrize("k", [1, 3, 8, 50])
def test_heavy_ties(k):
    """Quantized values force large tie groups straddling the k boundary."""
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 4, size=(25, 60)).astype(np.float64)
    np.testing.assert_array_equal(topk_rows(vals, k), reference(vals, k))


def test_all_equal():
    vals = np.zeros((5, 20))
    np.testing.assert_array_equal(topk_rows(vals, 7), reference(vals, 7))


def test_inf_sentinels():
    """Self-exclusion slots (+inf) must rank after every finite value and
    among themselves by column — and be emitted when k exceeds the finite
    count, exactly as the full argsort does."""
    rng = np.random.default_rng(7)
    vals = rng.normal(size=(10, 12))
    vals[np.arange(10), np.arange(10)] = np.inf  # one self slot per row
    vals[0, :] = np.inf  # a row with NO finite candidates
    vals[1, :6] = np.inf  # fewer finite than k
    for k in (3, 8, 12):
        np.testing.assert_array_equal(topk_rows(vals, k), reference(vals, k))


def test_k_ge_n_and_degenerate_shapes():
    rng = np.random.default_rng(3)
    vals = rng.normal(size=(4, 6))
    np.testing.assert_array_equal(topk_rows(vals, 6), reference(vals, 6))
    np.testing.assert_array_equal(topk_rows(vals, 99), reference(vals, 99))
    assert topk_rows(np.empty((0, 5)), 3).shape == (0, 0)
    assert topk_rows(np.empty((5, 0)), 3).shape == (5, 0)


def test_negated_for_descending():
    """The cosine paths pass -S: ties at equal cosine break by column asc."""
    S = np.array([[0.5, 0.9, 0.9, 0.1], [0.9, 0.9, 0.9, 0.9]])
    top = topk_rows(-S, 3)
    np.testing.assert_array_equal(top, [[1, 2, 0], [0, 1, 2]])


def test_nan_degrades_like_argsort():
    """NaN scores (e.g. NaN embedding components the zero-norm guard can't
    catch) must not surface pad slots as fake index 0 — the selection path
    degrades to the full stable argsort, which ranks NaN last."""
    rng = np.random.default_rng(11)
    vals = rng.normal(size=(6, 9))
    vals[0, 2] = np.nan            # one NaN candidate
    vals[1, :] = np.nan            # an all-NaN row
    vals[2, 4:] = np.nan           # NaN kth value for small k
    vals[3, 0] = np.inf            # +inf sentinel alongside NaN rows
    for k in (1, 3, 5, 9):
        np.testing.assert_array_equal(topk_rows(vals, k), reference(vals, k))
