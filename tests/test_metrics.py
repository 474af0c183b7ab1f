"""Metric correctness: hand-computed values + brute-force swap oracles.

Strategy per SURVEY.md §4: unit tests per metric against hand values, and
property tests (swap-delta matrix == metric(swapped) − metric(original),
verified exhaustively over all pairs with a numpy oracle).
"""

import numpy as np
import pytest

from ranklib_tpu.metrics.base import MetricScorer, create_scorer


# ---------------------------------------------------------------------------
# numpy oracles


def np_dcg(labels, k):
    n = len(labels)
    k = n if k <= 0 else min(k, n)
    g = 2.0 ** np.asarray(labels, np.float64) - 1.0
    d = 1.0 / np.log2(np.arange(n) + 2.0)
    return float((g[:k] * d[:k]).sum())


def np_ndcg(labels, k):
    ideal = np_dcg(sorted(labels, reverse=True), k)
    return np_dcg(labels, k) / ideal if ideal > 0 else 0.0


def np_err(labels, k, gmax=4.0):
    n = len(labels)
    k = n if k <= 0 else min(k, n)
    R = (2.0 ** np.asarray(labels, np.float64) - 1.0) / 2.0 ** gmax
    err, t = 0.0, 1.0
    for r in range(k):
        err += t * R[r] / (r + 1)
        t *= 1.0 - R[r]
    return err


def np_ap(labels):
    rel = np.asarray(labels) > 0
    if rel.sum() == 0:
        return 0.0
    c = np.cumsum(rel)
    return float((c[rel] / (np.flatnonzero(rel) + 1.0)).sum() / rel.sum())


def np_p(labels, k):
    n = len(labels)
    k = n if k <= 0 else min(k, n)
    return float((np.asarray(labels[:k]) > 0).sum() / k)


def np_rr(labels, k):
    n = len(labels)
    k = n if k <= 0 else min(k, n)
    for i in range(k):
        if labels[i] > 0:
            return 1.0 / (i + 1)
    return 0.0


def np_best(labels, k):
    n = len(labels)
    k = n if k <= 0 else min(k, n)
    return float(max(labels[:k])) if k > 0 else 0.0


ORACLES = {
    "NDCG": np_ndcg,
    "DCG": np_dcg,
    "ERR": np_err,
    "MAP": lambda l, k: np_ap(l),
    "P": np_p,
    "RR": np_rr,
    "BEST": np_best,
}


# ---------------------------------------------------------------------------
# hand-computed values


def test_ndcg_hand():
    s = MetricScorer("NDCG", 10)
    # perfect ranking → 1.0
    assert s.score_in_order(np.array([2, 1, 0], np.float32)) == pytest.approx(1.0)
    # worst ranking of [0,1,2]: dcg = 0 + 1/log2(3) + 3/2; ideal = 3 + 1/log2(3)
    got = s.score_in_order(np.array([0, 1, 2], np.float32))
    want = (1 / np.log2(3) + 3 / 2) / (3 + 1 / np.log2(3))
    assert got == pytest.approx(want, rel=1e-5)


def test_ndcg_all_zero_labels_is_zero():
    s = MetricScorer("NDCG", 10)
    assert s.score_in_order(np.zeros(5, np.float32)) == 0.0


def test_map_hand():
    s = MetricScorer("MAP")
    # rel at ranks 1 and 3: AP = (1/1 + 2/3)/2
    got = s.score_in_order(np.array([1, 0, 1, 0], np.float32))
    assert got == pytest.approx((1 + 2 / 3) / 2, rel=1e-6)


def test_precision_hand():
    s = MetricScorer("P", 2)
    assert s.score_in_order(np.array([1, 0, 1, 1], np.float32)) == pytest.approx(0.5)


def test_rr_hand():
    s = MetricScorer("RR", 10)
    assert s.score_in_order(np.array([0, 0, 1, 1], np.float32)) == pytest.approx(1 / 3)
    assert s.score_in_order(np.array([0, 0, 0], np.float32)) == 0.0


def test_err_hand():
    s = MetricScorer("ERR", 10, gmax=4)
    labels = np.array([4, 0, 2], np.float32)
    assert s.score_in_order(labels) == pytest.approx(np_err(labels, 10), rel=1e-5)


def test_factory_strings():
    assert create_scorer("NDCG@10").name == "NDCG@10"
    assert create_scorer("map").name == "MAP"
    assert create_scorer("err@5").metric == "ERR"
    assert create_scorer("P@3").k == 3


# ---------------------------------------------------------------------------
# oracle sweep over random lists (including ties, all-zero, shorter than k)


@pytest.mark.parametrize("metric", list(ORACLES))
@pytest.mark.parametrize("k", [3, 10, 0])
def test_score_matches_oracle(metric, k):
    if metric == "MAP" and k != 0:
        pytest.skip("MAP ignores k")
    rng = np.random.default_rng(42)
    scorer = MetricScorer(metric, k)
    for trial in range(12):
        n = int(rng.integers(1, 15))
        labels = rng.integers(0, 4, size=n).astype(np.float32)
        got = scorer.score_in_order(labels)
        want = ORACLES[metric](list(labels), k)
        assert got == pytest.approx(want, rel=1e-5, abs=1e-6), (metric, k, labels)


# ---------------------------------------------------------------------------
# swap-delta matrices vs brute force


@pytest.mark.parametrize("metric", list(ORACLES))
@pytest.mark.parametrize("k", [3, 10])
def test_swap_deltas_match_bruteforce(metric, k):
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    scorer = MetricScorer(metric, k)
    oracle = ORACLES[metric]
    for trial in range(8):
        n = int(rng.integers(2, 13))
        labels = rng.integers(0, 4, size=n).astype(np.float32)
        D = n + 3  # exercise padding
        L = np.zeros((1, D), np.float32)
        L[0, :n] = labels
        deltas = np.asarray(scorer.swap_deltas(jnp.asarray(L), jnp.asarray([n])))[0]
        base = oracle(list(labels), k)
        for i in range(D):
            for j in range(D):
                if i >= n or j >= n or i == j:
                    assert deltas[i, j] == pytest.approx(0.0, abs=1e-5)
                    continue
                swapped = list(labels)
                swapped[i], swapped[j] = swapped[j], swapped[i]
                want = oracle(swapped, k) - base
                assert deltas[i, j] == pytest.approx(want, rel=1e-4, abs=1e-5), (
                    metric, k, labels, i, j)


def test_swap_symmetry_and_zero_diag():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    labels = rng.integers(0, 5, size=9).astype(np.float32)[None, :]
    for metric in ORACLES:
        s = MetricScorer(metric, 5)
        d = np.asarray(s.swap_deltas(jnp.asarray(labels), jnp.asarray([9])))[0]
        assert np.allclose(d, d.T, atol=1e-5), metric
        assert np.allclose(np.diag(d), 0.0, atol=1e-6), metric


def test_score_from_scores_stable_ties():
    """Equal scores keep original order (MergeSorter stability contract)."""
    import jax.numpy as jnp

    s = MetricScorer("NDCG", 10)
    labels = jnp.asarray([[2.0, 0.0, 1.0]])
    scores = jnp.asarray([[1.0, 1.0, 1.0]])  # all tied → original order kept
    mask = jnp.ones((1, 3), bool)
    got = float(s.score_from_scores(labels, scores, mask)[0])
    want = np_ndcg([2, 0, 1], 10)
    assert got == pytest.approx(want, rel=1e-6)


@pytest.mark.parametrize("metric", [m for m in ORACLES if m != "MAP"])
def test_topk_fast_path_matches_full_sort(metric):
    """score_from_scores' lax.top_k path (k < D) must agree bit-for-bit
    with the full stable-sort path, including score ties."""
    import jax.numpy as jnp
    from ranklib_tpu.ops.sorting import rank_labels

    rng = np.random.default_rng(11)
    for k in (1, 3, 5):
        scorer = MetricScorer(metric, k)
        for trial in range(6):
            B, D = 4, int(rng.integers(k + 1, 20))
            labels = rng.integers(0, 4, size=(B, D)).astype(np.float32)
            # quantized scores force plenty of ties
            scores = np.round(rng.random((B, D)).astype(np.float32) * 4) / 4
            n = rng.integers(1, D + 1, size=B)
            mask = np.arange(D)[None, :] < n[:, None]
            labels[~mask] = 0
            Lj, sj, mj = jnp.asarray(labels), jnp.asarray(scores), jnp.asarray(mask)
            fast = np.asarray(scorer.score_from_scores(Lj, sj, mj))
            nn = jnp.asarray(n.astype(np.int32))
            slow = np.asarray(scorer._score(rank_labels(Lj, sj, mj), nn))
            assert np.allclose(fast, slow, atol=1e-6), (metric, k, trial)


def test_err_swap_finite_with_labels_above_gmax():
    """R == 1 exactly (binary labels under -gmax 0) made the closed-form
    ratio 0/0 -> NaN lambdas from round one; the sign-preserving
    denominator floor keeps every delta finite, in BOTH the sorted and
    the sort-free ERR paths (review finding, round 5)."""
    import jax.numpy as jnp

    from ranklib_tpu.metrics.scorers import err_swap
    from ranklib_tpu.gbdt.lambdas import (
        lambda_weights, lambda_weights_nosort_err,
    )
    from ranklib_tpu.metrics.base import create_scorer

    L = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    d = np.asarray(err_swap(L, jnp.asarray([4]), 10, gmax=0.0))
    assert np.isfinite(d).all()
    scorer = create_scorer("ERR@10", gmax=0.0)
    scores = jnp.asarray([[0.5, 1.5, -0.5, 0.2]])
    mask = jnp.asarray([[True, True, True, True]])
    lam_a, w_a = lambda_weights(scorer, L, scores, mask)
    lam_b, w_b = lambda_weights_nosort_err(scorer, L, scores, mask)
    assert np.isfinite(np.asarray(lam_a)).all()
    assert np.isfinite(np.asarray(lam_b)).all()
    np.testing.assert_allclose(np.asarray(lam_a), np.asarray(lam_b),
                               rtol=1e-4, atol=1e-6)


def test_best_swap_padded_row_is_zero():
    """A fully-padded row (n = 0) must produce an all-ZERO swap matrix
    like every other swap_fn — (-inf - -inf) * 0 read NaN and batched
    pad-row consumers multiply by masks (review finding, round 5)."""
    import jax.numpy as jnp

    from ranklib_tpu.metrics.scorers import best_swap

    d = np.asarray(best_swap(jnp.zeros((2, 5)), jnp.asarray([0, 3]), 10))
    assert np.isfinite(d).all()
    np.testing.assert_array_equal(d[0], 0.0)
