"""Pallas histogram kernel vs the XLA segment-sum reference path.

On CPU the kernel runs in TPU-interpret mode; on real TPU hardware the
same test exercises the compiled kernel. Agreement must be exact for
counts and ~1e-5 for float sums (different accumulation orders).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ranklib_tpu.ops.histogram import (
    hist_multi_pallas, hist_multi_xla, hist_pallas, hist_xla,
)


def jnp_arr(x):
    return jnp.asarray(x)


def _case(N, F, B, seed, mask_frac=0.3):
    rng = np.random.default_rng(seed)
    binned_T = rng.integers(0, B, size=(F, N)).astype(np.int32)
    grad = rng.normal(size=N).astype(np.float32)
    mask = rng.random(N) > mask_frac
    return binned_T, grad, mask


def _run_pallas(binned, grad, mask, B):
    if jax.default_backend() in ("tpu", "axon"):
        return np.asarray(hist_pallas(binned, grad, mask, B))
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(hist_pallas(binned, grad, mask, B))


@pytest.mark.parametrize("N,F,B", [
    (512, 8, 8),          # aligned tiny
    (300, 6, 8),          # unaligned docs + features
    (1024, 17, 128),      # odd feature count, wide bins
    (700, 9, 256),        # default bin width
])
def test_pallas_matches_xla(N, F, B):
    binned, grad, mask = _case(N, F, B, seed=N + F)
    want = np.asarray(hist_xla(binned, grad, mask, B))
    got = _run_pallas(binned, grad, mask, B)
    assert got.shape == want.shape == (F, B, 2)
    np.testing.assert_array_equal(got[..., 1], want[..., 1])      # counts exact
    np.testing.assert_allclose(got[..., 0], want[..., 0], atol=2e-4, rtol=1e-5)


def test_all_masked_gives_zero():
    binned, grad, _ = _case(256, 4, 8, seed=0)
    mask = np.zeros(256, bool)
    got = _run_pallas(binned, grad, mask, 8)
    assert (got == 0).all()


def test_out_of_range_bins_ignored_by_xla_path():
    binned_T = np.array([[0, 7, 8, 9]], np.int32)       # 8,9 out of range
    grad = np.ones(4, np.float32)
    mask = np.ones(4, bool)
    h = np.asarray(hist_xla(jnp_arr(binned_T), grad, mask, 8))
    assert h[0, 0, 1] == 1 and h[0, 7, 1] == 1
    assert h[..., 1].sum() == 2


@pytest.mark.parametrize("C", [1, 3, 8])
def test_multi_bag_kernel_matches_per_bag(C):
    """The 2C-row batched kernel (RF lockstep bags) == C independent
    2-row histograms, channel for channel."""
    rng = np.random.default_rng(11 + C)
    N, F, B = 900, 7, 128
    binned = jnp.asarray(rng.integers(0, B, size=(F, N)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(C, N)).astype(np.float32))
    w = jnp.asarray(rng.integers(0, 3, size=(C, N)).astype(np.float32))
    if jax.default_backend() in ("tpu", "axon"):
        got = np.asarray(hist_multi_pallas(binned, grads, w, B))
    else:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(hist_multi_pallas(binned, grads, w, B))
    assert got.shape == (C, F, B, 2)
    for c in range(C):
        want = np.asarray(hist_xla(binned, grads[c], w[c], B))
        np.testing.assert_array_equal(got[c, ..., 1], want[..., 1])
        np.testing.assert_allclose(got[c, ..., 0], want[..., 0],
                                   atol=2e-4, rtol=1e-5)


def test_multi_bag_xla_matches_per_bag():
    rng = np.random.default_rng(2)
    N, F, B, C = 400, 5, 16, 4
    binned = jnp.asarray(rng.integers(0, B, size=(F, N)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(C, N)).astype(np.float32))
    w = jnp.asarray((rng.random((C, N)) > 0.3).astype(np.float32))
    got = np.asarray(hist_multi_xla(binned, grads, w, B))
    for c in range(C):
        want = np.asarray(hist_xla(binned, grads[c], w[c], B))
        np.testing.assert_allclose(got[c], want, atol=1e-5)


def test_subtraction_trick_property():
    """parent_hist − right_child_hist == left_child_hist computed directly
    (the reference's FeatureHistogram construct-from-parent/sibling)."""
    rng = np.random.default_rng(7)
    N, F, B = 512, 5, 8
    binned_T = rng.integers(0, B, size=(F, N)).astype(np.int32)
    grad = rng.normal(size=N).astype(np.float32)
    parent = rng.random(N) > 0.2                   # parent members
    right = parent & (rng.random(N) > 0.5)
    left = parent & ~right
    hp = np.asarray(hist_xla(jnp.asarray(binned_T), grad, parent, B))
    hr = np.asarray(hist_xla(jnp.asarray(binned_T), grad, right, B))
    hl = np.asarray(hist_xla(jnp.asarray(binned_T), grad, left, B))
    np.testing.assert_allclose(hp - hr, hl, atol=1e-4)


@pytest.mark.parametrize("N,F", [(512, 8), (700, 9), (1000, 17)])
def test_radix_kernel_matches_xla(N, F):
    """The radix-16 kernel (hi/lo nibble factorization on the MXU) must
    agree with the segment-sum reference at B=256, its specialization."""
    from ranklib_tpu.ops.histogram import hist_pallas_radix

    binned, grad, mask = _case(N, F, 256, seed=N + F)
    want = np.asarray(hist_xla(jnp_arr(binned), grad, mask, 256))
    if jax.default_backend() in ("tpu", "axon"):
        got = np.asarray(hist_pallas_radix(jnp_arr(binned), grad, mask, 256))
    else:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(hist_pallas_radix(jnp_arr(binned), grad, mask, 256))
    assert got.shape == want.shape == (F, 256, 2)
    np.testing.assert_array_equal(got[..., 1], want[..., 1])
    np.testing.assert_allclose(got[..., 0], want[..., 0], atol=2e-4, rtol=1e-5)


def test_radix_kernel_all_masked_and_padding_bins():
    from ranklib_tpu.ops.histogram import hist_pallas_radix

    binned, grad, _ = _case(300, 5, 256, seed=1)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(hist_pallas_radix(
            jnp_arr(binned), grad, np.zeros(300, bool), 256))
    assert (got == 0).all()


def test_split_scan_kernel_matches_xla():
    """Fused Pallas split-scan (interpret mode) vs the XLA reference:
    identical picks on random histograms, incl. mls filtering, feature
    masks, empty (all-zero) children, and the feature-major tie order."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from ranklib_tpu.ops.split_scan import (
        _scan_rows_pallas, best_splits_xla,
    )

    rng = np.random.default_rng(5)
    for trial in range(4):
        Cn, F, B = 2, 7, 256
        counts = rng.integers(0, 5, (Cn, F, B)).astype(np.float64)
        counts[:] = counts[:, :1, :]        # every feature bins every doc
        sums = rng.normal(size=(Cn, F, B)) * counts.astype(bool)
        if trial == 2:
            counts[1] = 0                    # empty child
            sums[1] = 0
        hist = jnp.asarray(np.stack([sums, counts], axis=-1), jnp.float32)
        mls = [1.0, 3.0, 1.0, 2.0][trial]
        want = best_splits_xla(hist, mls)
        hs = hist[..., 0].reshape(Cn * F, B)
        hc = hist[..., 1].reshape(Cn * F, B)
        with pltpu.force_tpu_interpret_mode():
            g_row, b_row = _scan_rows_pallas(hs, hc, mls)
        g = np.asarray(g_row).reshape(Cn, F)
        b = np.asarray(b_row).reshape(Cn, F)
        f_best = np.argmax(g, axis=1)
        for c in range(Cn):
            if np.isfinite(want[0][c]):
                np.testing.assert_allclose(g[c, f_best[c]], want[0][c],
                                           rtol=1e-5)
                assert f_best[c] == int(want[1][c]), trial
                assert b[c, f_best[c]] == int(want[2][c]), trial
            else:
                assert not np.isfinite(g[c]).any()


def test_bins_dtype_invariance():
    """uint8 / int16 / int32 bin matrices produce identical histograms
    and identical trees. Pins the weak-literal footgun: `uint8 < 256`
    casts the literal INTO uint8 (wrapping to 0) and silently zeroed the
    hist_xla keep mask when uint8 device storage landed."""
    import jax.numpy as jnp
    import numpy as np

    from ranklib_tpu.gbdt.grow import grow_tree
    from ranklib_tpu.ops.histogram import hist_xla

    rng = np.random.default_rng(0)
    bt32 = jnp.asarray(rng.integers(0, 256, (5, 500)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(500,)), jnp.float32)
    m = jnp.asarray(rng.random(500) < 0.9)
    ref_h = hist_xla(bt32, g, m, 256)
    ref_t = grow_tree(bt32, g, n_bins=256, n_leaves=4, doc_mask=m)
    for dt in (jnp.uint8, jnp.int16):
        bt = bt32.astype(dt)
        np.testing.assert_array_equal(hist_xla(bt, g, m, 256), ref_h)
        t = grow_tree(bt, g, n_bins=256, n_leaves=4, doc_mask=m)
        np.testing.assert_array_equal(t.feature, ref_t.feature)
        np.testing.assert_array_equal(t.bin, ref_t.bin)
        np.testing.assert_array_equal(t.node_of_doc, ref_t.node_of_doc)
