"""Fused forest-eval Pallas kernels vs the XLA scan path.

On CPU the kernels run in TPU-interpret mode; on hardware the same code
compiles to Mosaic. The XLA `_mm_eval` scan is the reference — itself
pinned against pointer traversal in test_gbdt.py.
"""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import __graft_entry__ as g
from ranklib_tpu.gbdt.ensemble import TreeEnsemble, _mm_eval
from ranklib_tpu.ops.forest_eval import (forest_eval_pallas,
                                         forest_eval_pallas_full)


def _case(n_trees, n_leaves, n_features, n_docs, seed):
    rng = np.random.default_rng(seed)
    ens = g._synthetic_ensemble(n_trees=n_trees, n_leaves=n_leaves,
                                n_features=n_features, rng=rng)
    X = jnp.asarray(rng.normal(size=(n_docs, n_features)).astype(np.float32))
    packed = ens._pack_matmul(n_features)
    return ens, X, packed


def test_full_kernel_matches_xla_scan():
    _, X, packed = _case(50, 10, 20, 300, seed=7)
    want = np.asarray(_mm_eval(X, *packed))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(forest_eval_pallas_full(X, *packed))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_full_kernel_odd_shapes():
    # non-multiple-of-16 trees (chunk padding), odd leaves/features/docs
    _, X, packed = _case(23, 7, 13, 257, seed=11)
    want = np.asarray(_mm_eval(X, *packed))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(forest_eval_pallas_full(X, *packed))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_epilogue_kernel_matches_xla_scan():
    _, X, packed = _case(50, 10, 20, 300, seed=7)
    fid_full, thr_full, PmQc, csQc, plenc, outwc = packed
    want = np.asarray(_mm_eval(X, *packed))
    valsT = jnp.take(X.T, fid_full, axis=0)
    predT = (valsT <= thr_full[:, None]).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(forest_eval_pallas(predT, PmQc, csQc, plenc,
                                            outwc))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_eval_matrix_kernel_route(monkeypatch):
    # force the kernel route off-TPU (interpret mode) through the real
    # eval_matrix entry, including the chunked path
    ens, X, packed = _case(37, 7, 12, 600, seed=3)
    Xn = np.asarray(X)
    want = ens.eval_matrix(Xn)                    # XLA route on CPU
    monkeypatch.setattr(TreeEnsemble, "_use_forest_kernel",
                        lambda self, n_features: True)
    monkeypatch.setattr(TreeEnsemble, "_EVAL_CHUNK_KERNEL", 256)
    with pltpu.force_tpu_interpret_mode():
        got = ens.eval_matrix(Xn)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_vmem_guard_rejects_large_shapes(monkeypatch):
    # Pretend to be on TPU: a small model fits the VMEM budget, a deep
    # -leaf model (ADVICE r1: e.g. 500 leaves) must fall back to XLA.
    import ranklib_tpu.utils.backend as backend
    monkeypatch.setattr(backend, "on_tpu", lambda: True)
    small, _, _ = _case(50, 10, 20, 64, seed=5)
    assert small._use_forest_kernel(136)
    big, _, _ = _case(4, 500, 20, 64, seed=5)
    assert not big._use_forest_kernel(136)
    # env kill switch still wins
    monkeypatch.setenv("RANKLIB_TPU_FOREST_KERNEL", "0")
    assert not small._use_forest_kernel(136)


def test_bins_kernel_matches_xla_scan():
    from ranklib_tpu.ops.forest_eval import forest_eval_pallas_bins

    ens, X, packed = _case(50, 10, 20, 300, seed=7)
    want = np.asarray(_mm_eval(X, *packed))
    *binpack, n_grid = ens._pack_matmul_bins(20)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(forest_eval_pallas_bins(X, *binpack, n_grid=n_grid))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_bins_kernel_exact_at_split_boundaries():
    """Docs sitting EXACTLY on split thresholds — where bf16-rounded
    selection historically misrouted — must route identically to the
    f32 compare."""
    from ranklib_tpu.ops.forest_eval import forest_eval_pallas_bins

    rng = np.random.default_rng(13)
    ens, _, _ = _case(23, 7, 13, 8, seed=11)
    # build docs whose feature values ARE the model's thresholds
    thrs = np.concatenate([t.threshold[~t.is_leaf] for t in ens.trees])
    X = rng.normal(size=(512, 13)).astype(np.float32)
    flat = X.reshape(-1)
    pick = rng.integers(0, len(thrs), size=len(flat) // 2)
    flat[: len(pick)] = thrs[pick]
    X = jnp.asarray(flat.reshape(512, 13))
    packed = ens._pack_matmul(13)
    want = np.asarray(_mm_eval(X, *packed))
    *binpack, n_grid = ens._pack_matmul_bins(13)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(forest_eval_pallas_bins(X, *binpack, n_grid=n_grid))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_serving_gates_reject_hostile_shapes(monkeypatch):
    """The VMEM/width gates route a -leaf 500 model and an oversized-grid
    model OFF the fused kernels (pinned here with on_tpu forced True;
    the on-chip probe tools/exp_round4_tpu.py verified the same shapes
    serve exactly through the fallback)."""
    import numpy as np

    import ranklib_tpu.gbdt.ensemble as ens_mod
    from __graft_entry__ import _synthetic_ensemble

    monkeypatch.setattr(ens_mod, "on_tpu", lambda: True, raising=False)
    import ranklib_tpu.utils.backend as backend
    monkeypatch.setattr(backend, "on_tpu", lambda: True)

    rng = np.random.default_rng(0)
    big = _synthetic_ensemble(n_trees=50, n_leaves=500, n_features=136,
                              rng=rng)
    assert not big._use_forest_kernel(136)
    assert not big._use_bins_kernel(136)

    ok = _synthetic_ensemble(n_trees=100, n_leaves=10, n_features=136,
                             rng=rng)
    for t in ok.trees:                     # modest grid -> bins eligible
        t.threshold = np.round(t.threshold * 16.0) / 16.0
    assert ok._use_bins_kernel(136)


def test_forest_kernel_gate_rejects_extreme_thresholds(monkeypatch):
    """forest_eval_pallas_full clamps features to ±3e38 (NaN → +3e38),
    which is exact only while every split threshold is in [−3e38, 3e38):
    a threshold in (3e38, 3.4e38] would compare differently against a
    clamped feature or the NaN sentinel (review finding, round 5). Models
    with such thresholds must route OFF the 3-plane kernel."""
    import ranklib_tpu.utils.backend as backend
    monkeypatch.setattr(backend, "on_tpu", lambda: True)

    ens, _, _ = _case(50, 10, 20, 64, seed=5)
    assert ens._thr_band_ok()
    assert ens._use_forest_kernel(136)

    hostile, _, _ = _case(50, 10, 20, 64, seed=5)
    t0 = hostile.trees[0]
    node = int(np.flatnonzero(~t0.is_leaf)[0])
    t0.threshold[node] = np.float32(3.2e38)
    hostile._thr_band = None                     # direct mutation: reset
    assert not hostile._thr_band_ok()
    assert not hostile._use_forest_kernel(136)
    # the exact fallback still scores such a model (XLA f32 compares);
    # un-force on_tpu so eval_matrix doesn't try real Pallas on CPU
    monkeypatch.setattr(backend, "on_tpu", lambda: False)
    X = np.full((4, 20), 3.3e38, np.float32)
    X[1] = np.nan
    got = hostile.eval_matrix(X)
    want = np.asarray(_mm_eval(jnp.asarray(X),
                               *hostile._pack_matmul(20)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # add() invalidates the cached verdict
    grown, _, _ = _case(5, 6, 20, 64, seed=9)
    assert grown._thr_band_ok()
    bad_t = grown.trees[0]
    import copy
    bt = copy.deepcopy(bad_t)
    bnode = int(np.flatnonzero(~bt.is_leaf)[0])
    bt.threshold[bnode] = np.float32(-3.3e38)
    grown.add(bt, 1.0)
    assert not grown._thr_band_ok()


def test_frombins_kernel_matches_xla_scan():
    """Host-binned serving input (uint8/int16 upload path): binning docs
    on the host with the kernel prologue's rule (#{grid < x}, NaN ->
    n_grid) and running the selection-only kernel must match the dense
    f32 compare exactly -- including docs sitting ON thresholds and NaN
    features (dense: NaN <= t == False, routed right)."""
    from ranklib_tpu.gbdt.binning import bin_features
    from ranklib_tpu.ops.forest_eval import forest_eval_pallas_frombins

    rng = np.random.default_rng(7)
    ens, X, packed = _case(50, 10, 20, 300, seed=7)
    Xn = np.asarray(X).copy()
    thrs = np.concatenate([t.threshold[~t.is_leaf] for t in ens.trees])
    Xn[::7, 4] = thrs[rng.integers(0, len(thrs), size=len(Xn[::7, 4]))]
    Xn[::17, 3] = np.nan
    want = np.asarray(_mm_eval(jnp.asarray(Xn), *ens._pack_matmul(20)))
    _g, fid_full, nodebin, PmQc, csQc, plenc, outwc, n_grid = (
        ens._pack_matmul_bins(20))
    assert n_grid < 256                    # uint8 leg must be exercisable
    bins = bin_features(Xn, ens._model_grid_np(20))
    bins[np.isnan(Xn)] = n_grid
    for dt in (np.uint8, np.int16):
        binsT = jnp.asarray(np.ascontiguousarray(bins.astype(dt).T))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(forest_eval_pallas_frombins(
                binsT, fid_full, nodebin, PmQc, csQc, plenc, outwc))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_eval_matrix_hostbin_route(monkeypatch):
    # the real eval_matrix entry through the host-binned route,
    # including chunking and the NaN fix
    ens, X, packed = _case(37, 7, 12, 600, seed=3)
    Xn = np.asarray(X).copy()
    Xn[5, 2] = np.nan
    monkeypatch.setenv("RANKLIB_TPU_SERVE_HOSTBIN", "0")
    want = ens.eval_matrix(Xn)                    # XLA route on CPU
    monkeypatch.setenv("RANKLIB_TPU_SERVE_HOSTBIN", "1")
    monkeypatch.setattr(TreeEnsemble, "_use_bins_kernel",
                        lambda self, n_features: True)
    monkeypatch.setattr(TreeEnsemble, "_EVAL_CHUNK_KERNEL", 256)
    with pltpu.force_tpu_interpret_mode():
        got = ens.eval_matrix(Xn)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_eval_matrix_hostbin_int16_grid(monkeypatch):
    """n_grid == 256 exactly: the int16 upload leg. Bin ids can reach 256
    (above-every-threshold and NaN docs) which uint8 cannot hold -- the
    device-storage-narrowing footgun class pinned in CLAUDE.md."""
    from __graft_entry__ import _synthetic_ensemble

    rng = np.random.default_rng(5)
    ens = _synthetic_ensemble(n_trees=60, n_leaves=6, n_features=12,
                              rng=rng)
    pool = np.linspace(-2.0, 2.0, 256).astype(np.float32)
    i = 0
    for t in ens.trees:                  # every split on feature 0,
        for n in np.flatnonzero(~t.is_leaf):   # 256 distinct thresholds
            t.feature[n] = 0
            t.threshold[n] = pool[i % 256]
            i += 1
    Xn = rng.normal(size=(400, 12)).astype(np.float32)
    Xn[7, 0] = 5.0                       # above every grid value -> 256
    Xn[11, 0] = np.nan                   # NaN -> 256 (routed right)
    monkeypatch.setenv("RANKLIB_TPU_SERVE_HOSTBIN", "0")
    want = ens.eval_matrix(Xn)                    # XLA route on CPU
    assert ens._pack_matmul_bins(12)[-1] == 256
    monkeypatch.setenv("RANKLIB_TPU_SERVE_HOSTBIN", "1")
    monkeypatch.setattr(TreeEnsemble, "_use_bins_kernel",
                        lambda self, n_features: True)
    with pltpu.force_tpu_interpret_mode():
        got = ens.eval_matrix(Xn)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_full_kernel_inf_features_route_like_f32():
    """±inf features: the 3-plane bf16 split used to produce NaN planes
    (hi − hi) and route −inf RIGHT, while the f32 compare routes it LEFT
    (review finding — inputs clamp to ±3e38 now; NaN stays right)."""
    from ranklib_tpu.ops.forest_eval import forest_eval_pallas_full

    ens, X, packed = _case(23, 7, 13, 64, seed=2)
    Xn = np.asarray(X).copy()
    Xn[3, 5] = -np.inf
    Xn[7, 1] = np.inf
    Xn[9, 0] = np.nan
    want = np.asarray(_mm_eval(jnp.asarray(Xn), *packed))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(forest_eval_pallas_full(jnp.asarray(Xn), *packed))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
