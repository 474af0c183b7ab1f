"""Distributed data-parallel training step on a virtual 8-device CPU mesh
(SURVEY.md §4: the standard trick for multi-device tests without a slice).

Key property: the psum'd distributed grower must produce EXACTLY the same
tree as the single-device grower on the same data — split decisions
replicate deterministically.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ranklib_tpu.gbdt.binning import bin_features, compute_thresholds
from ranklib_tpu.gbdt.grow import grow_tree, leaf_outputs
from ranklib_tpu.gbdt.lambdas import lambda_weights
from ranklib_tpu.metrics.base import create_scorer
from ranklib_tpu.parallel.dist import make_mesh, make_train_step, shard_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _toy_batch(n_dev=8, B_per=2, D=16, F=6, seed=0):
    rng = np.random.default_rng(seed)
    B = n_dev * B_per
    feats = rng.normal(size=(B * D, F)).astype(np.float32)
    thresholds, _ = compute_thresholds(feats, 16)
    binned = bin_features(feats, thresholds)
    labels = rng.integers(0, 3, size=(B, D)).astype(np.float32)
    mask = np.ones((B, D), dtype=bool)
    mask[:, 13:] = False
    labels[~mask] = 0.0
    return binned.reshape(B, D, F), labels, mask, thresholds.shape[1]


def test_distributed_tree_matches_single_device():
    binned, labels, mask, n_bins = _toy_batch()
    B, D, F = binned.shape
    scorer = create_scorer("NDCG@10")
    scores0 = np.zeros((B, D), np.float32)

    # single-device reference
    lam, w = lambda_weights(scorer, jnp.asarray(labels),
                            jnp.asarray(scores0), jnp.asarray(mask))
    g = np.asarray(lam).reshape(-1)
    ww = np.asarray(w).reshape(-1)
    dm = mask.reshape(-1)
    tree1 = grow_tree(jnp.asarray(binned.reshape(-1, F).T), jnp.asarray(g),
                      n_bins=n_bins, n_leaves=4, doc_mask=jnp.asarray(dm))
    out1 = leaf_outputs(tree1.node_of_doc, jnp.asarray(g), jnp.asarray(ww),
                        7, True, doc_mask=jnp.asarray(dm))

    # 8-device distributed
    mesh = make_mesh(8)
    step = make_train_step(scorer, n_bins=n_bins, n_leaves=4,
                           min_leaf_support=1, learning_rate=0.1, mesh=mesh)
    b, l, m, s = shard_batch(mesh, binned, labels, mask, scores0)
    new_scores, tree8, out8 = step(b, l, m, s)

    np.testing.assert_array_equal(np.asarray(tree1.feature),
                                  np.asarray(tree8.feature))
    np.testing.assert_array_equal(np.asarray(tree1.bin), np.asarray(tree8.bin))
    np.testing.assert_array_equal(np.asarray(tree1.left), np.asarray(tree8.left))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out8),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(tree1.node_of_doc), np.asarray(tree8.node_of_doc))

    # score update applied where masked
    ns = np.asarray(new_scores)
    expect = scores0 + 0.1 * np.asarray(out1)[np.asarray(tree1.node_of_doc)] \
        .reshape(B, D)
    expect[~mask] = 0.0
    np.testing.assert_allclose(ns, expect, rtol=1e-4, atol=1e-5)


def test_two_distributed_rounds_improve_metric():
    binned, labels, mask, n_bins = _toy_batch(seed=1)
    B, D, F = binned.shape
    scorer = create_scorer("NDCG@10")
    mesh = make_mesh(8)
    step = make_train_step(scorer, n_bins=n_bins, n_leaves=4,
                           min_leaf_support=1, learning_rate=0.3, mesh=mesh)
    b, l, m, s = shard_batch(mesh, binned, labels, mask,
                             np.zeros((B, D), np.float32))

    def metric(sc):
        n = jnp.asarray(mask).sum(-1).astype(jnp.int32)
        return float(scorer.score_from_scores(
            jnp.asarray(labels), jnp.asarray(sc), jnp.asarray(mask)).mean())

    m0 = metric(np.asarray(s))
    for _ in range(3):
        s, _, _ = step(b, l, m, s)
    m3 = metric(np.asarray(s))
    assert m3 >= m0


def test_mesh_fit_matches_single_device():
    """LambdaMART.fit(mesh=...) — the PRODUCT distributed path — must give
    the same model quality as single-device training on the same data."""
    from ranklib_tpu.models.gbdt import LambdaMART
    from tests.fixtures import synth_dataset

    train = synth_dataset(n_queries=32, n_features=6, min_docs=8,
                          max_docs=24, seed=9, w_seed=4, signal=3.0)
    scorer = create_scorer("NDCG@10")

    single = LambdaMART(n_trees=5, n_leaves=4, learning_rate=0.2)
    single.fit(train, scorer)
    m_single = single.score_metric(train, scorer)

    dist = LambdaMART(n_trees=5, n_leaves=4, learning_rate=0.2)
    dist.fit(train, scorer, mesh=make_mesh(8))
    m_dist = dist.score_metric(train, scorer)

    assert len(dist.ensemble) == 5
    # same algorithm, psum'd stats: quality must match closely (float
    # reduction order may flip near-tied splits)
    assert abs(m_dist - m_single) < 0.03
    assert m_dist > 0.8


def test_mesh_fit_with_validation_early_stop():
    from ranklib_tpu.models.gbdt import LambdaMART
    from tests.fixtures import synth_dataset

    train = synth_dataset(n_queries=32, n_features=6, min_docs=8,
                          max_docs=24, seed=9, w_seed=4, signal=3.0)
    val = synth_dataset(n_queries=16, n_features=6, min_docs=8,
                        max_docs=24, seed=10, w_seed=4, signal=3.0)
    scorer = create_scorer("NDCG@10")
    r = LambdaMART(n_trees=10, n_leaves=4, learning_rate=0.3, early_stop=3)
    r.fit(train, scorer, validation=val, mesh=make_mesh(8))
    assert 1 <= len(r.ensemble) <= 10
    assert r.score_metric(val, scorer) > 0.7


def test_multiprocess_distributed_smoke():
    """REAL multi-process (jax.distributed + Gloo) validation: two
    separate processes over a global 8-device mesh must grow the same
    tree as single-device (tools/multihost_smoke.py)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)     # the tool sets its own device count
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multihost_smoke.py")],
        env=env, cwd=repo, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST SMOKE: PASS" in out.stdout


@pytest.mark.parametrize("metric", ["ERR@10", "MAP"])
def test_mesh_fit_nonseparable_metrics_match_single_device(metric):
    """The DP product path reuses make_round_step, so the sort-free
    ERR/MAP lambda variants (prefix matvecs, gbdt/lambdas.py) run inside
    shard_map too — quality must match single-device training."""
    from ranklib_tpu.models.gbdt import LambdaMART
    from tests.fixtures import synth_dataset

    train = synth_dataset(n_queries=32, n_features=6, min_docs=8,
                          max_docs=24, seed=9, w_seed=4, signal=3.0)
    scorer = create_scorer(metric)

    single = LambdaMART(n_trees=5, n_leaves=4, learning_rate=0.2)
    single.fit(train, scorer)
    m_single = single.score_metric(train, scorer)

    dist = LambdaMART(n_trees=5, n_leaves=4, learning_rate=0.2)
    dist.fit(train, scorer, mesh=make_mesh(8))
    m_dist = dist.score_metric(train, scorer)

    assert len(dist.ensemble) == 5
    assert abs(m_dist - m_single) < 0.03


def test_mesh_fit_warm_start_resume():
    """-resume semantics on the mesh path: a prior ensemble seeds the
    sharded scores and only the remaining rounds train (review fix: the
    distributed path used to silently discard the warm start)."""
    from ranklib_tpu.models.gbdt import LambdaMART
    from tests.fixtures import synth_dataset

    train = synth_dataset(n_queries=24, n_features=6, min_docs=8,
                          max_docs=24, seed=21, w_seed=7, signal=3.0)
    scorer = create_scorer("NDCG@10")

    full = LambdaMART(n_trees=4, n_leaves=4, learning_rate=0.2)
    full.fit(train, scorer, mesh=make_mesh(8))

    part = LambdaMART(n_trees=2, n_leaves=4, learning_rate=0.2)
    part.fit(train, scorer, mesh=make_mesh(8))
    resumed = LambdaMART(n_trees=4, n_leaves=4, learning_rate=0.2)
    resumed.ensemble = part.ensemble
    resumed.fit(train, scorer, mesh=make_mesh(8))

    assert len(resumed.ensemble) == 4
    # the prior trees are carried verbatim...
    assert (resumed.ensemble.to_text().split("</tree>")[:2]
            == part.ensemble.to_text().split("</tree>")[:2])
    # ...and the continued rounds land in the same quality ballpark as a
    # straight-through run (seeded scores re-derive via the f32 eval path,
    # so later trees may differ in low-order bits)
    m_full = full.score_metric(train, scorer)
    m_res = resumed.score_metric(train, scorer)
    assert abs(m_full - m_res) < 0.05


def test_scaling_harness_mechanism():
    """The one-command scaling harness (VERDICT round-2 task 6) runs the
    full device-count ladder on the virtual CPU mesh: mechanism + sanity
    only — the ≥80% efficiency NUMBER needs real multi-host hardware
    (docs/SCALING.md holds the committed virtual-mesh table)."""
    import numpy as np

    from __graft_entry__ import scaling_harness

    rows = scaling_harness((1, 2, 4, 8), n_rounds=4, n_queries=48)
    assert [nd for nd, _ in rows] == [1, 2, 4, 8]
    assert all(np.isfinite(dt) and dt > 0 for _, dt in rows)


# ---- mesh DP for the non-tree rankers (parallel/dp.py) ---------------------

def _dp_fixture():
    from tests.fixtures import synth_dataset

    train = synth_dataset(n_queries=24, n_features=10, min_docs=5,
                          max_docs=30, seed=5, nonlinear=True)
    val = synth_dataset(n_queries=8, n_features=10, min_docs=5,
                        max_docs=30, seed=6, w_seed=5, nonlinear=True)
    return train, val


def test_rankboost_mesh_matches_single_device():
    """RankBoost -dp: psum'd Z/histogram/metric sums → the identical weak
    sequence; α within f32 reduction-order noise."""
    from ranklib_tpu.models.rankboost import RankBoost

    train, val = _dp_fixture()
    scorer = create_scorer("NDCG@10")
    r1 = RankBoost(n_rounds=30)
    r1.fit(train, scorer, val)
    r8 = RankBoost(n_rounds=30)
    r8.fit(train, scorer, val, mesh=make_mesh(8))
    assert len(r1.weaks) == len(r8.weaks) > 0
    for (f1, t1, a1), (f8, t8, a8) in zip(r1.weaks, r8.weaks):
        assert (f1, t1) == (f8, t8)
        assert abs(a1 - a8) < 1e-5


def test_adarank_mesh_matches_single_device():
    from ranklib_tpu.models.adarank import AdaRank

    train, val = _dp_fixture()
    scorer = create_scorer("NDCG@10")
    r1 = AdaRank(n_rounds=40)
    r1.fit(train, scorer, val)
    r8 = AdaRank(n_rounds=40)
    r8.fit(train, scorer, val, mesh=make_mesh(8))
    assert len(r1.history) == len(r8.history) > 0
    for (f1, a1), (f8, a8) in zip(r1.history, r8.history):
        assert f1 == f8
        assert abs(a1 - a8) < 1e-5


@pytest.mark.parametrize("cls_name", ["RankNet", "ListNet"])
def test_neural_mesh_one_device_bit_identical(cls_name):
    """A 1-device mesh reproduces the sequential no-mesh fit EXACTLY (the
    DP layout change is round-robin dealing, a no-op at n=1)."""
    import ranklib_tpu.models.neural as nn

    cls = getattr(nn, cls_name)
    train, val = _dp_fixture()
    scorer = create_scorer("NDCG@10")
    r1 = cls(n_epoch=15)
    r1.fit(train, scorer, val)
    rm = cls(n_epoch=15)
    rm.fit(train, scorer, val, mesh=make_mesh(1))
    for (W1, b1), (Wm, bm) in zip(r1.params, rm.params):
        np.testing.assert_array_equal(W1, Wm)
        np.testing.assert_array_equal(b1, bm)


def test_neural_mesh_minibatch_deterministic_and_learns():
    """8-device DP (synchronous minibatch of 8 queries/step — the
    documented departure from sequential SGD) is deterministic and
    reaches the planted signal."""
    from ranklib_tpu.metrics.base import score_dataset
    from ranklib_tpu.models.neural import RankNet

    train, val = _dp_fixture()
    scorer = create_scorer("NDCG@10")
    runs = []
    for _ in range(2):
        r = RankNet(n_epoch=30, learning_rate=0.001)
        r.fit(train, scorer, val, mesh=make_mesh(8))
        runs.append(r)
    for (Wa, ba), (Wb, bb) in zip(runs[0].params, runs[1].params):
        np.testing.assert_array_equal(Wa, Wb)
    m, _ = score_dataset(scorer, train, runs[0].eval_dataset(train))
    base = RankNet(n_epoch=0)
    base.fit(train, scorer)          # untouched init
    m0, _ = score_dataset(scorer, train, base.eval_dataset(train))
    assert m > m0 - 1e-6             # training never hurts on this data


def test_neural_dp_converged_quality_matches_sequential():
    """The documented neural DP departure (synchronous minibatch of n
    queries/step vs the reference's sequential per-query SGD) does not
    cost quality at convergence — VERDICT r04 weak #7. Measured
    2026-08-21 on a 64-query planted-signal fixture: RankNet 100 ep
    0.9162 (n=1) vs 0.9161 (n=8), 60 ep 0.8656 vs 0.8656; ListNet
    100 ep 0.7858 vs 0.7858. Band ±0.005 (the quality-gate
    tolerance)."""
    from ranklib_tpu.metrics.base import score_dataset
    from ranklib_tpu.models.neural import RankNet

    train, _ = _dp_fixture()
    scorer = create_scorer("NDCG@10")
    r1 = RankNet(n_epoch=60)
    r1.fit(train, scorer)
    m1, _ = score_dataset(scorer, train, r1.eval_dataset(train))
    r8 = RankNet(n_epoch=60)
    r8.fit(train, scorer, None, mesh=make_mesh(8))
    m8, _ = score_dataset(scorer, train, r8.eval_dataset(train))
    assert abs(m1 - m8) <= 0.005


def test_trainer_plumbs_dp_to_nontree_rankers():
    """-dp reaches RankBoost/AdaRank/neural through train_ranker (their
    fit now takes mesh)."""
    from ranklib_tpu.models.trainer import train_ranker

    train, _ = _dp_fixture()
    scorer = create_scorer("NDCG@10")
    for rtype in (1, 2, 3):
        r = train_ranker(rtype, train, scorer, None,
                         {"n_rounds": 5} if rtype in (2, 3)
                         else {"n_epoch": 5}, n_dp=8)
        assert r.eval_dataset(train) is not None


def test_coorascent_mesh_matches_single_device():
    """CoorAscent -dp: psum'd candidate totals → identical coordinate
    decisions (bit-identical weights on this fixture)."""
    from ranklib_tpu.models.coorascent import CoorAscent

    train, _ = _dp_fixture()
    scorer = create_scorer("NDCG@10")
    r1 = CoorAscent(n_restart=2, max_passes=3)
    r1.fit(train, scorer)
    r8 = CoorAscent(n_restart=2, max_passes=3)
    r8.fit(train, scorer, mesh=make_mesh(8))
    np.testing.assert_allclose(r8.weights, r1.weights, atol=1e-6)


def test_csr_datasets_train_under_mesh():
    """Narrow CSR (-sparse) datasets work under -dp: the sharders
    materialize per-query blocks on demand; results match the dense
    single-device fits (RankBoost weak sequence, RankNet params vs its
    own 8-dev dense run)."""
    import os
    import tempfile

    from tests.fixtures import synth_dataset
    from tests.test_sparse_csr import _write_sparse_letor
    from ranklib_tpu.data.sparse import read_letor_sparse
    from ranklib_tpu.models.neural import RankNet
    from ranklib_tpu.models.rankboost import RankBoost

    ds = synth_dataset(n_queries=16, n_features=9, min_docs=5, max_docs=20,
                       gmax=2, seed=77)
    path = tempfile.mktemp(suffix=".txt")
    _write_sparse_letor(ds, path)
    csr = read_letor_sparse(path, quiet=True)
    os.unlink(path)
    scorer = create_scorer("NDCG@10")

    rb1 = RankBoost(n_rounds=10)
    rb1.fit(csr, scorer)
    rb8 = RankBoost(n_rounds=10)
    rb8.fit(csr, scorer, mesh=make_mesh(8))
    assert [(f, t) for f, t, _ in rb1.weaks] == \
        [(f, t) for f, t, _ in rb8.weaks]

    # CSR+mesh vs DENSE+mesh (same minibatch semantics): pins that the
    # sharder materializes CSR queries identically to dense blocks
    from ranklib_tpu.data.letor import read_letor as _rd
    import tempfile as _tf
    from tests.fixtures import write_letor_text

    dpath = _tf.mktemp(suffix=".txt")
    write_letor_text(ds, dpath)
    # re-read BOTH representations from one file so values round-trip
    # through the same text precision
    dense = _rd(dpath, quiet=True)
    csr2 = read_letor_sparse(dpath, quiet=True)
    os.unlink(dpath)
    nn_dense = RankNet(n_epoch=4, learning_rate=0.001)
    nn_dense.fit(dense, scorer, mesh=make_mesh(8))
    nn_csr = RankNet(n_epoch=4, learning_rate=0.001)
    nn_csr.fit(csr2, scorer, mesh=make_mesh(8))
    for (Wa, _), (Wb, _) in zip(nn_dense.params, nn_csr.params):
        np.testing.assert_array_equal(Wa, Wb)


def test_rf_mesh_streamed_binned_matches_dense():
    """RF under a mesh with a STREAMED BinnedDataset (-ranker 8 -sparse
    -dp): the rebuild path must consume the dataset's grid/bins (each
    feats-free sampled bag rides ``prebinned``) and produce the same
    model text as the dense mesh fit."""
    import numpy as np

    from ranklib_tpu.data.binned import read_letor_binned
    from ranklib_tpu.data.letor import read_letor
    from ranklib_tpu.models.rf import RFRanker
    from ranklib_tpu.native.loader import native_available
    from tests.fixtures import synth_dataset, write_letor_text

    if not native_available():
        import pytest

        pytest.skip("native parser unavailable")
    import tempfile

    train = synth_dataset(n_queries=16, n_features=6, min_docs=6,
                          max_docs=14, seed=9, w_seed=4, signal=3.0)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t.txt"
        write_letor_text(train, path)
        dense = read_letor(path, quiet=True)
        bd = read_letor_binned(path, quiet=True)
    scorer = create_scorer("NDCG@10")
    kw = dict(n_bags=2, n_trees=2, n_leaves=3, ranker_type=0)
    r1 = RFRanker(**kw)
    r1.fit(dense, scorer, mesh=make_mesh(4))
    r2 = RFRanker(**kw)
    r2.fit(bd, scorer, mesh=make_mesh(4))
    assert r1.model_str() == r2.model_str()


def test_adarank_sparse_mesh_matches_single_device(tmp_path, monkeypatch):
    """-sparse -dp cross product (round-5 VERDICT task 6): the sharded
    sparse score layer (parallel/dp.py shard_sparse_data) must reproduce
    the single-device sparse fit — identical feature sequence, alpha
    within f32 reduction-order noise. Includes a DP-sharded validation
    set."""
    from ranklib_tpu.data.sparse import read_letor_sparse
    from ranklib_tpu.models.adarank import AdaRank
    from ranklib_tpu.ops.sparse_eval import wants_sparse_eval
    from tests.fixtures import synth_dataset, write_letor_text

    ds = synth_dataset(n_queries=24, n_features=10, min_docs=5,
                       max_docs=30, seed=5, nonlinear=True)
    p = str(tmp_path / "train.txt")
    write_letor_text(ds, p)
    csr = read_letor_sparse(p, quiet=True)
    val = synth_dataset(n_queries=8, n_features=10, min_docs=5,
                        max_docs=30, seed=6, w_seed=5, nonlinear=True)
    monkeypatch.setenv("RANKLIB_TPU_DEVICE_DENSE_MB", "0")
    assert wants_sparse_eval(csr)
    scorer = create_scorer("NDCG@10")
    r1 = AdaRank(n_rounds=20)
    r1.fit(csr, scorer, val)
    r8 = AdaRank(n_rounds=20)
    r8.fit(csr, scorer, val, mesh=make_mesh(8))
    assert len(r1.history) == len(r8.history) > 0
    for (f1, a1), (f8, a8) in zip(r1.history, r8.history):
        assert f1 == f8
        assert abs(a1 - a8) < 1e-5


def test_coorascent_sparse_mesh_matches_single_device(tmp_path,
                                                      monkeypatch):
    """CoorAscent -sparse -dp: the sharded COO candidate layer + psum'd
    metric totals must reproduce the single-device sparse sweep —
    near-identical weights (f32 reduction order differs)."""
    from ranklib_tpu.data.sparse import read_letor_sparse
    from ranklib_tpu.models.coorascent import CoorAscent
    from ranklib_tpu.ops.sparse_eval import wants_sparse_eval
    from tests.fixtures import synth_dataset, write_letor_text

    ds = synth_dataset(n_queries=24, n_features=10, min_docs=5,
                       max_docs=30, seed=5, nonlinear=True)
    p = str(tmp_path / "train.txt")
    write_letor_text(ds, p)
    csr = read_letor_sparse(p, quiet=True)
    monkeypatch.setenv("RANKLIB_TPU_DEVICE_DENSE_MB", "0")
    assert wants_sparse_eval(csr)
    scorer = create_scorer("NDCG@10")
    r1 = CoorAscent(n_restart=2, max_passes=3)
    r1.fit(csr, scorer)
    r8 = CoorAscent(n_restart=2, max_passes=3)
    r8.fit(csr, scorer, mesh=make_mesh(8))
    np.testing.assert_allclose(r8.weights, r1.weights, atol=2e-4)


def test_build_sharded_data_validation_bin_256_no_wrap():
    """Bin-dtype choice must cover VALIDATION bins: at default -tc 256
    train bins are 0..255 (uint8-eligible) but validation values above a
    feature's train max bin to 256 — a train-only max picked uint8 and
    the shard fill WRAPPED 256→0, silently left-routing those docs in
    every -dp validation traversal (review finding, round 5)."""
    from tests.fixtures import synth_dataset
    from ranklib_tpu.data.dataset import flatten
    from ranklib_tpu.gbdt.boost_dist import build_sharded_data

    train = synth_dataset(n_queries=8, n_features=4, min_docs=5,
                          max_docs=9, seed=3)
    val = synth_dataset(n_queries=4, n_features=4, min_docs=5,
                        max_docs=9, seed=4, w_seed=3)
    Nt = flatten(train)[0].shape[0]
    Nv = flatten(val)[0].shape[0]
    rng = np.random.default_rng(0)
    binned = rng.integers(0, 256, size=(Nt, 4)).astype(np.int32)
    binned[0] = 255                          # train max stays uint8-sized
    vbinned = rng.integers(0, 256, size=(Nv, 4)).astype(np.int32)
    vbinned[0] = 256                         # above-train-max bin id
    mesh = make_mesh(2)
    data, Npad, Nvpad = build_sharded_data(train, binned, 2,
                                           validation=val, vbinned=vbinned,
                                           mesh=mesh)
    v = np.asarray(data.vbinned)
    assert v.max() == 256                    # survived, did not wrap to 0
    assert np.asarray(data.binned_T).dtype == v.dtype
