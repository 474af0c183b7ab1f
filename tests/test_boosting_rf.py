"""RankBoost, AdaRank, Random Forests, Combiner: learning quality on
planted-signal data + model round-trips (the reference's de-facto test
protocol, SURVEY.md §4)."""

import numpy as np
import pytest

from ranklib_tpu.combiner import combine
from ranklib_tpu.metrics.base import create_scorer, score_dataset
from ranklib_tpu.models.adarank import AdaRank
from ranklib_tpu.models.base import load_ranker_file
from ranklib_tpu.models.rankboost import RankBoost
from ranklib_tpu.models.rf import RFRanker
from tests.fixtures import synth_dataset


@pytest.fixture(scope="module")
def data():
    train = synth_dataset(n_queries=20, n_features=8, min_docs=8, max_docs=20,
                          seed=5, w_seed=9, signal=3.0)
    test = synth_dataset(n_queries=10, n_features=8, min_docs=8, max_docs=20,
                         seed=6, w_seed=9, signal=3.0)
    return train, test


def _file_order_metric(ds, scorer):
    zeros = [np.zeros(q.n, np.float32) for q in ds.queries]
    return score_dataset(scorer, ds, zeros)[0]


def test_rankboost_learns_and_roundtrips(tmp_path, data):
    train, test = data
    scorer = create_scorer("NDCG@10")
    r = RankBoost(n_rounds=40, n_threshold=10)
    r.fit(train, scorer)
    m = r.score_metric(test, scorer)
    assert m > _file_order_metric(test, scorer) + 0.03
    p = tmp_path / "rb.txt"
    r.save(str(p))
    assert p.read_text().startswith("## RankBoost")
    r2 = load_ranker_file(str(p))
    for a, b in zip(r.eval_dataset(test), r2.eval_dataset(test)):
        assert np.allclose(a, b, atol=1e-5)


def test_rankboost_distribution_favors_hard_pairs(data):
    train, _ = data
    scorer = create_scorer("NDCG@10")
    r = RankBoost(n_rounds=3, n_threshold=8)
    r.fit(train, scorer)
    assert len(r.weaks) == 3
    # alphas finite, thresholds within feature range
    for fid, theta, alpha in r.weaks:
        assert np.isfinite(alpha) and 1 <= fid <= train.n_features


def test_adarank_learns_and_roundtrips(tmp_path, data):
    train, test = data
    scorer = create_scorer("NDCG@10")
    r = AdaRank(n_rounds=30, tolerance=0.0)
    r.fit(train, scorer)
    assert len(r.history) >= 1
    m = r.score_metric(test, scorer)
    assert m > _file_order_metric(test, scorer) + 0.03
    p = tmp_path / "ar.txt"
    r.save(str(p))
    assert p.read_text().startswith("## AdaRank")
    r2 = load_ranker_file(str(p))
    for a, b in zip(r.eval_dataset(test), r2.eval_dataset(test)):
        assert np.allclose(a, b, atol=1e-5)


def test_adarank_no_immediate_repeat_with_noeq(data):
    train, _ = data
    scorer = create_scorer("NDCG@10")
    r = AdaRank(n_rounds=10, no_eq=True, tolerance=0.0)
    r.fit(train, scorer)
    fids = [f for f, _ in r.history]
    assert all(a != b for a, b in zip(fids, fids[1:]))


def test_rf_learns_and_roundtrips(tmp_path, data):
    train, test = data
    scorer = create_scorer("NDCG@10")
    r = RFRanker(n_bags=8, n_trees=1, n_leaves=8, feature_sampling_rate=0.5,
                 seed=3)
    r.fit(train, scorer)
    m = r.score_metric(test, scorer)
    assert m > _file_order_metric(test, scorer) + 0.03
    p = tmp_path / "rf.txt"
    r.save(str(p))
    text = p.read_text()
    assert text.startswith("## Random Forests")
    assert text.count("<ensemble>") == 8
    r2 = load_ranker_file(str(p))
    for a, b in zip(r.eval_dataset(test), r2.eval_dataset(test)):
        assert np.allclose(a, b, atol=1e-5)


def test_combiner_merges_bags(tmp_path, data):
    train, test = data
    scorer = create_scorer("NDCG@10")
    d = tmp_path / "bags"
    d.mkdir()
    for i in range(3):
        r = RFRanker(n_bags=2, n_trees=1, n_leaves=4, seed=i)
        r.fit(train, scorer)
        r.save(str(d / f"bag{i}.txt"))
    out = tmp_path / "combined.txt"
    combine(str(d), str(out))
    merged = load_ranker_file(str(out))
    assert isinstance(merged, RFRanker)
    assert len(merged.ensembles) == 6
    scores = merged.eval_dataset(test)
    assert all(np.isfinite(s).all() for s in scores)


def test_boosters_validation_rollback(data):
    """With a validation set, both boosters truncate to the best-validation
    round (ref: Ranker best-on-validation semantics) — the kept model must
    score validation at least as well as the full-length run's final round."""
    train, test = data
    vali = synth_dataset(n_queries=8, n_features=8, min_docs=8, max_docs=20,
                         seed=7, w_seed=9, signal=3.0)
    scorer = create_scorer("NDCG@10")

    rb_full = RankBoost(n_rounds=25, n_threshold=10)
    rb_full.fit(train, scorer)
    rb = RankBoost(n_rounds=25, n_threshold=10)
    rb.fit(train, scorer, validation=vali)
    assert 1 <= len(rb.weaks) <= len(rb_full.weaks)
    assert rb.score_metric(vali, scorer) >= rb_full.score_metric(vali, scorer) - 1e-6
    # truncated prefix must equal the full run's prefix (same deterministic rounds)
    for (f1, t1, a1), (f2, t2, a2) in zip(rb.weaks, rb_full.weaks):
        assert f1 == f2 and t1 == pytest.approx(t2) and a1 == pytest.approx(a2, rel=1e-5)

    ada_full = AdaRank(n_rounds=20, tolerance=0.0)
    ada_full.fit(train, scorer)
    ada = AdaRank(n_rounds=20, tolerance=0.0)
    ada.fit(train, scorer, validation=vali)
    assert 1 <= len(ada.history) <= len(ada_full.history)
    assert ada.score_metric(vali, scorer) >= ada_full.score_metric(vali, scorer) - 1e-6
    for (f1, a1), (f2, a2) in zip(ada.history, ada_full.history):
        assert f1 == f2 and a1 == pytest.approx(a2, rel=1e-5)


def test_rf_batched_grouping_invariant(data, monkeypatch):
    """Model bytes don't depend on how bags are grouped into lockstep
    batches (including a padded final group)."""
    import ranklib_tpu.models.rf as rf_mod

    train, _ = data
    scorer = create_scorer("NDCG@10")
    hp = dict(n_bags=6, n_trees=2, n_leaves=5, seed=11,
              feature_sampling_rate=0.5)
    a = RFRanker(**hp)
    a.fit(train, scorer)                       # one group of 6 (padded to 8)
    monkeypatch.setattr(rf_mod, "_bag_group_size", lambda *args: 4)
    b = RFRanker(**hp)
    b.fit(train, scorer)                       # groups of 4: 4 + (2 padded)
    assert a.model_str() == b.model_str()


def test_rankboost_implicit_distribution_matches_explicit_reference():
    """The fused step never materializes the pair distribution: it uses
    the telescoped rank-1 form D_t(x,y) ∝ exp(−(H(x)−H(y))). This test
    re-implements the reference's EXPLICIT per-pair updates
    (learning/boosting/RankBoost.java:~30: D ← D·exp(α(q_y − q_x))/Z)
    in numpy and checks the weak-ranker sequence (feature, θ, α) agrees
    round for round."""
    train = synth_dataset(n_queries=12, n_features=5, min_docs=6,
                          max_docs=14, seed=13, w_seed=3, signal=2.0)
    T, rounds = 7, 12
    r = RankBoost(n_rounds=rounds, n_threshold=T)
    r.fit(train, create_scorer("NDCG@10"))

    # ---- explicit reference -------------------------------------------
    feats = np.concatenate([q.feats for q in train.queries])
    labels = np.concatenate([q.labels for q in train.queries])
    qof = np.concatenate([np.full(q.n, i) for i, q in
                          enumerate(train.queries)])
    N, F = feats.shape
    lo, hi = feats.min(axis=0), feats.max(axis=0)
    grid = lo[:, None] + (hi - lo)[:, None] * (
        np.arange(1, T + 1, dtype=np.float32)[None, :] / (T + 1))
    pairs = [(x, y) for x in range(N) for y in range(N)
             if qof[x] == qof[y] and labels[x] > labels[y]]
    D = np.full(len(pairs), 1.0 / len(pairs))
    px = np.array([p[0] for p in pairs])
    py = np.array([p[1] for p in pairs])
    q_all = (feats[:, :, None] > grid[None, :, :])        # [N, F, T]
    got = []
    for _ in range(rounds):
        pot = np.zeros(N)
        np.add.at(pot, px, D)
        np.add.at(pot, py, -D)
        r_ft = np.einsum("d,dft->ft", pot, q_all.astype(np.float64))
        idx = int(np.argmax(r_ft))
        f_s, t_s = idx // T, idx % T
        rv = float(np.clip(r_ft.reshape(-1)[idx], -0.999999, 0.999999))
        alpha = 0.5 * np.log((1 + rv) / (1 - rv))
        got.append((f_s + 1, float(grid[f_s, t_s]), alpha))
        qd = q_all[:, f_s, t_s].astype(np.float64)
        D = D * np.exp(alpha * (qd[py] - qd[px]))
        D /= D.sum()

    assert len(r.weaks) == rounds
    for (fa, ta, aa), (fb, tb, ab) in zip(r.weaks, got):
        assert fa == fb
        assert abs(ta - tb) < 1e-5
        assert abs(aa - ab) < 2e-3, (aa, ab)


def test_rankboost_separable_data_truncates_zero_alpha_rounds():
    """Cleanly separable data drives alpha high enough that Z overflows
    and every later round's best r collapses to 0; those rounds are dead
    (alpha == 0) and must be truncated, not kept (review fix: the guard
    only caught the all-zero argmax column, not a real column tied at 0)."""
    from ranklib_tpu.data.dataset import Dataset, Query

    rng = np.random.default_rng(3)
    qs = []
    for qi in range(12):
        n = 12
        labels = (np.arange(n) % 2).astype(np.float32)
        feats = np.zeros((n, 3), np.float32)
        feats[:, 0] = labels * 10.0 + 1.0          # perfectly separating
        feats[:, 1] = rng.normal(size=n)
        feats[:, 2] = rng.normal(size=n)
        qs.append(Query(str(qi), labels, feats))
    train = Dataset(qs, 3)
    r = RankBoost(n_rounds=60, n_threshold=8)
    r.fit(train, create_scorer("NDCG@10"))
    assert 1 <= len(r.weaks) < 60
    assert all(alpha > 0 for _, _, alpha in r.weaks)
    m, _ = score_dataset(create_scorer("NDCG@10"), train,
                         r.eval_dataset(train))
    assert m > 0.95


def test_boosters_silent_chaining_bit_identical(data):
    """Silent mode chains rounds in 50-blocks (one host sync per block);
    models must be bit-identical to per-round stepping."""
    from ranklib_tpu.utils.logging import set_silent

    train, _ = data
    scorer = create_scorer("NDCG@10")

    rb_live = RankBoost(n_rounds=12, n_threshold=6)
    rb_live.fit(train, scorer)
    ada_live = AdaRank(n_rounds=12)
    ada_live.fit(train, scorer)
    set_silent(True)
    try:
        rb_silent = RankBoost(n_rounds=12, n_threshold=6)
        rb_silent.fit(train, scorer)
        ada_silent = AdaRank(n_rounds=12)
        ada_silent.fit(train, scorer)
    finally:
        set_silent(False)
    assert rb_live.weaks == rb_silent.weaks
    assert ada_live.history == ada_silent.history


def test_rankboost_bin_dtype_guard():
    """-tc >= 32767 must widen the bin matrices to int32 instead of
    silently wrapping int16 (advisor finding, round 5). Pin the dtype
    rule and an end-to-end _bin_csr_chunks round-trip at an
    out-of-int16-range T."""
    from ranklib_tpu.data.sparse import read_letor_sparse
    from ranklib_tpu.models.rankboost import _bin_dtype
    from tests.fixtures import synth_dataset, write_letor_text
    import tempfile, os

    assert _bin_dtype(256) == np.int16
    assert _bin_dtype(np.iinfo(np.int16).max - 1) == np.int16
    assert _bin_dtype(np.iinfo(np.int16).max) == np.int32
    assert _bin_dtype(40000) == np.int32

    ds = synth_dataset(n_queries=4, n_features=3, seed=5, signal=3.0)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.txt")
        write_letor_text(ds, p)
        csr = read_letor_sparse(p)
    T = 40000
    _, _, grid, binned = RankBoost._bin_csr_chunks(csr, T)
    assert binned.dtype == np.int32
    # bins reach past the int16 range on a max-valued doc (the wrap
    # would have made them negative)
    assert binned.max() > np.iinfo(np.int16).max
    assert binned.min() >= 0
