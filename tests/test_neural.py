"""RankNet / LambdaRank / ListNet: learning, validation rollback, IO."""

import numpy as np
import pytest

from ranklib_tpu.metrics.base import MetricScorer, score_dataset
from ranklib_tpu.models.base import load_ranker_file
from ranklib_tpu.models.neural import LambdaRank, ListNet, RankNet

from fixtures import synth_dataset

SCORER = MetricScorer("NDCG", 10)


@pytest.fixture(scope="module")
def ds():
    return synth_dataset(n_queries=20, n_features=6, min_docs=5, max_docs=20,
                         seed=55, signal=3.0)


@pytest.fixture(scope="module")
def ds_test():
    return synth_dataset(n_queries=8, n_features=6, min_docs=5, max_docs=20,
                         seed=56, signal=3.0, w_seed=55)


def random_ndcg(d):
    rng = np.random.default_rng(0)
    return score_dataset(SCORER, d, [rng.normal(size=q.n) for q in d.queries])[0]


@pytest.mark.parametrize("cls,hp", [
    (RankNet, dict(n_epoch=30, learning_rate=0.001)),
    (LambdaRank, dict(n_epoch=30, learning_rate=0.001)),
    (ListNet, dict(n_epoch=150, learning_rate=0.01)),
])
def test_neural_learns(cls, hp, ds, ds_test):
    r = cls(**hp)
    r.fit(ds, SCORER)
    m_test = r.score_metric(ds_test, SCORER)
    assert m_test > random_ndcg(ds_test) + 0.1, (cls.NAME, m_test)


def test_listnet_is_linear(ds):
    r = ListNet(n_epoch=5)
    r.fit(ds, SCORER)
    assert len(r.params) == 1  # zero hidden layers → single output layer


def test_validation_rollback(ds, ds_test):
    """With validation, the returned weights are the best-epoch snapshot."""
    r = RankNet(n_epoch=15, learning_rate=0.001)
    r.fit(ds, SCORER, validation=ds_test)
    m_val = r.score_metric(ds_test, SCORER)
    # training a fresh model further must not beat the snapshot on val by
    # construction of the snapshot rule: just sanity-check it learned
    assert m_val > random_ndcg(ds_test)


@pytest.mark.parametrize("cls", [RankNet, LambdaRank, ListNet])
def test_save_load_roundtrip(cls, ds, tmp_path):
    r = cls(n_epoch=3, learning_rate=0.001)
    r.fit(ds, SCORER)
    p = tmp_path / "model.txt"
    r.save(str(p))
    assert p.read_text().startswith(f"## {cls.NAME}\n")
    r2 = load_ranker_file(str(p))
    assert type(r2) is cls
    for a, b in zip(r.eval_dataset(ds), r2.eval_dataset(ds)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_deterministic_given_seed(ds):
    a = RankNet(n_epoch=3, seed=7)
    a.fit(ds, SCORER)
    b = RankNet(n_epoch=3, seed=7)
    b.fit(ds, SCORER)
    for (W1, b1), (W2, b2) in zip(a.params, b.params):
        np.testing.assert_array_equal(W1, W2)
        np.testing.assert_array_equal(b1, b2)
