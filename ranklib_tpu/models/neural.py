"""Neural rankers: RankNet (`-ranker 1`), LambdaRank (`-ranker 5`),
ListNet (`-ranker 7`).

The reference implements these as an object graph of Neuron/Synapse/Layer
(ref: learning/neuralnet/{RankNet,LambdaRank,ListNet,Neuron,Synapse,
Layer}.java) — that entire subtree collapses here into an MLP forward and
three jitted per-query losses (SURVEY.md §2 'neural plumbing' row).

Reference semantics preserved:

* default net: 1 hidden layer × 10 neurons, logistic transfer on every
  layer including the output (ref: neuralnet/LogiFunction.java);
* one SGD step PER QUERY (the query is the minibatch; ref:
  RankNet.learn → batchFeedForward/batchBackPropagate per RankList);
* RankNet: pairwise cross-entropy over pairs (i, j) with label_i > label_j
  (gradient −ρ with ρ = 1/(1+e^{s_i−s_j}), lr 5e-5, 100 epochs);
* LambdaRank: pair gradient additionally scaled by |Δmetric| of swapping
  the pair in the CURRENT ranking, recomputed every step (ref:
  learning/neuralnet/LambdaRank.java:~20);
* ListNet: zero hidden layers (linear scorer) + top-one listwise
  cross-entropy with target P* = softmax(labels), lr 1e-5, 1500 epochs
  (ref: learning/neuralnet/ListNet.java:~20);
* per-epoch validation scoring with best-weight snapshot, restored at the
  end (ref: RankNet.saveBestModelOnValidation).

TPU mapping: queries are padded into [B, D, F] buckets; one lax.scan per
bucket performs the sequential per-query updates on-device (no per-query
host round-trips); pair matrices are masked [D, D] VPU work; the epoch
loop stays on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.data.dataset import Dataset, bucketize
from ranklib_tpu.metrics.base import MetricScorer
from ranklib_tpu.models.base import (
    Ranker, model_header, parse_model_params, register_ranker,
)
from ranklib_tpu.ops.sorting import rank_labels, rank_perm
from ranklib_tpu.utils.errors import RankLibError
from ranklib_tpu.utils.logging import log


def _init_params(key, layer_sizes):
    """layer_sizes e.g. [F, 10, 1]; small random init like the reference."""
    params = []
    for fan_in, fan_out in zip(layer_sizes[:-1], layer_sizes[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        params.append((
            jax.random.uniform(k1, (fan_in, fan_out), jnp.float32, -0.05, 0.05),
            jax.random.uniform(k2, (fan_out,), jnp.float32, -0.05, 0.05),
        ))
    return params


def _forward(params, x):
    """x [..., F] → scores [...]; logistic transfer on every layer."""
    h = x
    for W, b in params:
        h = jax.nn.sigmoid(h @ W + b)
    return h[..., 0]


def _pair_mask(labels, mask):
    """[D, D] float: 1 where label_i > label_j and both docs real."""
    valid = mask.astype(jnp.float32)
    both = valid[:, None] * valid[None, :]
    return (labels[:, None] > labels[None, :]).astype(jnp.float32) * both


def _ranknet_query_loss(params, feats, labels, mask, scorer):
    s = _forward(params, feats)
    pm = _pair_mask(labels, mask)
    diff = s[:, None] - s[None, :]
    return jnp.sum(pm * jax.nn.softplus(-diff))


def _lambdarank_query_loss(params, feats, labels, mask, scorer):
    s = _forward(params, feats)
    # |Δmetric| of swapping each pair in the current ranking (stop-grad)
    perm = rank_perm(s[None, :], mask[None, :])[0]
    inv = jnp.argsort(perm)
    L = jnp.take(labels, perm)[None, :]
    n = mask.sum()[None].astype(jnp.int32)
    d_ranked = scorer.swap_deltas(L, n)[0]            # positions space
    d_doc = d_ranked[inv][:, inv]                     # back to doc space
    w = jax.lax.stop_gradient(jnp.abs(d_doc))
    pm = _pair_mask(labels, mask)
    diff = s[:, None] - s[None, :]
    return jnp.sum(pm * w * jax.nn.softplus(-diff))


def _listnet_query_loss(params, feats, labels, mask, scorer):
    s = _forward(params, feats)
    neg = jnp.float32(-1e30)
    logp_model = jax.nn.log_softmax(jnp.where(mask, s, neg))
    p_target = jax.nn.softmax(jnp.where(mask, labels, neg))
    return -jnp.sum(jnp.where(mask, p_target * logp_model, 0.0))


_LOSSES = {
    "ranknet": _ranknet_query_loss,
    "lambdarank": _lambdarank_query_loss,
    "listnet": _listnet_query_loss,
}


@functools.partial(jax.jit, static_argnames=("loss_name", "scorer", "lr"))
def _epoch_on_bucket(params, feats, labels, mask, loss_name, scorer, lr):
    """Sequential per-query SGD over one padded bucket (lax.scan)."""
    loss_fn = _LOSSES[loss_name]

    def body(p, row):
        f, l, m = row
        g = jax.grad(loss_fn)(p, f, l, m, scorer)
        p = jax.tree.map(lambda a, b: a - lr * b, p, g)
        return p, jnp.float32(0)

    params, _ = jax.lax.scan(body, params, (feats, labels, mask))
    return params


@jax.jit
def _bucket_scores_fwd(params, feats):
    return _forward(params, feats)


@functools.partial(jax.jit, static_argnames=("scorer",))
def _bucket_metric(params, feats, labels, mask, scorer):
    s = _forward(params, feats)
    n = mask.sum(axis=-1).astype(jnp.int32)
    return scorer.score_ranked(rank_labels(labels, s, mask), n)


@jax.jit
def _bucket_misordered(params, feats, labels, mask):
    s = _forward(params, feats)
    pm = jax.vmap(_pair_mask)(labels, mask)
    bad = (s[:, :, None] <= s[:, None, :]).astype(jnp.float32)
    return jnp.sum(pm * bad)


@register_ranker
class RankNet(Ranker):
    NAME = "RankNet"
    LOSS = "ranknet"

    def __init__(self, **hp):
        self.n_epoch = 100
        self.n_layers = 1               # hidden layers
        self.n_hidden_per_layer = 10
        self.learning_rate = 0.00005
        self.seed = 0
        self.params = None              # list[(W, b)]
        self.n_features = None
        super().__init__(**hp)

    def _layer_sizes(self, F):
        return [F] + [self.n_hidden_per_layer] * self.n_layers + [1]

    def fit(self, train: Dataset, scorer: MetricScorer, validation=None):
        F = train.n_features
        self.n_features = F
        params = _init_params(jax.random.PRNGKey(self.seed), self._layer_sizes(F))
        buckets = [
            (jnp.asarray(b.feats), jnp.asarray(b.labels), jnp.asarray(b.mask))
            for b in bucketize(train)
        ]
        vbuckets = None
        if validation is not None:
            vbuckets = [
                (jnp.asarray(b.feats), jnp.asarray(b.labels), jnp.asarray(b.mask))
                for b in bucketize(validation)
            ]
        n_val_q = len(validation.queries) if validation is not None else 0
        lr = float(self.learning_rate)

        log(f"Training starts... [{self.NAME}] {self.n_epoch} epochs, "
            f"lr={lr:g}, layers={self._layer_sizes(F)}")
        log(f"{'#epoch':<8}| {'# mis-ordered pairs':<20}| {'validation':<10}")
        best_val, best_params = -np.inf, params
        for epoch in range(1, self.n_epoch + 1):
            for f, l, m in buckets:
                params = _epoch_on_bucket(params, f, l, m, self.LOSS, scorer, lr)
            if validation is not None:
                tot = 0.0
                for f, l, m in vbuckets:
                    tot += float(jnp.sum(_bucket_metric(params, f, l, m, scorer)))
                val = tot / n_val_q
                if val > best_val:
                    best_val, best_params = val, params
            if epoch % max(1, self.n_epoch // 10) == 0 or epoch == 1:
                mis = sum(float(_bucket_misordered(params, f, l, m))
                          for f, l, m in buckets)
                vtxt = f"{best_val:.4f}" if validation is not None else "-"
                log(f"{epoch:<8}| {mis:<20.0f}| {vtxt:<10}")
        if validation is not None:
            params = best_params  # restore best-on-validation snapshot
        self.params = [(np.asarray(W), np.asarray(b)) for W, b in params]

    # ---- scoring -----------------------------------------------------------
    def eval_dataset(self, ds: Dataset):
        if self.params is None:
            raise RankLibError("Model not trained/loaded")
        F = self.params[0][0].shape[0]
        params = [(jnp.asarray(W), jnp.asarray(b)) for W, b in self.params]
        out = [None] * len(ds.queries)
        for b in bucketize(ds):
            feats = b.feats
            if ds.n_features != F:  # width mismatch between model and data
                feats = np.zeros((b.B, b.D, F), np.float32)
                w = min(F, ds.n_features)
                feats[:, :, :w] = b.feats[:, :, :w]
            s = np.asarray(_bucket_scores_fwd(params, jnp.asarray(feats)))
            for row, qi in enumerate(b.qidx):
                out[qi] = s[row, : int(b.n_docs[row])].astype(np.float64)
        return out

    # ---- serialization -----------------------------------------------------
    def model_str(self) -> str:
        sizes = [self.params[0][0].shape[0]] + [W.shape[1] for W, _ in self.params]
        hdr = model_header(self.NAME, {
            "Epochs": self.n_epoch,
            "No. of features": sizes[0],
            "No. of hidden layers": len(sizes) - 2,
            "No. of hidden nodes per layer": self.n_hidden_per_layer,
            "Learning rate": self.learning_rate,
            "Layer sizes": " ".join(map(str, sizes)),
        })
        chunks = []
        for W, b in self.params:
            chunks.append(" ".join(repr(float(x)) for x in W.flatten()))
            chunks.append(" ".join(repr(float(x)) for x in b.flatten()))
        return hdr + "\n".join(chunks) + "\n"

    def load_str(self, text: str) -> None:
        params, body = parse_model_params(text)
        try:
            sizes = [int(s) for s in params["Layer sizes"].split()]
        except KeyError:
            raise RankLibError(f"{self.NAME} model missing 'Layer sizes'") from None
        if "Epochs" in params:
            self.n_epoch = int(params["Epochs"])
        if "Learning rate" in params:
            self.learning_rate = float(params["Learning rate"])
        self.n_layers = len(sizes) - 2
        if self.n_layers > 0:
            self.n_hidden_per_layer = sizes[1]
        vals = iter(body)
        out = []
        for fan_in, fan_out in zip(sizes[:-1], sizes[1:]):
            W = np.array(next(vals).split(), np.float64).reshape(fan_in, fan_out)
            b = np.array(next(vals).split(), np.float64)
            out.append((W.astype(np.float32), b.astype(np.float32)))
        self.params = out
        self.n_features = sizes[0]


@register_ranker
class LambdaRank(RankNet):
    NAME = "LambdaRank"
    LOSS = "lambdarank"


@register_ranker
class ListNet(RankNet):
    NAME = "ListNet"
    LOSS = "listnet"

    def __init__(self, **hp):
        super().__init__()
        self.n_epoch = 1500
        self.learning_rate = 0.00001
        self.n_layers = 0               # linear scorer (ref: ListNet)
        for k, v in hp.items():
            if not hasattr(self, k):
                raise RankLibError(f"{self.NAME}: unknown hyperparameter '{k}'")
            setattr(self, k, v)
