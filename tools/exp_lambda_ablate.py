"""Ablate the 30K-scale lambda phase: kernels vs scatter-adds.

Three jitted variants over the real bucket chunks at 3.6M docs, timed
with K chained calls per value read:
  full    — gather + pair kernels + scatter-add into [N] (production)
  nosctr  — gather + pair kernels, chunk results reduced to scalars
  sctr    — gather + trivial per-chunk values + scatter-add into [N]
full − nosctr ≈ scatter cost; sctr cross-checks it.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from fixtures import synth_dataset
from ranklib_tpu.data.dataset import flatten
from ranklib_tpu.gbdt.boost import _device_buckets
from ranklib_tpu.gbdt.lambdas import lambda_weights
from ranklib_tpu.metrics.base import create_scorer

scorer = create_scorer("NDCG@10")
train = synth_dataset(n_queries=30000, n_features=136, min_docs=80,
                      max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
_, _, _ = flatten(train)
N = train.n_docs
tb = _device_buckets(train, sentinel=N)
print(f"N={N} chunks={len(tb)}", flush=True)
K = 8


def timeit(tag, fn):
    rng = np.random.default_rng(0)
    scores = jnp.asarray(
        np.pad(rng.normal(size=N).astype(np.float32), (0, 1)))

    @jax.jit
    def chain(scores):
        s = scores
        for _ in range(K):
            out = fn(s)
            s = scores + 1e-30 * out
        return s

    float(chain(scores)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(scores)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {min(ts) / K * 1e3:.0f} ms", flush=True)


def full(scores):
    lam_f = jnp.zeros_like(scores)
    w_f = jnp.zeros_like(scores)
    for lab, msk, didx in tb:
        l_, w_ = lambda_weights(scorer, lab, scores[didx], msk)
        lam_f = lam_f.at[didx].add(jnp.where(msk, l_, 0.0))
        w_f = w_f.at[didx].add(jnp.where(msk, w_, 0.0))
    return lam_f[0] + w_f[0]


def nosctr(scores):
    acc = jnp.float32(0.0)
    for lab, msk, didx in tb:
        l_, w_ = lambda_weights(scorer, lab, scores[didx], msk)
        acc += jnp.sum(jnp.where(msk, l_, 0.0)) + jnp.sum(
            jnp.where(msk, w_, 0.0))
    return acc


def sctr(scores):
    lam_f = jnp.zeros_like(scores)
    w_f = jnp.zeros_like(scores)
    for lab, msk, didx in tb:
        v = scores[didx] * 2.0
        lam_f = lam_f.at[didx].add(jnp.where(msk, v, 0.0))
        w_f = w_f.at[didx].add(jnp.where(msk, v + 1.0, 0.0))
    return lam_f[0] + w_f[0]


timeit("full  ", full)
timeit("nosctr", nosctr)
timeit("sctr  ", sctr)


from ranklib_tpu.ops.lambda_kernel import lambda_weights_fused


def fused(scores):
    lam_f = jnp.zeros_like(scores)
    w_f = jnp.zeros_like(scores)
    for lab, msk, didx in tb:
        l_, w_ = lambda_weights_fused(scorer, lab, scores[didx], msk)
        lam_f = lam_f.at[didx].add(jnp.where(msk, l_, 0.0))
        w_f = w_f.at[didx].add(jnp.where(msk, w_, 0.0))
    return lam_f[0] + w_f[0]


timeit("fused ", fused)


from ranklib_tpu.metrics import scorers as S


def sorts(scores):
    acc = jnp.float32(0.0)
    for lab, msk, didx in tb:
        sc = scores[didx]
        key = jnp.where(msk, -sc, jnp.inf)
        order = jnp.argsort(key, axis=-1, stable=True)
        L = jnp.take_along_axis(lab, order, axis=-1)
        Sv = jnp.take_along_axis(sc, order, axis=-1)
        inv = jnp.argsort(order, axis=-1)
        acc += jnp.sum(L) + jnp.sum(Sv) + jnp.sum(inv.astype(jnp.float32))
    return acc


def delta_only(scores):
    acc = jnp.float32(0.0)
    for lab, msk, didx in tb:
        sc = scores[didx]
        n = msk.sum(axis=-1).astype(jnp.int32)
        key = jnp.where(msk, -sc, jnp.inf)
        order = jnp.argsort(key, axis=-1, stable=True)
        L = jnp.take_along_axis(lab, order, axis=-1)
        acc += jnp.sum(jnp.abs(scorer.swap_deltas(L, n)))
    return acc


def pair_only(scores):
    acc = jnp.float32(0.0)
    for lab, msk, didx in tb:
        sc = scores[didx]
        key = jnp.where(msk, -sc, jnp.inf)
        order = jnp.argsort(key, axis=-1, stable=True)
        L = jnp.take_along_axis(lab, order, axis=-1)
        Sv = jnp.take_along_axis(sc, order, axis=-1)
        P = (L[:, :, None] > L[:, None, :]).astype(jnp.float32)
        rho = jax.nn.sigmoid(Sv[:, None, :] - Sv[:, :, None])
        m = P * rho
        acc += jnp.sum(m.sum(axis=2) - m.sum(axis=1))
    return acc


timeit("sorts ", sorts)
timeit("delta ", delta_only)
timeit("pairs ", pair_only)


def gather_only(scores):
    acc = jnp.float32(0.0)
    for lab, msk, didx in tb:
        acc += jnp.sum(scores[didx])
    return acc


timeit("gather", gather_only)
