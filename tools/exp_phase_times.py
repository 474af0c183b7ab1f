"""On-chip phase timing of the fused LambdaMART round at bench shape.

Times each phase as its own jitted program (warm, best-of-3, forced value
reads) plus the full fused step, to direct optimization where the time
actually goes.
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
from ranklib_tpu.gbdt.binning import bin_features, compute_thresholds
from ranklib_tpu.gbdt.boost import (_bucket_metric_sum, init_state,
                                    make_boost_data, make_round_step)
from ranklib_tpu.models.gbdt import _pad_doc_count
from ranklib_tpu.gbdt.grow import grow_tree, leaf_outputs
from ranklib_tpu.gbdt.lambdas import lambda_weights
from ranklib_tpu.metrics.base import create_scorer
from ranklib_tpu.ops.lambda_kernel import lambda_weights_fused, supports_fused
from ranklib_tpu.utils.logging import set_silent

set_silent(True)

train = synth_dataset(n_queries=1500, n_features=136, min_docs=80,
                      max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
scorer = create_scorer("NDCG@10")
feats, labels, _ = flatten(train)
N, F = feats.shape
thresholds, _ = compute_thresholds(feats, 256)
B = thresholds.shape[1]
Npad = _pad_doc_count(N)
binned = bin_features(np.pad(feats, ((0, Npad - N), (0, 0))), thresholds)
labels_pad = np.pad(labels, (0, Npad - N)).astype(np.float32)
data, Npad, Nvpad = make_boost_data(train, binned, labels_pad, N, None, None,
                                    None)
print(f"N={N} Npad={Npad} F={F} B={B} buckets={len(data.tb)}", flush=True)

lam_fn = lambda_weights_fused if supports_fused(scorer) else lambda_weights
print("fused lambda kernel:", lam_fn is lambda_weights_fused, flush=True)


@jax.jit
def phase_lambda(scores, data):
    lam_f = jnp.zeros_like(scores)
    w_f = jnp.zeros_like(scores)
    for lab, msk, didx in data.tb:
        l_, w_ = lam_fn(scorer, lab, scores[didx], msk)
        lam_f = lam_f.at[didx].add(jnp.where(msk, l_, 0.0))
        w_f = w_f.at[didx].add(jnp.where(msk, w_, 0.0))
    return lam_f[:-1], w_f[:-1]


@jax.jit
def phase_leaf(node_of_doc, lam, w, doc_mask):
    return leaf_outputs(node_of_doc, lam, w, 19, True, doc_mask=doc_mask)


@jax.jit
def phase_metric(scores, data):
    return _bucket_metric_sum(scorer, data.tb, scores)


def timeit(tag, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32)), out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(
            lambda x: float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32)),
            out)
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {min(ts) * 1e3:.1f} ms", flush=True)
    return out


scores = jnp.zeros((Npad + 1,), jnp.float32)
rng = np.random.default_rng(0)
scores = scores.at[:N].set(jnp.asarray(rng.normal(size=N).astype(np.float32)))

lam, w = timeit("lambda", phase_lambda, scores, data)
arr = timeit("grow", lambda l: grow_tree(
    data.binned_T, l, n_bins=B, n_leaves=10, min_leaf_support=1,
    doc_mask=data.doc_mask, feature_mask=data.feat_mask), lam)
out = timeit("leaf", phase_leaf, arr.node_of_doc, lam, w, data.doc_mask)
timeit("metric", phase_metric, scores, data)

# full fused step (train_metric off = silent mode, like the bench)
step = make_round_step(scorer, n_bins=B, n_leaves=10, min_leaf_support=1,
                       learning_rate=0.1, pointwise=False, newton=True,
                       n_queries=1500, n_vqueries=1, train_metric=False)
state = init_state(102, 10, Npad, Nvpad, F)
state = step(state, jnp.int32(0), data)   # compile
float(state.scores[0])
ts = []
for k in range(1, 7):
    t0 = time.perf_counter()
    state = step(state, jnp.int32(k), data)
    float(state.scores[0])
    ts.append(time.perf_counter() - t0)
print(f"full step: {min(ts) * 1e3:.1f} ms", flush=True)
