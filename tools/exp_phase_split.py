"""Phase split of the fused round at bench shape by config differencing.

Per-phase jits through the tunnel are unreliable (~30 ms sync floor), so
isolate phases by differencing chained-step configs in ONE process:

  A full          : lambda + 9-split growth + leaves/score + train metric
  B no-metric     : train_metric=False            → A−B = train metric
  C pointwise     : MART residuals, same growth   → B−C = lambda phase
  D nl=2          : lambda + root hist only       → B−D = 8 growth iters

All steps share the device-resident data; K chained donated steps per
value read, best of 3.
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
from ranklib_tpu.gbdt.boost import init_state, make_boost_data, make_round_step
from ranklib_tpu.models.gbdt import _pad_doc_count
from ranklib_tpu.metrics.base import create_scorer
from ranklib_tpu.utils.logging import set_silent

set_silent(True)
scorer = create_scorer("NDCG@10")

train = synth_dataset(n_queries=1500, n_features=136, min_docs=80,
                      max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
feats, labels, _ = flatten(train)
N, F = feats.shape
thresholds, _ = compute_thresholds(feats, 256)
B = thresholds.shape[1]
Npad = _pad_doc_count(N)
binned = bin_features(np.pad(feats, ((0, Npad - N), (0, 0))), thresholds)
labels_pad = np.pad(labels, (0, Npad - N)).astype(np.float32)
data, Npad, Nvpad = make_boost_data(train, binned, labels_pad, N, None,
                                    None, None, scorer=scorer)
print(f"N={N} Npad={Npad}", flush=True)

K = 40


def run(tag, **kw):
    args = dict(n_bins=B, min_leaf_support=1, learning_rate=0.1,
                newton=not kw.get("pointwise", False),
                n_queries=1500, n_vqueries=1)
    args.update(kw)
    nl = args.pop("n_leaves", 10)
    step = make_round_step(scorer, n_leaves=nl, **args)
    state = init_state(128, nl, Npad, Nvpad, F)
    # ONE dispatch per K rounds (step.multi, traced bounds): per-round
    # Python dispatch through the tunnel measured 20+ ms on a congested
    # day (2026-08-20) — every config then reads the DISPATCH rate, not
    # device time, and config differences vanish into noise.
    state = step.multi(state, jnp.int32(0), jnp.int32(1), data)
    float(state.scores[0])
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        state = step.multi(state, jnp.int32(1 + rep * K),
                           jnp.int32(1 + (rep + 1) * K), data)
        float(state.scores[0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag}: {best * 1e3:.2f} ms/round", flush=True)
    return best


a = run("A full            ", pointwise=False, train_metric=True)
b = run("B no train metric ", pointwise=False, train_metric=False)
c = run("C pointwise (MART)", pointwise=True, train_metric=False)
d = run("D nl=2            ", pointwise=False, train_metric=False,
        n_leaves=2)
print(f"train metric : {(a - b) * 1e3:6.2f} ms", flush=True)
print(f"lambda phase : {(b - c) * 1e3:6.2f} ms", flush=True)
print(f"8 growth its : {(b - d) * 1e3:6.2f} ms", flush=True)
print(f"base (root+leaf+score): {(c - (b - d)) * 1e3:6.2f} ms "
      f"(pointwise total minus growth-iters share)", flush=True)
