"""A/B the sort-free vs sorted lambda path at bench shape, one process.

Builds TWO fused round steps over the same device-resident data — one
with data.tb_scale populated (sort-free compare-count ranks) and one
without (sorted reference path) — and times K chained donated steps per
value read, interleaved A/B/A/B to cancel drift.
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

data_ns, Npad, Nvpad = make_boost_data(train, binned, labels_pad, N, None,
                                       None, None, scorer=scorer)
data_s = data_ns._replace(tb_scale=())      # same buffers, sorted routing
print(f"N={N} Npad={Npad} chunks={len(data_ns.tb)}", flush=True)

step = make_round_step(scorer, n_bins=B, n_leaves=10, min_leaf_support=1,
                       learning_rate=0.1, pointwise=False, newton=True,
                       n_queries=1500, n_vqueries=1, train_metric=True)

K = 40


def run(tag, data):
    state = init_state(128, 10, Npad, Nvpad, F)
    state = step(state, jnp.int32(0), data)
    float(state.scores[0])                   # compile + settle
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        for k in range(1, K + 1):
            state = step(state, jnp.int32(k), data)
        float(state.scores[0])
        dt = (time.perf_counter() - t0) / K
        best = min(best, dt)
        print(f"{tag}: {dt * 1e3:.1f} ms/round", flush=True)
    return best


a = run("nosort", data_ns)
b = run("sorted", data_s)
a = min(a, run("nosort", data_ns))
b = min(b, run("sorted", data_s))
print(f"BEST nosort {a * 1e3:.1f} ms  sorted {b * 1e3:.1f} ms "
      f"({(b / a - 1) * 100:+.1f}% nosort speedup)", flush=True)
