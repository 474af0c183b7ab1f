"""Steady-state round timing at 480K queries / 57.6M docs (16x MSLR-30K):
pushing the post-uint8 one-chip ceiling (bin matrix ~7.9 GB at one
byte/entry on a 16 GB v5e). Same protocol as exp_240k_round_probe.py:
upload once, build the fused step, time K donated steps back-to-back with
one value read at the end. Chained dispatch capped at K=4 rounds (~8-10 s
each expected after the 28.8M droop) to stay far inside the ~330 s
device-call kill threshold.
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

t0 = time.perf_counter()
train = synth_dataset(n_queries=480000, n_features=136, min_docs=80,
                      max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
feats, labels, _ = flatten(train)
# make_boost_data only reads query STRUCTURE (labels/buckets) — drop the
# per-query feature arrays so host peak stays ~60 GB, not ~120
_empty = np.empty((0, 136), np.float32)
for q in train:
    q.feats = _empty
N, F = feats.shape
thresholds, _ = compute_thresholds(feats, 256)
B = thresholds.shape[1]
Npad = _pad_doc_count(N)
binned32 = bin_features(feats, thresholds)
del feats                                     # ~31 GB
assert binned32.max() < 256                   # train values land in real bins
binned = binned32.astype(np.uint8)            # ~7.9 GB; _upload_bins keeps u8
del binned32                                  # ~31 GB
binned = np.pad(binned, ((0, Npad - N), (0, 0)))   # pad bin 0: gm=0 ⇒ inert
labels_pad = np.pad(labels, (0, Npad - N)).astype(np.float32)
data, Npad, Nvpad = make_boost_data(train, binned, labels_pad, N, None,
                                    None, None, scorer=scorer)
del binned
print(f"setup {time.perf_counter() - t0:.0f}s  N={N} Npad={Npad}",
      flush=True)

step = make_round_step(scorer, n_bins=B, n_leaves=10, min_leaf_support=1,
                       learning_rate=0.1, pointwise=False, newton=True,
                       n_queries=480000, n_vqueries=1, train_metric=False)
state = init_state(128, 10, Npad, Nvpad, F)
state = step(state, jnp.int32(0), data)
float(state.scores[0])                       # compile + settle
K = 4
for rep in range(3):
    t0 = time.perf_counter()
    for k in range(1, K + 1):
        state = step(state, jnp.int32(rep * K + k), data)
    float(state.scores[0])                   # one forced read at the end
    dt = (time.perf_counter() - t0) / K
    print(f"steady: {dt * 1e3:.0f} ms/round "
          f"({N / dt / 1e6:.2f}M doc*trees/s)", flush=True)
