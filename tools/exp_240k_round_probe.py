"""Steady-state round timing at 240K queries / 28.8M docs (8x MSLR-30K):
the POST-uint8 one-chip ceiling probe (bin matrix ~4 GB at one byte/entry).
Uploads the dataset ONCE, builds the fused step, then times K donated
steps back-to-back with a single value read at the end — the pipelined
steady-state rate, immune to the ~1 GB/fit tunnel-upload variance that
breaks fit-differencing at this scale.
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
train = synth_dataset(n_queries=240000, n_features=136, min_docs=80,
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
print(f"setup {time.perf_counter() - t0:.0f}s  N={N} Npad={Npad}",
      flush=True)

step = make_round_step(scorer, n_bins=B, n_leaves=10, min_leaf_support=1,
                       learning_rate=0.1, pointwise=False, newton=True,
                       n_queries=240000, n_vqueries=1, train_metric=False)
state = init_state(128, 10, Npad, Nvpad, F)
state = step(state, jnp.int32(0), data)
float(state.scores[0])                       # compile + settle
K = 10
for rep in range(3):
    t0 = time.perf_counter()
    for k in range(1, K + 1):
        state = step(state, jnp.int32(k), data)
    float(state.scores[0])                   # one forced read at the end
    dt = (time.perf_counter() - t0) / K
    print(f"steady: {dt * 1e3:.0f} ms/round "
          f"({N / dt / 1e6:.2f}M doc*trees/s)", flush=True)
