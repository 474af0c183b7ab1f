"""A/B the ERR/MAP lambda paths at bench shape: sorted argsort reference
vs the prefix-matvec sort-free variants (gbdt/lambdas.py
lambda_weights_nosort_{err,map}).

Chained donated steps per value read (the tunnel-latency-proof
instrument — see tools/exp_nosort_ab.py for the NDCG/DCG/P@k run that
measured 34.8 → 26.3 ms/round at this shape). CPU A/B on a [512, 128]
bucket already showed 2×: ERR 112.6 → 56.1 ms, MAP 107.1 → 46.5 ms.
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

train = synth_dataset(n_queries=1500, n_features=136, min_docs=80,
                      max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
feats, labels, _ = flatten(train)
N, F = feats.shape
thresholds, _ = compute_thresholds(feats, 256)
B = thresholds.shape[1]
Npad = _pad_doc_count(N)
binned = bin_features(np.pad(feats, ((0, Npad - N), (0, 0))), thresholds)
labels_pad = np.pad(labels, (0, Npad - N)).astype(np.float32)

K = 40

for metric in ("ERR@10", "MAP"):
    scorer = create_scorer(metric)
    data, Npad_, Nvpad = make_boost_data(train, binned, labels_pad, N, None,
                                         None, None, scorer=scorer)

    for path in ("sorted", "auto"):
        step = make_round_step(scorer, n_bins=B, n_leaves=10,
                               min_leaf_support=1, learning_rate=0.1,
                               pointwise=False, newton=True,
                               n_queries=1500, n_vqueries=1,
                               train_metric=False, lambda_path=path)
        state = init_state(128, 10, Npad_, Nvpad, F)
        state = step(state, jnp.int32(0), data)
        float(state.scores[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for k in range(1, K + 1):
                state = step(state, jnp.int32(k), data)
            float(state.scores[0])
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{metric:7s} {path:6s}: {best * 1e3:.2f} ms/round", flush=True)
