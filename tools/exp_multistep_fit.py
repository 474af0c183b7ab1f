"""A/B the multi-round chained dispatch (boost._make_stepper.multi) under
the bench protocol: warm fit(2) and fit(502) differencing, silent mode.

Expectation: fit-differencing now reads ~= the chained-step probe
(tools/exp_phase_split.py) because per-round Python dispatch through the
tunnel is gone — the differenced number becomes immune to tunnel-day
dispatch inflation (the BENCH_r02 regression root cause).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

from ranklib_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from fixtures import synth_dataset
from ranklib_tpu.metrics.base import create_scorer
from ranklib_tpu.models.gbdt import LambdaMART
from ranklib_tpu.utils.logging import set_silent

set_silent(True)
train = synth_dataset(n_queries=1500, n_features=136, min_docs=80,
                      max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
scorer = create_scorer("NDCG@10")
print("n_docs:", train.n_docs, flush=True)


def timed_fit(n_trees: int) -> float:
    r = LambdaMART(n_trees=n_trees, n_leaves=10, learning_rate=0.1,
                   early_stop=0)
    t0 = time.perf_counter()
    r.fit(train, scorer)
    dt = time.perf_counter() - t0
    print(f"fit({n_trees}): {dt:.2f}s", flush=True)
    return dt


timed_fit(2)                        # cold compile
t_small = min(timed_fit(2), timed_fit(2))
t_big = min(timed_fit(502), timed_fit(502))
ms = (t_big - t_small) / 500 * 1e3
print(f"differenced: {ms:.2f} ms/round "
      f"({train.n_docs * 500 / (t_big - t_small) / 1e6:.2f}M doc-trees/s)",
      flush=True)
