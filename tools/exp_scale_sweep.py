"""Scale sweep: warm ms/tree at MSLR-10K and MSLR-30K doc scales.

Verifies the fused-round cost stays linear in docs from bench shape
(179K) through 719K (MSLR-WEB10K) to 3.6M docs (MSLR-WEB30K) on one
chip, with the current kernel stack. One process; forced value reads.
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
scorer = create_scorer("NDCG@10")


def measure(n_queries, trees=52):
    train = synth_dataset(n_queries=n_queries, n_features=136, min_docs=80,
                          max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)

    def fit_time(n):
        r = LambdaMART(n_trees=n, n_leaves=10, learning_rate=0.1,
                       early_stop=0)
        t0 = time.perf_counter()
        r.fit(train, scorer)
        dt = time.perf_counter() - t0
        float(r.score_metric(train, scorer))
        return dt

    fit_time(2)                                   # compile
    t2 = min(fit_time(2), fit_time(2))
    tb = min(fit_time(trees), fit_time(trees))
    ms = (tb - t2) / (trees - 2) * 1e3
    print(f"q={n_queries} docs={train.n_docs}: {ms:.0f} ms/tree, "
          f"{train.n_docs / ms / 1e3:.2f}M doc*trees/s", flush=True)


measure(1500)
measure(6000)
measure(30000, trees=22)
