"""Experiment: per-split marginal cost of the fused round (slope method).

Separately-jitted phase timings are polluted by the tunnel's ~30 ms
sync floor, so instead: time warm steady-state rounds at n_leaves in
{2, 6, 10}. Slope vs (n_leaves-1) = marginal cost of one split (one
child histogram + split scan + assignment); the intercept is everything
per-round that doesn't scale with splits (lambda phase, root histogram,
leaf outputs, dispatch).  One process, in-process compile reuse.
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
print(f"n_docs={train.n_docs}", flush=True)


def fit_time(n_trees, n_leaves):
    r = LambdaMART(n_trees=n_trees, n_leaves=n_leaves, learning_rate=0.1,
                   early_stop=0)
    t0 = time.perf_counter()
    r.fit(train, scorer)
    dt = time.perf_counter() - t0
    float(r.score_metric(train, scorer))   # forced value read
    return dt


def per_round(n_leaves):
    fit_time(2, n_leaves)                  # compile
    t2 = min(fit_time(2, n_leaves), fit_time(2, n_leaves))
    tb = min(fit_time(102, n_leaves), fit_time(102, n_leaves))
    ms = (tb - t2) / 100.0 * 1e3
    print(f"n_leaves={n_leaves}: {ms:.1f} ms/round", flush=True)
    return ms


r2 = per_round(2)
r6 = per_round(6)
r10 = per_round(10)
slope = (r10 - r2) / 8.0
print(f"per-split marginal: {slope:.2f} ms  "
      f"(check mid: {r2 + 4 * slope:.1f} vs measured {r6:.1f})", flush=True)
print(f"non-split intercept (lambda+root hist+leaf+dispatch): "
      f"{r2 - slope:.1f} ms", flush=True)
