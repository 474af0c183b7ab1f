"""Why is MSLR-30K scale (3.6M docs) slower per doc than bench shape?

Bench shape runs 7.1M doc·trees/s but 30K scale only ~2.7M. Isolate by
config differencing in one process (per-phase jits are unreliable
through the tunnel):

  - MART            : pointwise residuals — no pair/lambda work at all
  - LambdaMART nl=2 : lambda phase + ONE root histogram + leaf/score
  - LambdaMART nl=10: the full thing (8 histogram passes)

All silent (no train metric), early_stop=0, warm steady-state ms/tree
via fit(22) − fit(2) best-of-2.
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
from ranklib_tpu.models.gbdt import MART, LambdaMART
from ranklib_tpu.utils.logging import set_silent

set_silent(True)
scorer = create_scorer("NDCG@10")

t0 = time.perf_counter()
train = synth_dataset(n_queries=30000, n_features=136, min_docs=80,
                      max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
print(f"datagen {time.perf_counter() - t0:.0f}s  docs={train.n_docs}",
      flush=True)


def steady(tag, cls, nl, trees=22):
    def fit_time(n):
        r = cls(n_trees=n, n_leaves=nl, learning_rate=0.1, early_stop=0)
        t0 = time.perf_counter()
        r.fit(train, scorer)
        dt = time.perf_counter() - t0
        float(r.score_metric(train, scorer))
        return dt

    fit_time(2)
    t2 = min(fit_time(2), fit_time(2))
    tb = min(fit_time(trees), fit_time(trees))
    ms = (tb - t2) / (trees - 2) * 1e3
    print(f"{tag}: {ms:.0f} ms/tree  ({train.n_docs / ms / 1e3:.2f}M "
          f"doc*trees/s)", flush=True)
    return ms


m_mart = steady("MART nl=10      (no lambda)", MART, 10)
m_l2 = steady("LambdaMART nl=2 (lambda + root hist)", LambdaMART, 2)
m_l10 = steady("LambdaMART nl=10 (full)", LambdaMART, 10)
print(f"-> approx lambda phase: {m_l10 - m_mart:.0f} ms; "
      f"approx 7 extra hist passes: {m_l10 - m_l2 - m_mart + 0:.0f} ms "
      f"(rough, shared terms cancel imperfectly)", flush=True)
