"""Experiment: does densifying BUCKET_EDGES speed the fused LambdaMART round?

Times warm steady-state rounds at the bench shape (1500q x 136f, 80-160
docs/query) under the stock edges and a densified set, in ONE process
(in-process compile reuse only — the tunnel recompiles server-side on
persistent-cache hits, see CLAUDE.md). Forces value reads for timing.
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
import ranklib_tpu.data.dataset as dsmod

set_silent(True)

train = synth_dataset(n_queries=1500, n_features=136, min_docs=80,
                      max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
scorer = create_scorer("NDCG@10")
print(f"n_docs={train.n_docs}", flush=True)


def fit_time(n_trees):
    r = LambdaMART(n_trees=n_trees, n_leaves=10, learning_rate=0.1,
                   early_stop=0)
    t0 = time.perf_counter()
    r.fit(train, scorer)
    dt = time.perf_counter() - t0
    # force a value read (tunnel block_until_ready is unreliable)
    m = float(r.score_metric(train, scorer))
    return dt, m


def measure(tag):
    sizes = sorted({dsmod.padded_size(q.n) for q in train.queries})
    print(f"[{tag}] bucket sizes: {sizes}", flush=True)
    t, _ = fit_time(2)
    print(f"[{tag}] cold fit(2): {t:.1f}s", flush=True)
    t2a, _ = fit_time(2)
    t2b, _ = fit_time(2)
    tba, m = fit_time(102)
    tbb, _ = fit_time(102)
    steady = min(tba, tbb) - min(t2a, t2b)
    per_round = steady / 100.0
    print(f"[{tag}] warm fit(2)={min(t2a, t2b):.2f}s fit(102)="
          f"{min(tba, tbb):.2f}s -> {per_round * 1e3:.1f} ms/round, "
          f"throughput {train.n_docs * 100 / steady / 1e6:.2f}M doc*trees/s, "
          f"train NDCG@10={m:.4f}", flush=True)
    return per_round


base = measure("stock-edges")

dsmod.BUCKET_EDGES = (8, 16, 24, 32, 40, 48, 64, 80, 96, 112, 128, 160,
                      192, 224, 256, 320, 384, 448, 512, 640, 768, 896,
                      1024, 1280, 1536, 2048)
dense = measure("dense-edges")
print(f"SPEEDUP: {base / dense:.3f}x", flush=True)
