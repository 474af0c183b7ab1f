"""A/B: fused bin-space serving kernel (TN=2048) vs the SPLIT variant
(binning pass to HBM + selection sweep at TN=4096/8192).

The fused kernel's f32 xt residency capped its doc tile at 2048 (a
TN=4096 compile measured a 416 KB VMEM overrun). Splitting binning out
trades ~0.3 ms of bf16 HBM bandwidth for half the selection grid steps.
Checksum must match the fused kernel EXACTLY (same compares, same dots).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from __graft_entry__ import _synthetic_ensemble
from ranklib_tpu.ops import forest_eval

rng = np.random.default_rng(0)
ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=136,
                          rng=rng)
# bin-space pack needs a modest grid: quantize thresholds to ~200 values
for t in ens.trees:
    t.threshold = np.round(t.threshold * 32.0) / 32.0
X = jnp.asarray(rng.normal(size=(262144, 136)).astype(np.float32))

*binpack, n_grid = ens._pack_matmul_bins(136)
print(f"n_grid={n_grid}", flush=True)


def timed(fn, reps=5):
    float(np.asarray(fn()).sum())          # compile + warm (VALUE READ)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn()).sum())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


fused = lambda: forest_eval.forest_eval_pallas_bins(
    X, *binpack, n_grid=n_grid)
t_fused = timed(fused)
ref = np.asarray(fused())
print(f"fused TN={forest_eval._TN}: {t_fused * 1e3:.1f} ms", flush=True)

for tn in (2048, 4096, 8192):
    forest_eval._TN_SPLIT = tn
    forest_eval.forest_eval_pallas_bins_split.clear_cache()
    try:
        split = lambda: forest_eval.forest_eval_pallas_bins_split(
            X, *binpack, n_grid=n_grid)
        t_split = timed(split)
        got = np.asarray(split())
        exact = bool(np.array_equal(ref, got))
        print(f"split TN={tn}: {t_split * 1e3:.1f} ms exact={exact}",
              flush=True)
    except Exception as e:                 # noqa: BLE001
        print(f"split TN={tn}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
print("done", flush=True)
