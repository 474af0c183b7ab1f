"""Probe: serving-eval timing at the recorded shape (262K docs x 1000
trees, 136 feats, 10 leaves) — times the PRODUCT _mm_eval path.

Measured history on v5e (all variants numerically EXACT vs traversal,
identical checksums; gbdt/ensemble.py class comment has the design):

  one-hot selection matmul @ HIGHEST ............. 202 ms
  lane-dim gather  vals = X[:, fid], bf16 pred ... 165-177 ms
  row gather on X^T (sublane DMA), transposed .... 149 ms
  + p@P+(1-p)@Q == p@(P-Q)+colsum(Q) (1 matmul) .. 115 ms   <- product
  (pre-exactness-fix bf16 one-hot baseline: ~89 ms, WRONG at split
   boundaries)

Run on the real chip: python tools/exp_serving_gatherT.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ranklib_tpu.gbdt.ensemble import _mm_eval
    from __graft_entry__ import _synthetic_ensemble

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    F = 136
    ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=F,
                              rng=rng)
    packed = tuple(jnp.asarray(a) for a in ens._pack_matmul(F))
    N = 262144
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    fn = jax.jit(_mm_eval)
    t0 = time.perf_counter()
    out = fn(X, *packed)
    s = float(out.sum())                     # VALUE READ (tunnel rule)
    print(f"cold: {time.perf_counter() - t0:.2f}s (sum={s:.3f})",
          flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(X, *packed)
        s = float(out.sum())
        print(f"warm {i}: {(time.perf_counter() - t0) * 1e3:.1f} ms "
              f"(sum={s:.3f})", flush=True)


if __name__ == "__main__":
    main()
