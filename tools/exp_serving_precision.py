"""Probe: serving eval timing at the recorded shape (262K docs x 1000
trees, 136 feats, 10 leaves).

History: the one-hot selection matmul needed Precision.HIGHEST for
exactness (bf16 operand rounding misroutes docs at split boundaries),
measured 202 ms vs 89 ms pre-fix. The gather redesign (selection =
static column gather, pred stored bf16) restores exactness with no
HIGHEST selection matmul at all — this times it.

Run on the real chip: python tools/exp_serving_precision.py
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
    _ = float(out[0])                      # VALUE READ (tunnel timing rule)
    print(f"cold (incl. compile): {time.perf_counter() - t0:.2f}s",
          flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(X, *packed)
        s = float(out.sum())               # force full materialization
        dt = time.perf_counter() - t0
        print(f"warm {i}: {dt * 1e3:.1f} ms  (sum={s:.3f})", flush=True)
    print("baseline (pre-HIGHEST fix, same shape): ~89 ms", flush=True)


if __name__ == "__main__":
    main()
