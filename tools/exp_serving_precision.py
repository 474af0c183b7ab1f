"""Probe: matmul-only serving eval timing after the HIGHEST-precision fix.

The selection and leaf-output matmuls in gbdt.ensemble._mm_eval now run at
Precision.HIGHEST (bf16 default could misroute docs at split boundaries —
see the _mm_eval docstring). This times the full device-resident eval at
the recorded serving shape (262K docs x 1000 trees, 136 feats, 10 leaves)
so the cost of exactness can be compared against the pre-fix baseline of
~89 ms (PARITY.md perf notes).

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
