"""Probe: fused forest-eval Pallas kernel vs the XLA scan epilogue at
the recorded serving shape (262K docs x 1000 trees, 136 feats, 10
leaves). Prints checksums (must match _mm_eval exactly at f32-sum
tolerance) and warm timings.

Run on the real chip: python tools/exp_forest_kernel.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ranklib_tpu.gbdt.ensemble import _mm_eval
    from ranklib_tpu.ops.forest_eval import (forest_eval_pallas,
                                             forest_eval_pallas_full)
    from __graft_entry__ import _synthetic_ensemble

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    F = 136
    ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=F,
                              rng=rng)
    packed = tuple(jnp.asarray(a) for a in ens._pack_matmul(F))
    fid_full, thr_full, PmQc, csQc, plenc, outwc = packed
    N = 262144
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    @jax.jit
    def fused(X, fid_full, thr_full, PmQc, csQc, plenc, outwc):
        valsT = jnp.take(X.T, fid_full, axis=0)
        predT = (valsT <= thr_full[:, None]).astype(jnp.bfloat16)
        return forest_eval_pallas(predT, PmQc, csQc, plenc, outwc)

    print("compiling FULL-fused kernel (a silent hang here = Mosaic "
          "hazard; wait 2 min after killing before retrying)", flush=True)
    full = jax.jit(forest_eval_pallas_full)
    t0 = time.perf_counter()
    out = full(X, *packed)
    s = float(out.sum())
    print(f"full cold: {time.perf_counter() - t0:.2f}s (sum={s:.3f})",
          flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        out = full(X, *packed)
        s = float(out.sum())
        print(f"full warm {i}: {(time.perf_counter() - t0) * 1e3:.1f} ms "
              f"(sum={s:.3f})", flush=True)

    print("compiling fused-epilogue kernel (a silent hang here = Mosaic "
          "hazard; wait 2 min after killing before retrying)", flush=True)
    t0 = time.perf_counter()
    out = fused(X, *packed)
    s = float(out.sum())                  # VALUE READ (tunnel rule)
    print(f"fused cold: {time.perf_counter() - t0:.2f}s (sum={s:.3f})",
          flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        out = fused(X, *packed)
        s = float(out.sum())
        print(f"fused warm {i}: {(time.perf_counter() - t0) * 1e3:.1f} ms "
              f"(sum={s:.3f})", flush=True)

    fn = jax.jit(_mm_eval)
    out = fn(X, *packed)
    s = float(out.sum())
    for i in range(2):
        t0 = time.perf_counter()
        out = fn(X, *packed)
        s = float(out.sum())
        print(f"xla   warm {i}: {(time.perf_counter() - t0) * 1e3:.1f} ms "
              f"(sum={s:.3f})", flush=True)


if __name__ == "__main__":
    main()
