"""Probe: serving-eval tree-chunk (TC) sweep at the recorded shape.

_TREE_CHUNK=16 gives 63 scan steps of [N,144]x[144,160] path matmuls —
small K/N dims underuse the MXU. Bigger TC quadratically grows the
block-diagonal padding flops (K=TC*M) but shrinks step count and makes
every matmul MXU-shaped. This sweeps TC on the real chip with the
product _mm_eval (exactness is TC-independent; checksums printed).

Run on the real chip: python tools/exp_serving_tc.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ranklib_tpu.gbdt import ensemble as ens_mod
    from __graft_entry__ import _synthetic_ensemble

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    F = 136
    ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=F,
                              rng=rng)
    N = 262144
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    for tc in (16, 32, 64, 128):
        ens._TREE_CHUNK = tc          # instance attr overrides class
        ens._mm = None                # force repack
        packed = tuple(jnp.asarray(a) for a in ens._pack_matmul(F))
        fn = jax.jit(ens_mod._mm_eval)
        t0 = time.perf_counter()
        out = fn(X, *packed)
        s = float(out.sum())          # VALUE READ (tunnel rule)
        cold = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(X, *packed)
            s = float(out.sum())
            best = min(best, time.perf_counter() - t0)
        print(f"TC={tc:4d}: best {best * 1e3:7.1f} ms  (cold {cold:.1f}s, "
              f"sum={s:.3f})", flush=True)


if __name__ == "__main__":
    main()
