"""Probe: 3-plane exact bf16 selection vs the f32 HIGHEST selection dot
in the fused forest-eval kernel, at the recorded serving shape (262K docs
× 1000 trees, 136 feats, 10 leaves).

The 3-plane path must be EXACTLY equal per doc (both compute the same f32
predicate). Prints max |Δ| vs the HIGHEST kernel and vs _mm_eval, plus
warm timings. Run on the real chip: python tools/exp_serving_3plane.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ranklib_tpu.gbdt.ensemble import _mm_eval
    from ranklib_tpu.ops.forest_eval import forest_eval_pallas_full
    from __graft_entry__ import _synthetic_ensemble

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    F = 136
    ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=F,
                              rng=rng)
    packed = tuple(jnp.asarray(a) for a in ens._pack_matmul(F))
    N = 262144
    X = rng.normal(size=(N, F)).astype(np.float32)
    # plant exact threshold hits: route some docs' split-feature values to
    # exactly a threshold (the compare-boundary case bf16 rounding breaks)
    thr_full = np.asarray(packed[1])
    fid_full = np.asarray(packed[0])
    for i in rng.integers(0, len(fid_full), 500):
        X[int(rng.integers(0, N)), fid_full[i]] = thr_full[i]
    X = jnp.asarray(X)

    full3 = jax.jit(forest_eval_pallas_full)
    fullH = jax.jit(lambda X, *p: forest_eval_pallas_full(
        X, *p, sel_precision=jax.lax.Precision.HIGHEST))

    print("compiling 3-plane kernel (silent hang = Mosaic hazard)",
          flush=True)
    t0 = time.perf_counter()
    o3 = full3(X, *packed)
    s3 = float(o3.sum())
    print(f"3plane cold: {time.perf_counter() - t0:.2f}s (sum={s3:.3f})",
          flush=True)
    t0 = time.perf_counter()
    oH = fullH(X, *packed)
    sH = float(oH.sum())
    print(f"HIGHEST cold: {time.perf_counter() - t0:.2f}s (sum={sH:.3f})",
          flush=True)
    d = float(jnp.max(jnp.abs(o3 - oH)))
    print(f"max |3plane - HIGHEST| = {d:.3e}  (MUST be 0)", flush=True)
    om = _mm_eval(X, *packed)
    dm = float(jnp.max(jnp.abs(o3 - om)))
    print(f"max |3plane - mm_eval| = {dm:.3e}", flush=True)

    for name, fn in (("3plane", full3), ("HIGHEST", fullH)):
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(X, *packed)
            s = float(out.sum())          # VALUE READ (tunnel rule)
            print(f"{name} warm {i}: {(time.perf_counter() - t0) * 1e3:.1f}"
                  f" ms (sum={s:.3f})", flush=True)


if __name__ == "__main__":
    main()
