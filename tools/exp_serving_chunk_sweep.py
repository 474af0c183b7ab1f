"""Probe: tree-chunk (TC) and doc-tile (TN) sweep for the fused 3-plane
forest-eval kernel at the recorded serving shape (262K docs × 1000 trees,
136 feats, 10 leaves).

TC sets TCM = TC·9 (sel rows / hits contraction) and TCL = TC·10, which
pads to a 128 lane multiple: TC=16 → TCL 160→256 (1.6× hits waste);
TC=25 → 250→256 (1.02×); TC=38 → 380→384 (1.01×). Larger TC also shrinks
the grid (fewer per-block overheads) at more VMEM per block.

Run on the real chip: python tools/exp_serving_chunk_sweep.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import ranklib_tpu.ops.forest_eval as fe
    from __graft_entry__ import _synthetic_ensemble

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    F = 136
    ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=F,
                              rng=rng)
    N = 262144
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    ref_sum = None
    for TC in (16, 25, 32, 38):
        ens._TREE_CHUNK = TC
        ens._mm = None
        packed = tuple(jnp.asarray(a) for a in ens._pack_matmul(F))
        nch, TCM, TCL = packed[2].shape
        TCLp = ((TCL + 127) // 128) * 128
        for TN in (2048, 4096):
            # rough per-block VMEM (bytes): xt3 + sel3 double-buffered +
            # vals/pred/hits intermediates
            Fp3 = 3 * 256
            est = (2 * Fp3 * TN * 2 + 2 * TCM * Fp3 * 2
                   + 2 * TCM * TCLp * 2 + TCM * TN * 4 + TCM * TN * 2
                   + TN * TCLp * 4 + 8 * TN * 4)
            if est > 13 << 20:
                print(f"TC={TC} TN={TN}: skip (VMEM est {est >> 20} MB)",
                      flush=True)
                continue
            fe._TN = TN
            fn = jax.jit(fe.forest_eval_pallas_full)
            try:
                t0 = time.perf_counter()
                out = fn(X, *packed)
                s = float(out.sum())
                cold = time.perf_counter() - t0
            except Exception as e:  # Mosaic shape hazards
                print(f"TC={TC} TN={TN}: FAILED {type(e).__name__}",
                      flush=True)
                continue
            if ref_sum is None:
                ref_sum = s
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                out = fn(X, *packed)
                s = float(out.sum())          # VALUE READ (tunnel rule)
                times.append(time.perf_counter() - t0)
            ok = "OK" if abs(s - ref_sum) < 1e-3 else f"SUM {s}!"
            print(f"TC={TC} (TCM={TCM} TCLp={TCLp} nch={nch}) TN={TN}: "
                  f"cold {cold:.1f}s warm {min(times) * 1e3:.1f} ms [{ok}]",
                  flush=True)
    fe._TN = 2048


if __name__ == "__main__":
    main()
