"""A/B: end-to-end eval_matrix from HOST features — f32 upload path vs the
host-binned uint8 upload path (RANKLIB_TPU_SERVE_HOSTBIN). Also times a raw
device_put of the f32 matrix to expose the tunnel bandwidth that motivates
the route. 1000-tree, 10-leaf, 136-feature model (bench serving shape) at
1M and 4M docs.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ranklib_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
import jax

print("backend:", jax.default_backend(), flush=True)

from __graft_entry__ import _synthetic_ensemble

rng = np.random.default_rng(0)
ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=136, rng=rng)
assert ens._use_bins_kernel(136), "bins route must apply for this A/B"

for N in (1 << 20, 1 << 22):
    X = rng.normal(size=(N, 136)).astype(np.float32)
    t0 = time.perf_counter()
    xd = jax.device_put(X)
    float(xd[0, 0])                  # MEASUREMENT RULE: force a value read
    up = time.perf_counter() - t0
    print(f"N={N}: raw f32 device_put {up:.2f}s "
          f"({X.nbytes / up / 1e6:.0f} MB/s)", flush=True)
    del xd

    for mode in ("0", "1"):
        os.environ["RANKLIB_TPU_SERVE_HOSTBIN"] = mode
        times, ref = [], None
        for rep in range(3):
            t0 = time.perf_counter()
            s = ens.eval_matrix(X)               # returns host np: full sync
            times.append(time.perf_counter() - t0)
            ref = s
        lbl = "hostbin" if mode == "1" else "f32-upload"
        print(f"N={N}: {lbl:10s} best {min(times):.2f}s "
              f"(all {[f'{t:.2f}' for t in times]}) "
              f"checksum {float(np.sum(ref)):.6f}", flush=True)
