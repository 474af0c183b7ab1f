"""Sweep the radix histogram kernel's doc-tile width on real hardware.

Hypothesis: at TN=1024 the (17 f-tiles × 176 doc-tiles) grid pays ~µs of
per-invocation overhead — a large share of the measured 3.25 ms/pass at
bench shape (VPU+MXU theoretical is ~1.3 ms). Larger doc tiles quarter
the invocation count at ~2.2 KB/doc of VMEM intermediates (16 MB/core
budget). Also reports the dense one-hot kernel and XLA scatter baseline.

Run on the TPU; each timing forces a VALUE READ (CLAUDE.md measurement
rule).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from ranklib_tpu.ops.histogram import hist_pallas, hist_pallas_radix, hist_xla

F, N, B = 136, 180224, 256
rng = np.random.default_rng(0)
binned_T = jnp.asarray(rng.integers(0, B, size=(F, N), dtype=np.int32))
grad = jnp.asarray(rng.normal(size=N).astype(np.float32))
mask = jnp.asarray(np.ones(N, np.float32))

ref = np.asarray(hist_xla(binned_T, grad, mask, B))


def bench(tag, fn, check=True):
    out = fn()
    got = np.asarray(out)                      # value read
    if check:
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1)
        assert err < 2e-2, f"{tag}: rel err {err}"
    best = 1e9
    K = 20
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(K)]
        float(outs[-1][0, 0, 0])               # drain the chain
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag}: {best * 1e3:.2f} ms/pass", flush=True)


# Baselines first, proven TN=1024 next; UNPROVEN widths only when named
# on argv — the documented Mosaic failure mode is a silent remote-compiler
# HANG (not an exception), which no try/except can catch and which holds
# the exclusive chip. Probe one unproven width per process:
#     python tools/exp_radix_tn.py 2048
#     python tools/exp_radix_tn.py 4096
bench("xla segment-sum", lambda: hist_xla(binned_T, grad, mask, B))
bench("one-hot TN=1024", lambda: hist_pallas(binned_T, grad, mask, B))
widths = [int(a) for a in sys.argv[1:]] or [1024]
for tn in widths:
    print(f"compiling radix TN={tn} (a silent hang here = Mosaic hazard; "
          "wait 2 min after killing before retrying)", flush=True)
    bench(f"radix TN={tn:4d}",
          lambda tn=tn: hist_pallas_radix(binned_T, grad, mask, B, tn=tn))
