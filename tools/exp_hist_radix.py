"""A/B: one-hot histogram kernel vs radix-16 variant on TPU.

Times K chained kernel calls per value-read (the ~30 ms tunnel sync and
dispatch amortize across K), at bench shape (F=136, N=180224, B=256),
for a full root histogram and a half-masked child histogram (the
subtraction-trick shape where the doc-tile skip fires).
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

from ranklib_tpu.ops.histogram import hist_pallas, hist_pallas_radix

N, F, B, K = 180224, 136, 256, 30
rng = np.random.default_rng(0)
binned_T = jnp.asarray(rng.integers(0, B, size=(F, N)).astype(np.int32))
grad = jnp.asarray(rng.normal(size=N).astype(np.float32))
full = jnp.ones((N,), jnp.float32)
half = jnp.asarray((rng.random(N) < 0.5).astype(np.float32))


def chain(fn):
    @jax.jit
    def run(binned_T, grad, mask):
        g = grad
        for _ in range(K):
            h = fn(binned_T, g, mask, B)
            # data dependence so calls cannot collapse: feed a scalar back
            g = grad + 1e-30 * h[0, 0, 0]
        return h
    return run


for name, fn in [("onehot", hist_pallas), ("radix16", hist_pallas_radix)]:
    run = chain(fn)
    for mname, mask in [("full", full), ("half", half)]:
        h = run(binned_T, grad, mask)
        float(h[0, 0, 0])                       # compile + settle
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            h = run(binned_T, grad, mask)
            float(h[0, 0, 0])                   # forced value read
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K * 1e3
        print(f"{name:8s} {mname}: {per:6.2f} ms/call", flush=True)
