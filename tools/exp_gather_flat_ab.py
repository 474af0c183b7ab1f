"""A/B: per-chunk score gathers vs ONE flat gather + slices.

Follow-up to exp_gather_scale.py (gathers are the majority of the
lambda phase's time at 30K scale). The lambda phase currently issues
one [rows, D] gather per bucket chunk (34 chunks at 30K scale); this
probe asks whether concatenating every chunk's didx into a single
[flat_len] index vector and gathering ONCE (then slicing per chunk —
free views of the materialized result) is faster on the same table.
Bit-identical values either way; only the op structure differs.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from _gather_fixture import build_didx


def run(tag, fn, table, K=20):
    k_rounds = jax.jit(lambda s: jax.lax.fori_loop(
        0, K, lambda i, x: fn(x), s))
    t = k_rounds(table)
    float(t[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        t = k_rounds(t)
        float(t[0])
        dt = (time.perf_counter() - t0) / K
        best = dt if best is None or dt < best else best
    print(f"  {tag}: {best * 1e3:7.2f} ms/round", flush=True)
    return best


for n_queries in (30000, 240000):
    N, chunks_np = build_didx(n_queries, 7)
    table = jnp.asarray(np.random.default_rng(0)
                        .normal(size=N + 1).astype(np.float32))
    chunks = [jnp.asarray(c) for c in chunks_np]
    flat_idx = jnp.asarray(np.concatenate(
        [c.reshape(-1) for c in chunks_np]))
    shapes = [c.shape for c in chunks_np]
    offs = np.concatenate([[0], np.cumsum([c.size for c in chunks_np])])

    print(f"=== {n_queries}q / {N / 1e6:.1f}M docs ===", flush=True)

    def per_chunk(s):
        acc = jnp.float32(0.0)
        for c in chunks:
            acc += s[c].sum()
        return s * 0.999 + acc * 1e-12

    def flat(s):
        g = s[flat_idx]
        acc = jnp.float32(0.0)
        for (r, d), o in zip(shapes, offs[:-1]):
            acc += g[o: o + r * d].reshape(r, d).sum()
        return s * 0.999 + acc * 1e-12

    a = run("per-chunk gathers", per_chunk, table)
    b = run("one flat gather  ", flat, table)
    print(f"  flat/per-chunk: {b / a:.2f}x", flush=True)
