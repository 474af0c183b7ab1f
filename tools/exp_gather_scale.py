"""Mechanism check for the >=28.8M-doc lambda-phase droop.

exp_droop_phase_split.py attributed the droop entirely to the lambda
phase (per-Mdoc 1.96x from 3.6M -> 28.8M docs; growth/base flat). The
leading hypothesis is the phase's bucket-chunk score GATHERS/SCATTER
over the [N] f32 score table degrading as the table outgrows ~100 MB.
This probe isolates exactly that access pattern with no lambda math:

  * didx chunks built like boost._device_buckets — each row is a
    query's contiguous 80-160-doc run, rows within a chunk are
    same-size-class queries scattered across the dataset order;
  * a jitted program gathers every chunk from the table, sums, and
    applies the tb_inv-style inverse-permutation gather;
  * K chained iterations per value read at N = 3.6M and N = 28.8M.

If ns/element roughly doubles with the table size, the droop is the
gather locality; if it is flat, the droop lives in the lambda math's
XLA scheduling instead.
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

from _gather_fixture import build_didx as _build_chunks


def build_didx(n_queries, seed):
    import jax.numpy as jnp

    N, chunks_np = _build_chunks(n_queries, seed)
    chunks = [jnp.asarray(c) for c in chunks_np]
    flat = np.concatenate([np.asarray(c).reshape(-1) for c in chunks])
    inv = np.full(N + 1, len(flat), np.int64)
    real = flat < N
    inv[flat[real]] = np.flatnonzero(real)
    return N, chunks, jnp.asarray(inv[:N].astype(np.int32)), len(flat)


for n_queries in (30000, 240000):
    N, chunks, tb_inv, flat_len = build_didx(n_queries, 7)
    table = jnp.asarray(np.random.default_rng(0)
                        .normal(size=N + 1).astype(np.float32))

    def one_round(s):
        # per-chunk gather (the lambda phase's score reads) ...
        parts = [s[c] for c in chunks]
        cat = jnp.concatenate([p.reshape(-1) for p in parts])
        cat = jnp.concatenate([cat, jnp.zeros(1, jnp.float32)])
        # ... and the tb_inv inverse-permutation gather (the scatter-back)
        upd = cat[jnp.concatenate([tb_inv, jnp.int32([flat_len])])]
        return s * 0.999 + 0.001 * upd

    @jax.jit
    def k_rounds(s):
        return jax.lax.fori_loop(0, 20, lambda i, x: one_round(x), s)

    table = k_rounds(table)
    float(table[0])                       # compile + settle
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        table = k_rounds(table)
        float(table[0])
        dt = (time.perf_counter() - t0) / 20
        best = dt if best is None or dt < best else best
    gathered = flat_len + N               # elements moved per round
    print(f"N={N/1e6:5.1f}M: {best*1e3:7.2f} ms/round  "
          f"{best*1e9/gathered:5.2f} ns/elem  ({len(chunks)} chunks)",
          flush=True)
