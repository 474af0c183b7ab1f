"""Probe: int8 x int8 -> int32 MXU dot inside a Pallas kernel via the relay.

v5e rates int8 matmul at ~2x bf16 (394 TOPS vs 197 TFLOPS). If an int8 dot
COMPILES through the remote Mosaic relay and the 2x materializes, the radix
histogram's A-matrix (one-hot rows scaled by gm) could ride the int8 path:
counts exactly (0/1 products, i32 accumulate), grads via per-tile
quantization. Known hazard classes at jax 0.9.0 (CLAUDE.md): sub-32-bit
VMEM loads COMPILE (uint8/int16 proven), sub-32-bit COMPARES crash. A dot
is a third category - probe before designing around it.

Protocol: one fori_loop-chained dispatch per variant (100 dots over a
[256, 1M]x[1M, 128] problem = ~35 ms of f32 MXU at speed-of-light), forced
value read, best of 3. Failure mode expected if blocked: fast MosaicError
(~6-9 s, "tpu_compile_helper subprocess exit code 1").
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ranklib_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

TN = 1024
NT = 1024                      # doc tiles -> N = 1.05M
REPS = 100


def _kernel_i8(a_ref, b_ref, out_ref):
    d = pl.program_id(0)

    @pl.when(d == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _kernel_f32(a_ref, b_ref, out_ref):
    d = pl.program_id(0)

    @pl.when(d == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def make(variant):
    kern = _kernel_i8 if variant == "int8" else _kernel_f32
    dt = jnp.int8 if variant == "int8" else jnp.float32
    ot = jnp.int32 if variant == "int8" else jnp.float32

    def one(a, b):
        return pl.pallas_call(
            kern,
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((256, TN), lambda d: (0, d),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, 128), lambda d: (d, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((256, 128), lambda d: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 128), ot),
        )(a, b)

    @jax.jit
    def run(a, b):
        a = a.astype(dt)               # once, outside the rep loop
        b = b.astype(dt)

        def body(i, acc):
            return acc + one(a, b)

        return jax.lax.fori_loop(0, REPS, body,
                                 jnp.zeros((256, 128), ot))

    return run


rng = np.random.default_rng(0)
a_h = rng.integers(0, 2, size=(256, NT * TN), dtype=np.int8)
b_h = rng.integers(0, 2, size=(NT * TN, 128), dtype=np.int8)
flops = 2 * 256 * 128 * NT * TN * REPS

for variant in ("f32", "int8"):
    try:
        run = make(variant)
        a = jax.device_put(a_h)
        b = jax.device_put(b_h)
        out = run(a, b)
        s0 = int(np.asarray(out).sum())         # compile + settle
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(a, b)
            int(np.asarray(out)[0, 0])          # forced value read
            best = min(best, time.perf_counter() - t0)
        print(f"{variant}: {best * 1e3:.1f} ms  "
              f"{flops / best / 1e12:.1f} T(fl)ops  checksum {s0}",
              flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:300]
        print(f"{variant}: FAILED  {type(e).__name__}: {msg}", flush=True)
