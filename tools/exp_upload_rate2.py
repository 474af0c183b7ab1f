"""Tunnel link characterization, part 2 (run SOLO — exp_upload_rate.py's
first run overlapped a concurrently-running bench and read a degraded
12-19 MB/s at every size).

Questions this answers for the serving-upload design:
  1. Clean sequential rate at 16/64 MB (re-read of part 1 without
     contention).
  2. Does the relay compress? (zeros vs incompressible random at equal
     bytes — a big rate gap means entropy coding on the wire, which
     host-side bit-packing could exploit).
  3. Do PARALLEL device_put streams aggregate bandwidth? (4 threads x
     16 MB concurrent vs 64 MB sequential — if the relay multiplexes
     per-request, the pipelined serving path should issue uploads from a
     small thread pool instead of one queue.)
  4. f32 vs uint8 at equal BYTE count (serialization-path sanity).
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    def rate(arr, tag, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            d = jax.device_put(arr, dev)
            float(jnp.sum(d.ravel()[:16].astype(jnp.float32)))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            del d
        mb = arr.nbytes / (1 << 20)
        print(f"{tag:34s}: {best*1e3:8.1f} ms -> {mb/best:7.1f} MB/s",
              flush=True)
        return best

    rng = np.random.default_rng(0)
    rate(np.zeros((1024, 136), np.uint8), "warmup", 1)

    for mb in (16, 64):
        n = mb * (1 << 20) // 136
        rate(rng.integers(0, 255, size=(n, 136), dtype=np.uint8),
             f"{mb} MB uint8 random")
        rate(np.zeros((n, 136), np.uint8), f"{mb} MB uint8 ZEROS")
    n = 64 * (1 << 20) // (136 * 4)
    rate(rng.normal(size=(n, 136)).astype(np.float32), "64 MB f32 random")

    # parallel streams: 4 x 16 MB concurrent
    n = 16 * (1 << 20) // 136
    arrs = [rng.integers(0, 255, size=(n, 136), dtype=np.uint8)
            for _ in range(4)]
    for reps in range(2):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=4) as ex:
            ds = list(ex.map(lambda a: jax.device_put(a, dev), arrs))
        for d in ds:
            float(jnp.sum(d.ravel()[:16].astype(jnp.float32)))
        dt = time.perf_counter() - t0
        print(f"4 x 16 MB PARALLEL threads        : {dt*1e3:8.1f} ms -> "
              f"{64/dt:7.1f} MB/s aggregate", flush=True)
        del ds
    return 0


if __name__ == "__main__":
    sys.exit(main())
