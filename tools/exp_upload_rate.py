"""Host->device upload rate vs transfer size through the tunnel.

Motivation (VERDICT r04 weak #3): serving e2e is ~25-100x the device
kernel, and prior spot measurements showed raw device_put collapsing at
multi-GB sizes (224 MB/s at 544 MB -> 15 MB/s at 2.2 GB). If the
collapse is a per-transfer-size effect, CHUNKING the upload recovers
bandwidth on top of enabling upload/kernel overlap. This probe maps the
rate curve so the pipelined hostbin path can pick its chunk size.

Measures, per size: (a) the blocking device_put wall time, (b) the extra
time until a value READ of the array completes (does device_put return
before the bytes land?), (c) for the largest size, one big put vs the
same bytes as a sequence of 32 MB puts.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    def put_timed(arr):
        t0 = time.perf_counter()
        d = jax.device_put(arr, dev)
        t_put = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(d[:, :128].astype(jnp.int32)))  # cheap value read
        t_read = time.perf_counter() - t0
        return t_put, t_read, d

    # warm the dispatch path
    put_timed(np.zeros((1024, 136), np.uint8))

    for mb in (4, 16, 32, 64, 128, 256, 512):
        n = mb * (1 << 20) // 136
        arr = np.random.default_rng(0).integers(
            0, 255, size=(n, 136), dtype=np.uint8)
        best = None
        for _ in range(2):
            t_put, t_read, d = put_timed(arr)
            del d
            tot = t_put + t_read
            if best is None or tot < best[2]:
                best = (t_put, t_read, tot)
        rate = mb / best[2]
        print(f"{mb:4d} MB: put {best[0]*1e3:8.1f} ms  read +{best[1]*1e3:7.1f}"
              f" ms  -> {rate:7.1f} MB/s", flush=True)

    # chunked vs single at 256 MB
    mb = 256
    n = mb * (1 << 20) // 136
    arr = np.random.default_rng(1).integers(0, 255, size=(n, 136),
                                            dtype=np.uint8)
    for cmb in (16, 32, 64):
        cn = cmb * (1 << 20) // 136
        t0 = time.perf_counter()
        ds = [jax.device_put(arr[lo:lo + cn], dev)
              for lo in range(0, n, cn)]
        for d in ds:
            float(jnp.sum(d[:, :1].astype(jnp.int32)))
        dt = time.perf_counter() - t0
        print(f"{mb} MB as {cmb} MB chunks: {dt*1e3:8.1f} ms "
              f"-> {mb/dt:7.1f} MB/s", flush=True)
        del ds
    return 0


if __name__ == "__main__":
    sys.exit(main())
