"""Dated re-probe of the remote-Mosaic hazards (VERDICT round-3 #8).

Two blockers are on file (CLAUDE.md hazard list, recorded at jax 0.9.0):
  1. sub-32-bit compares inside Pallas kernels crash the remote compiler
     (blocks int16 device bin storage);
  2. the histogram kernel HANGS the remote compiler at every bin count
     except 256 (B=11 and lane-aligned B=128 both reproduced).

Each probe runs in its OWN SUBPROCESS with a timeout + SIGTERM grace
(never SIGKILL-ing a chip holder from outside — a hang is terminated the
gentle way and the verdict recorded). Run on any jax/image bump; prints
a dated PASS/FAIL/HANG line per probe.
"""

import subprocess
import sys
import time

PROBES = {
    "int16_compare_pallas": r"""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
import numpy as np
def kern(x_ref, o_ref):
    o_ref[...] = (x_ref[...] > jnp.int16(3)).astype(jnp.float32)
x = jnp.arange(8 * 128, dtype=jnp.int16).reshape(8, 128) % 7
f = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
print("result_sum", float(f(x).sum()))
""",
    "hist_radix_B128": r"""
import jax, jax.numpy as jnp, numpy as np
from ranklib_tpu.ops.histogram import hist_pallas_radix
F, N = 16, 4096
bt = jnp.asarray(np.random.default_rng(0).integers(0, 128, (F, N)), jnp.int32)
g = jnp.ones((N,), jnp.float32)
m = jnp.ones((N,), bool)
out = hist_pallas_radix(bt, g, m, 128)
print("result_sum", float(out.sum()))
""",
}


def run_probe(name: str, body: str, timeout_s: float = 150.0) -> str:
    code = "import sys; sys.path.insert(0, '/root/repo')\n" + body
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    t0 = time.time()
    try:
        out, err = p.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        p.terminate()
        try:
            p.communicate(timeout=60)
        except subprocess.TimeoutExpired:
            # NEVER SIGKILL a chip holder (operational rules) — abandon
            # the process; it exits when the compile RPC breaks
            pass
        # a terminated chip holder can wedge the tunnel for ~2-5 min and
        # the NEXT probe would falsely read HANG — wait it out
        print("    (hang terminated; waiting 240 s for the tunnel lease "
              "before the next probe)", flush=True)
        time.sleep(240)
        return f"HANG (>{timeout_s:.0f}s — blocker persists)"
    dt = time.time() - t0
    if p.returncode == 0 and "result_sum" in out:
        return f"PASS in {dt:.0f}s ({out.strip().splitlines()[-1]})"
    tail = (err.strip().splitlines() or ["<no stderr>"])[-1][:200]
    return f"FAIL rc={p.returncode} in {dt:.0f}s ({tail})"


if __name__ == "__main__":
    import datetime

    import jax

    print(f"date={datetime.date.today()} jax={jax.__version__}",
          flush=True)
    for name, body in PROBES.items():
        print(f"{name}: probing...", flush=True)
        print(f"{name}: {run_probe(name, body)}", flush=True)
