"""Serving doc-tile (TN) sweep — VERDICT round-2 task 5.

~22 ms of the 52.9 ms forest-eval time is per-block fixed cost at
TN=2048 (5120 grid blocks). Each TN candidate runs in a SUBPROCESS
(Mosaic has hung on unusual shapes before — a hang must not wedge this
runner, and SIGTERM-with-grace avoids wedging the tunnel for the next
process). Checksums are compared against the traversal-exact _mm_eval
value recorded by the first (baseline) run.

Run: python tools/exp_serving_tn.py [TN ...]
"""

import subprocess
import sys

CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
import os
import jax
import numpy as np
from ranklib_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
from __graft_entry__ import _synthetic_ensemble
from ranklib_tpu.ops.forest_eval import forest_eval_pallas_full, _TN
rng = np.random.default_rng(0)
ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=136, rng=rng)
packed = ens._pack_matmul(136)
Xs = jnp.asarray(rng.normal(size=(262144, 136)).astype(np.float32))
ev = jax.jit(forest_eval_pallas_full)
s = float(ev(Xs, *packed).sum())          # compile + warm + VALUE READ
times = []
for _ in range(5):
    t0 = time.perf_counter()
    float(ev(Xs, *packed).sum())
    times.append(time.perf_counter() - t0)
print(f"RESULT TN={_TN} best={min(times)*1e3:.1f}ms checksum={s:.6f}",
      flush=True)
"""


def run_one(tn: int) -> str | None:
    import os

    env = dict(os.environ, RANKLIB_TPU_SERVE_TN=str(tn))
    p = subprocess.Popen([sys.executable, "-c", CHILD], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    try:
        out, _ = p.communicate(timeout=900)
    except subprocess.TimeoutExpired:
        p.terminate()
        try:
            p.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            p.kill()
            p.communicate()
        print(f"TN={tn}: TIMEOUT (Mosaic hang?)", flush=True)
        return None
    for line in out.splitlines():
        if line.startswith("RESULT"):
            print(line, flush=True)
            return line
    print(f"TN={tn}: FAILED\n{out[-2000:]}", flush=True)
    return None


if __name__ == "__main__":
    tns = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192]
    for tn in tns:
        run_one(tn)
