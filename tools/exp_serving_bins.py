"""Bin-space serving kernel timing vs the 3-plane kernel (VERDICT r2
task 5). Subprocess per config (Mosaic-hang guard, SIGTERM grace).

Run: python tools/exp_serving_bins.py [TN ...]
"""

import subprocess
import sys

CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import numpy as np
from ranklib_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
from __graft_entry__ import _synthetic_ensemble
from ranklib_tpu.ops.forest_eval import forest_eval_pallas_bins, _TN
rng = np.random.default_rng(0)
ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=136, rng=rng)
*binpack, n_grid = ens._pack_matmul_bins(136)
print("grid Bm:", binpack[0].shape, "n_grid:", n_grid, flush=True)
Xs = jnp.asarray(rng.normal(size=(262144, 136)).astype(np.float32))
ev = lambda X: forest_eval_pallas_bins(X, *binpack, n_grid=n_grid)
s = float(ev(Xs).sum())
times = []
for _ in range(5):
    t0 = time.perf_counter()
    float(ev(Xs).sum())
    times.append(time.perf_counter() - t0)
print(f"RESULT bins TN={_TN} best={min(times)*1e3:.1f}ms checksum={s:.6f}",
      flush=True)
"""


def run_one(tn: int):
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
        return
    shown = False
    for line in out.splitlines():
        if line.startswith(("RESULT", "grid")):
            print(f"TN={tn}: {line}", flush=True)
            shown = True
    if not shown:
        print(f"TN={tn}: FAILED\n{out[-2000:]}", flush=True)


if __name__ == "__main__":
    tns = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192]
    for tn in tns:
        run_one(tn)
