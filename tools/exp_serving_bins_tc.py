"""Tree-chunk (TC) sweep for the BIN-SPACE serving kernel.

TC=25 was tuned for the 3-plane kernel (tools/exp_serving_chunk_sweep);
the bins kernel has a different cost balance (1-pass selection, binning
prologue amortized over chunks), so re-sweep. Subprocess per config
(Mosaic-hang guard with SIGTERM grace).

Run: python tools/exp_serving_bins_tc.py [TC ...]
"""

import subprocess
import sys

CHILD = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import numpy as np
from ranklib_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
from ranklib_tpu.gbdt.ensemble import TreeEnsemble
TC = int(os.environ["PROBE_TC"])
TreeEnsemble._TREE_CHUNK = TC
from __graft_entry__ import _synthetic_ensemble
from ranklib_tpu.ops.forest_eval import forest_eval_pallas_bins
rng = np.random.default_rng(0)
ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=136, rng=rng)
*binpack, n_grid = ens._pack_matmul_bins(136)
Xs = jnp.asarray(rng.normal(size=(262144, 136)).astype(np.float32))
ev = lambda X: forest_eval_pallas_bins(X, *binpack, n_grid=n_grid)
s = float(ev(Xs).sum())
times = []
for _ in range(5):
    t0 = time.perf_counter()
    float(ev(Xs).sum())
    times.append(time.perf_counter() - t0)
print(f"RESULT TC={TC} best={min(times)*1e3:.1f}ms checksum={s:.6f}",
      flush=True)
"""


def run_one(tc: int):
    import os

    env = dict(os.environ, PROBE_TC=str(tc))
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
        print(f"TC={tc}: TIMEOUT (Mosaic hang?)", flush=True)
        return
    for line in out.splitlines():
        if line.startswith("RESULT"):
            print(line, flush=True)
            return
    print(f"TC={tc}: FAILED\n{out[-1500:]}", flush=True)


if __name__ == "__main__":
    tcs = [int(a) for a in sys.argv[1:]] or [16, 25, 32, 50]
    for tc in tcs:
        run_one(tc)
