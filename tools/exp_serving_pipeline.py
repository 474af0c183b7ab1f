"""A/B the pipelined host-binned serving path (VERDICT r04 #3).

Old path (r05 baseline, tools/exp_round5_adjudicate.py): one monolithic
binsT device_put + device-side chunking — 3.35 s best at 262K docs x
1000 trees against a 45 ms kernel (74x). New path: chunked worker-thread
binning + streamed uploads + async kernel dispatch
(ensemble._eval_matrix_hostbin). This probe sweeps the chunk budget and
prints the per-phase breakdown so the remaining gap is attributed.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax

    from ranklib_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)

    from __graft_entry__ import _synthetic_ensemble

    rng = np.random.default_rng(0)
    ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=136,
                              rng=rng)
    out = {}
    for n_docs in (262144, 1048576):
        Xh = np.asarray(rng.normal(size=(n_docs, 136)), np.float32)
        for cmb in ("8", "16", "32", "64"):
            os.environ["RANKLIB_TPU_SERVE_CHUNK_MB"] = cmb
            ens.eval_matrix(Xh)            # compile/warm this geometry
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                ens.eval_matrix(Xh)
                dtm = (time.perf_counter() - t0) * 1e3
                if best is None or dtm < best:
                    best = dtm
                    bd = dict(ens.last_serve_breakdown)
            key = f"{n_docs}docs_chunk{cmb}mb"
            out[key] = {"e2e_ms": round(best, 1), **bd}
            print(f"{key}: {out[key]}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
