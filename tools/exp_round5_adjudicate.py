"""Round-5 adjudication probe (VERDICT r04 weak #1).

BENCH_r04 recorded three extras regressions vs r03 on a visibly congested
session (cold_compile 157 s, fit_spread 15.6 s, fit-diff instrument 32.16
ms/round vs the probe's 19.05): adarank_300rounds_s 29.94 (r03: 2.81),
rankboost_300rounds_s 13.49 (r03: 3.6), serving_e2e 7574 ms (best prior
1.6 s). The round-4 session also refactored exactly those paths (AdaRank
sparse-S builder + DP, RankBoost int16 dense bins), so "congestion vs real
regression" must be adjudicated by a fresh measurement on the SAME commit
lineage, quiet session.

Protocol: bench-identical shapes (synth 1500q/136f, NDCG@10), compile fit
first, then 3 timed fits each; serving e2e best-of-3 at 262K docs x 1000
trees. Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax
    import numpy as np

    from ranklib_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)

    from ranklib_tpu.metrics.base import create_scorer
    from ranklib_tpu.utils.logging import set_silent
    from tests.fixtures import synth_dataset

    set_silent(True)
    train = synth_dataset(n_queries=1500, n_features=136, min_docs=80,
                          max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
    scorer = create_scorer("NDCG@10")
    out = {}

    from ranklib_tpu.models.adarank import AdaRank
    from ranklib_tpu.models.rankboost import RankBoost

    for name, make in (("rankboost", lambda R: RankBoost(n_rounds=R)),
                       ("adarank", lambda R: AdaRank(n_rounds=R))):
        t0 = time.perf_counter()
        make(2).fit(train, scorer)
        out[f"{name}_compile_s"] = round(time.perf_counter() - t0, 2)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            make(300).fit(train, scorer)
            times.append(time.perf_counter() - t0)
        out[f"{name}_300rounds_s"] = [round(t, 2) for t in times]
        print(f"{name}: {out[f'{name}_300rounds_s']}", file=sys.stderr,
              flush=True)

    # serving e2e (host features -> scores) at the bench shape
    from __graft_entry__ import _synthetic_ensemble
    rng = np.random.default_rng(0)
    ens = _synthetic_ensemble(n_trees=1000, n_leaves=10, n_features=136,
                              rng=rng)
    Xh = np.asarray(rng.normal(size=(262144, 136)), np.float32)
    t0 = time.perf_counter()
    ens.eval_matrix(Xh)
    out["serving_e2e_warm_s"] = round(time.perf_counter() - t0, 2)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ens.eval_matrix(Xh)
        times.append(time.perf_counter() - t0)
    out["serving_e2e_ms"] = [round(t * 1e3, 1) for t in times]

    # device-kernel-only for the ratio
    import jax.numpy as jnp
    ev, _ = ens._device_eval_fn(136)
    Xs = jnp.asarray(Xh)
    float(ev(Xs).sum())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(ev(Xs).sum())
        times.append(time.perf_counter() - t0)
    out["serving_kernel_ms"] = [round(t * 1e3, 1) for t in times]

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
