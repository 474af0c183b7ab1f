"""Root-cause the >=28.8M-doc throughput droop (VERDICT r04 weak #4).

Measured history: steady-state LambdaMART throughput is FLAT at ~10.9M
doc*trees/s from 180K through 14.4M docs, then -21% at 28.8M and -29% at
57.6M (exp_240k/480k_round_probe.py). This probe runs the chained-step
phase split (exp_phase_split.py protocol: config differencing, K donated
rounds per value read) at BOTH 3.6M docs (flat region) and 28.8M docs
(droop region) in one process, and prints per-phase ms *per 1M docs* so
the droop attributes to a phase:

  B silent        : lambda + 9-split growth + leaves/score (bench config)
  C pointwise     : MART residuals, same growth   -> B-C = lambda phase
  D nl=2          : lambda + root hist only       -> B-D = 8 growth iters

If growth droops -> histogram HBM reads saturate (uint8 bin matrix
capacity pressure); if lambda droops -> pair-block bandwidth; if base
droops -> score-update gathers.
"""

import gc
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from fixtures import synth_dataset
from ranklib_tpu.data.dataset import flatten
from ranklib_tpu.gbdt.binning import bin_features, compute_thresholds
from ranklib_tpu.gbdt.boost import init_state, make_boost_data, make_round_step
from ranklib_tpu.models.gbdt import _pad_doc_count
from ranklib_tpu.metrics.base import create_scorer
from ranklib_tpu.utils.logging import set_silent

set_silent(True)
scorer = create_scorer("NDCG@10")


def build(n_queries):
    t0 = time.perf_counter()
    train = synth_dataset(n_queries=n_queries, n_features=136, min_docs=80,
                          max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
    feats, labels, _ = flatten(train)
    # host-memory-lean (the 480k recipe): make_boost_data only reads
    # query STRUCTURE, so drop per-query feature arrays
    _empty = np.empty((0, 136), np.float32)
    for q in train:
        q.feats = _empty
    N, F = feats.shape
    thresholds, _ = compute_thresholds(feats, 256)
    B = thresholds.shape[1]
    Npad = _pad_doc_count(N)
    binned32 = bin_features(feats, thresholds)
    del feats
    gc.collect()
    assert binned32.max() < 256          # train values land in real bins
    binned = binned32.astype(np.uint8)
    del binned32
    gc.collect()
    binned = np.pad(binned, ((0, Npad - N), (0, 0)))
    labels_pad = np.pad(labels, (0, Npad - N)).astype(np.float32)
    data, Npad, Nvpad = make_boost_data(train, binned, labels_pad, N, None,
                                        None, None, scorer=scorer)
    del binned
    gc.collect()
    print(f"setup({n_queries}q) {time.perf_counter() - t0:.0f}s  N={N} "
          f"Npad={Npad}", flush=True)
    return train, data, N, F, B, Npad, Nvpad


def split_at(n_queries, K, reps=2):
    train, data, N, F, B, Npad, Nvpad = build(n_queries)

    def run(tag, **kw):
        args = dict(n_bins=B, min_leaf_support=1, learning_rate=0.1,
                    newton=not kw.get("pointwise", False),
                    n_queries=n_queries, n_vqueries=1, train_metric=False)
        args.update(kw)
        nl = args.pop("n_leaves", 10)
        step = make_round_step(scorer, n_leaves=nl, **args)
        state = init_state(reps * K + 1, nl, Npad, Nvpad, F)
        state = step.multi(state, jnp.int32(0), jnp.int32(1), data)
        float(state.scores[0])
        best = 1e9
        for rep in range(reps):
            t0 = time.perf_counter()
            state = step.multi(state, jnp.int32(1 + rep * K),
                               jnp.int32(1 + (rep + 1) * K), data)
            float(state.scores[0])
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"  {tag}: {best * 1e3:.1f} ms/round "
              f"({N / best / 1e6:.2f}M doc*trees/s)", flush=True)
        del state
        return best

    print(f"=== {n_queries}q / {N / 1e6:.1f}M docs ===", flush=True)
    b = run("B silent (bench)  ", pointwise=False)
    c = run("C pointwise (MART)", pointwise=True)
    d = run("D nl=2            ", pointwise=False, n_leaves=2)
    phases = {"lambda": b - c, "growth8": b - d,
              "base": c - (b - d), "total": b}
    for k, v in phases.items():
        print(f"  {k:8s}: {v * 1e3:8.1f} ms  = {v * 1e9 / N:6.2f} ms/Mdoc",
              flush=True)
    del data
    gc.collect()
    return N, phases


n1, p1 = split_at(30000, K=8)
n2, p2 = split_at(240000, K=5)
print("=== per-Mdoc ratio (droop attribution) ===", flush=True)
for k in ("lambda", "growth8", "base", "total"):
    r1, r2 = p1[k] * 1e9 / n1, p2[k] * 1e9 / n2
    print(f"{k:8s}: {r1:6.2f} -> {r2:6.2f} ms/Mdoc  ({r2 / r1:5.2f}x)",
          flush=True)
