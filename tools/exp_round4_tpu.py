"""Round-4 on-chip probes (VERDICT round-3 weak #5 + next #4 measurement).

1. Serving-gate shapes never exercised on hardware: a -leaf 500 model and
   a 2000-feature model served through the routed eval — the VMEM gates
   must route them off the fused kernels WITHOUT a Mosaic hang, and the
   fallback paths must produce finite scores that match the XLA scan
   reference path.
2. Sparse CA candidate layer (ops/sparse_eval): gather/segment-sum
   mean-metric timing vs the dense-bucket evaluator at a width both fit,
   plus a wide (50K-feature) sparse-only timing — the documented
   TPU-hostile-scatter measurement.

ONE process, sized to finish well inside any timeout (operational rules).
"""

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
from ranklib_tpu.metrics.base import create_scorer
from ranklib_tpu.utils.logging import set_silent

set_silent(True)


def timed_value(fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn()).sum())       # VALUE READ (tunnel rule)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


# ---- 1. serving gates at hostile shapes ------------------------------------
from __graft_entry__ import _synthetic_ensemble

rng = np.random.default_rng(0)
for tag, (n_trees, n_leaves, F, n_docs) in (
    ("leaf500", (50, 500, 136, 65536)),
    ("feat2000", (500, 10, 2000, 16384)),
):
    ens = _synthetic_ensemble(n_trees=n_trees, n_leaves=n_leaves,
                              n_features=F, rng=rng)
    X = rng.normal(size=(n_docs, F)).astype(np.float32)
    use_forest = ens._use_forest_kernel(F)
    use_bins = ens._use_bins_kernel(F) if hasattr(ens, "_use_bins_kernel") \
        else None
    t0 = time.perf_counter()
    out = ens.eval_matrix(X)
    cold = time.perf_counter() - t0
    ok = np.isfinite(out).all()
    # host-traversal cross-check on a 512-doc subsample (v <= t -> left)
    sub = X[:512]
    ref = np.zeros(len(sub), np.float64)
    for tree, w in zip(ens.trees, ens.weights):
        node = np.zeros(len(sub), np.int64)
        live = ~tree.is_leaf[node]
        while live.any():
            f = tree.feature[node]
            go_left = sub[np.arange(len(sub)), f] <= tree.threshold[node]
            node = np.where(live,
                            np.where(go_left, tree.left[node],
                                     tree.right[node]), node)
            live = ~tree.is_leaf[node]
        ref += w * tree.output[node]
    match = bool(np.allclose(np.asarray(out[:512], np.float64), ref,
                             rtol=1e-4, atol=1e-4))
    print(f"serve[{tag}]: trees={n_trees} leaves={n_leaves} F={F} "
          f"docs={n_docs} forest_kernel={use_forest} bins={use_bins} "
          f"cold={cold:.1f}s finite={ok} match_host={match}", flush=True)

# ---- 2. sparse CA layer timings --------------------------------------------
from ranklib_tpu.ops.batched_eval import LinearMetricEvaluator
from ranklib_tpu.ops.sparse_eval import build_sparse_data, sparse_mean_metric
from ranklib_tpu.data.sparse import read_letor_sparse
import tempfile, os

scorer = create_scorer("NDCG@10")


def write_sparse(path, F, n_q, n_d, per):
    rng = np.random.default_rng(1)
    with open(path, "w") as f:
        for q in range(n_q):
            for _ in range(n_d):
                fids = np.unique(rng.integers(1, F + 1, per))
                f.write(f"{int(rng.integers(0, 3))} qid:{q + 1} "
                        + " ".join(f"{fid}:{rng.normal():.4g}"
                                   for fid in fids) + "\n")


# (a) head-to-head at a width both representations fit (F=512)
path = tempfile.mktemp(suffix=".txt")
write_sparse(path, 512, 400, 100, 20)
csr = read_letor_sparse(path, quiet=True)
os.unlink(path)
K = 64
W = jnp.asarray(np.random.default_rng(2).normal(size=(512, K))
                .astype(np.float32))
ev = LinearMetricEvaluator(csr, scorer)
t_dense = timed_value(lambda: ev.mean_metric(np.asarray(W)))
chunks, buckets, N = build_sparse_data(csr)
f_sparse = jax.jit(lambda W: sparse_mean_metric(
    scorer, W, chunks, buckets, N, len(csr.queries)))
float(np.asarray(f_sparse(W)).sum())
t_sparse = timed_value(lambda: f_sparse(W))
v_d = np.asarray(ev.mean_metric(np.asarray(W)))
v_s = np.asarray(f_sparse(W))
print(f"ca_eval[F=512,K=64,N={csr.n_docs}]: dense={t_dense*1e3:.1f}ms "
      f"sparse={t_sparse*1e3:.1f}ms maxdiff={np.abs(v_d-v_s).max():.2e}",
      flush=True)

# (b) wide sparse-only (dense would be 2.4K docs x 50K f32 = 480 MB/upload)
path = tempfile.mktemp(suffix=".txt")
write_sparse(path, 50_000, 60, 40, 10)
csr_w = read_letor_sparse(path, quiet=True)
os.unlink(path)
chunks, buckets, N = build_sparse_data(csr_w)
Ww = jnp.asarray(np.random.default_rng(3).normal(size=(50_000, 10))
                 .astype(np.float32))
f_w = jax.jit(lambda W: sparse_mean_metric(
    scorer, W, chunks, buckets, N, len(csr_w.queries)))
float(np.asarray(f_w(Ww)).sum())
t_w = timed_value(lambda: f_w(Ww))
print(f"ca_eval[F=50K,K=10,N={csr_w.n_docs}]: sparse={t_w*1e3:.2f}ms/call "
      f"-> one full CA pass (50K coords) ~{t_w*50_000/60:.1f} min",
      flush=True)
print("done", flush=True)
