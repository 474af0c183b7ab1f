"""f32 drift at ensemble depth (VERDICT round-2 task 8).

SURVEY §7 names f32 drift over long ensembles as the main parity risk.
This probe trains engine and oracle LambdaMART for 100+ trees at a
non-toy shape (60 queries x 20-40 docs) and reports, per checkpoints:

* whether tree STRUCTURES are still identical (split-for-split),
* max |engine_score - oracle_score| over all docs,
* |train NDCG@10 engine - oracle|.

Run on CPU: RANKLIB_TPU_PLATFORM=cpu python tools/exp_drift_depth.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from fixtures import synth_dataset
from ranklib_tpu.metrics.base import create_scorer, score_dataset
from ranklib_tpu.models.gbdt import LambdaMART
from tools import oracle as orc

N_TREES = int(sys.argv[1]) if len(sys.argv) > 1 else 100
ds = synth_dataset(n_queries=60, n_features=8, min_docs=20, max_docs=40,
                   gmax=2, seed=171)
scorer = create_scorer("NDCG@10")

t0 = time.perf_counter()
eng = LambdaMART(n_trees=N_TREES, n_leaves=4, learning_rate=0.1,
                 n_threshold=32, early_stop=0)
eng.fit(ds, scorer)
print(f"engine fit: {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
o = orc.OracleLambdaMART(n_trees=N_TREES, n_leaves=4, learning_rate=0.1,
                         n_threshold=32, min_leaf_support=1.0, early_stop=0,
                         metric="NDCG", k=10, gmax=scorer.gmax,
                         pointwise=False, newton=True)
oq = orc.dataset_to_oracle(ds)
o.fit(oq)
print(f"oracle fit: {time.perf_counter() - t0:.1f}s", flush=True)

# ---- structural parity, tree for tree --------------------------------------
feats = np.concatenate([q.feats for q in ds.queries], axis=0)
thr_o = orc.compute_thresholds_oracle(feats, 32)
n_struct_equal = 0
for t, (te, to) in enumerate(zip(eng.ensemble.trees, o.trees)):
    ok = te.n_slots == len(to.nodes)
    if ok:
        for s in range(te.n_slots):
            nd = to.nodes[s]
            if bool(te.is_leaf[s]) != nd.is_leaf:
                ok = False
                break
            if not nd.is_leaf and (int(te.feature[s]) != nd.feature
                                   or int(te.left[s]) != nd.left):
                ok = False
                break
    if not ok:
        print(f"STRUCTURE DIVERGES at tree {t}", flush=True)
        break
    n_struct_equal = t + 1
print(f"structure identical through {n_struct_equal}/{N_TREES} trees",
      flush=True)

# ---- score + metric drift ---------------------------------------------------
eng_scores = eng.eval_dataset(ds)
max_drift = 0.0
for q, es in zip(oq, eng_scores):
    os_ = o.predict_query(q)
    max_drift = max(max_drift, float(np.abs(np.asarray(es) - os_).max()))
m_eng = score_dataset(scorer, ds, eng_scores)[0]
m_orc = o._dataset_metric(oq, [o.predict_query(q) for q in oq])
print(f"max |score drift| over {sum(q.feats.shape[0] for q in oq)} docs: "
      f"{max_drift:.3e}")
print(f"train NDCG@10: engine {m_eng:.6f} oracle {m_orc:.6f} "
      f"|diff| {abs(m_eng - m_orc):.3e}")
