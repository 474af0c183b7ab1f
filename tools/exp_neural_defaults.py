"""Time the neural rankers at REFERENCE DEFAULTS at bench scale —
VERDICT round-1 item 6: "RankNet 100 epochs and ListNet 1500 epochs at
179K docs on-chip".

Shape: 1500 train queries x 80-160 docs x 136 feats (~179K docs), 300
validation queries, NDCG@10, per-epoch validation + best-weight snapshot
(the reference's semantics, ref: learning/neuralnet/RankNet.java:~150).

Each ranker is fit twice in one process: the first fit pays the XLA
compile (the tunnel recompiles server-side regardless of the client
cache — CLAUDE.md), the second is the warm number that reflects steady
state. Runs silent (no mis-ordered-pair tracking pass, matching -silent).

Run: python tools/exp_neural_defaults.py [ranknet|listnet|lambdarank ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

from ranklib_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from fixtures import synth_dataset
from ranklib_tpu.metrics.base import create_scorer
from ranklib_tpu.models.neural import LambdaRank, ListNet, RankNet
from ranklib_tpu.utils.logging import set_silent

set_silent(True)
scorer = create_scorer("NDCG@10")
train = synth_dataset(n_queries=1500, n_features=136, min_docs=80,
                      max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
val = synth_dataset(n_queries=300, n_features=136, min_docs=80,
                    max_docs=160, gmax=4, seed=7, w_seed=11, signal=2.5)
n_docs = sum(len(q.labels) for q in train.queries)
print(f"train: {len(train.queries)} queries, {n_docs} docs", flush=True)

CASES = {
    "ranknet": (RankNet, {}),            # 100 epochs, lr 5e-5, 1x10 hidden
    "lambdarank": (LambdaRank, {}),      # same defaults as RankNet
    "listnet": (ListNet, {}),            # 1500 epochs, lr 1e-5, linear
}
want = [a for a in sys.argv[1:] if a in CASES] or list(CASES)

for name in want:
    cls, hp = CASES[name]
    times = []
    for rep in range(2):
        r = cls(**hp)
        t0 = time.perf_counter()
        r.fit(train, scorer, validation=val)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"{name} fit[{rep}] ({r.n_epoch} epochs): {dt:.1f}s",
              flush=True)
    from ranklib_tpu.metrics.base import score_dataset
    m, _ = score_dataset(scorer, val, r.eval_dataset(val))
    per_ep = times[-1] / r.n_epoch * 1000
    print(f"{name}: warm {times[-1]:.1f}s total, {per_ep:.1f} ms/epoch, "
          f"val NDCG@10 {m:.4f}", flush=True)
