"""Synthetic LETOR fixtures.

No LETOR datasets ship with this repo, so tests and benchmarks generate
deterministic synthetic data shaped like MQ2008 (46 features, ~8-120 docs
per query, graded labels 0-2) or MSLR (136 features, labels 0-4). Labels
are drawn so that a planted linear signal exists — rankers must be able to
beat random ordering, which gives the tests teeth.
"""

from __future__ import annotations

import numpy as np

from ranklib_tpu.data.dataset import Dataset, Query


def synth_dataset(
    n_queries: int = 20,
    n_features: int = 46,
    min_docs: int = 5,
    max_docs: int = 40,
    gmax: int = 2,
    seed: int = 0,
    signal: float = 2.0,
    w_seed: int | None = None,
    nonlinear: bool = False,
) -> Dataset:
    """``w_seed`` pins the planted signal so train/test sets drawn with
    different ``seed`` values still share the same ground-truth ranker.

    ``nonlinear=True`` plants threshold/interaction structure (axis-aligned
    regions + pairwise products) instead of a dense linear signal — the
    regime where tree rankers should dominate linear ones."""
    rng = np.random.default_rng(seed)
    w_rng = np.random.default_rng(seed if w_seed is None else w_seed)
    w_true = w_rng.normal(size=n_features)
    w_true /= np.linalg.norm(w_true)
    k = max(4, n_features // 8)
    nl_idx = w_rng.permutation(n_features)[: 2 * k]
    nl_thr = w_rng.normal(size=k) * 0.5
    nl_w = w_rng.normal(size=k)
    pair_w = w_rng.normal(size=k)
    queries = []
    for qi in range(n_queries):
        n = int(rng.integers(min_docs, max_docs + 1))
        feats = rng.normal(size=(n, n_features)).astype(np.float32)
        if nonlinear:
            a = feats[:, nl_idx[:k]]
            b = feats[:, nl_idx[k:]]
            raw = signal * ((a > nl_thr) @ nl_w + (a * b) @ pair_w) \
                / np.sqrt(2 * k) + rng.normal(size=n)
        else:
            raw = signal * feats @ w_true + rng.normal(size=n)
        # map continuous raw score to graded labels 0..gmax by quantile
        qtiles = np.quantile(raw, np.linspace(0, 1, gmax + 2)[1:-1])
        labels = np.digitize(raw, qtiles).astype(np.float32)
        queries.append(Query(qid=str(qi + 1), labels=labels, feats=feats,
                             descs=["" for _ in range(n)]))
    return Dataset(queries, n_features)


def write_letor_text(ds: Dataset, path) -> None:
    with open(path, "w") as f:
        for q in ds.queries:
            for i in range(q.n):
                feats = " ".join(
                    f"{j + 1}:{q.feats[i, j]:.6g}" for j in range(q.feats.shape[1])
                )
                f.write(f"{int(q.labels[i])} qid:{q.qid} {feats} # doc{q.qid}_{i}\n")
