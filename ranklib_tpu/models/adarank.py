"""AdaRank (`-ranker 3`).

Reference behavior (learning/boosting/AdaRank.java:~30): listwise boosting
whose weak rankers are single features (rank docs by one feature value,
descending). Per round, with per-query weights P(q) (uniform init):

* pick the feature maximizing Σ_q P(q)·metric(q ranked by feature);
* α = ½ ln(Σ P(1+s) / Σ P(1−s)) with s the per-query weak metric;
* the strong ranker is H(d) = Σ α_t·feature_{f_t}(d) — linear in features;
* P ← exp(−metric(q, H)) / Z;
* guards: ``-noeq`` forbids immediate reselection, ``-max`` (5) caps
  consecutive picks of one feature, ``-tolerance`` (0.002) stops when the
  train metric stalls, and the round is rolled back if the train metric
  drops.

TPU-first shape: ranking every query by every feature never changes, so
the per-(query, feature) weak-metric matrix S[Q, F] is computed ONCE with
the batched candidate evaluator (feats @ I — one MXU pass per bucket).
Every round is then a couple of [Q]·[Q, F] reductions on host-sized data;
per-round H metrics reuse the same evaluator since H is linear.
"""

from __future__ import annotations

import numpy as np

from ranklib_tpu.data.dataset import Dataset
from ranklib_tpu.metrics.base import MetricScorer
from ranklib_tpu.models.base import (
    Ranker, model_header, parse_model_params, register_ranker,
)
from ranklib_tpu.ops.batched_eval import LinearMetricEvaluator
from ranklib_tpu.utils.errors import RankLibError
from ranklib_tpu.utils.logging import log


@register_ranker
class AdaRank(Ranker):
    NAME = "AdaRank"

    def __init__(self, **hp):
        self.n_rounds = 500
        self.tolerance = 0.002
        self.no_eq = False           # -noeq: never reselect the last feature
        self.max_sel_count = 5       # consecutive-pick cap otherwise
        self.weights = None          # np.float64 [F] accumulated α per fid
        self.history: list[tuple[int, float]] = []   # (fid, α) per round
        super().__init__(**hp)

    def fit(self, train: Dataset, scorer: MetricScorer,
            validation: Dataset | None = None) -> None:
        F = train.n_features
        Q = len(train.queries)
        ev = LinearMetricEvaluator(train, scorer)
        # S[q, f]: metric of query q ranked by feature f alone — one batched
        # candidate pass (feats @ I on the MXU), computed once
        S = ev.per_query_matrix(np.eye(F, dtype=np.float32))

        P = np.full(Q, 1.0 / Q)
        w = np.zeros(F, np.float64)
        self.history = []
        last_fid = -1
        consec = 0
        prev_train = -np.inf
        best_val = -np.inf
        best_len = 0

        log("Training starts...")
        head = f"{'#iter':<8}| {'Feature':<8}| {scorer.name + '-T':<11}"
        if validation is not None:
            head += f"| {scorer.name + '-V':<11}"
        log(head)
        vev = LinearMetricEvaluator(validation, scorer) if validation is not None else None

        for t in range(self.n_rounds):
            weighted = P @ S                       # [F]
            order = np.argsort(-weighted, kind="stable")
            fid0 = -1
            for f in order:
                if f == last_fid and (
                        self.no_eq or consec >= self.max_sel_count):
                    continue
                fid0 = int(f)
                break
            if fid0 < 0:
                break
            s = S[:, fid0]
            num = float(P @ (1.0 + s))
            den = float(P @ (1.0 - s))
            if den <= 0 or num <= 0:
                log(f"Stop at round {t + 1}: degenerate alpha")
                break
            alpha = 0.5 * np.log(num / den)
            w_new = w.copy()
            w_new[fid0] += alpha

            per_q = ev.per_query_metric(w_new.astype(np.float32))
            m_train = float(per_q.mean())
            line = f"{t + 1:<8}| {fid0 + 1:<8}| {m_train:<11.4f}"

            if m_train < prev_train:
                # backtrack: drop the pick that hurt (ref: AdaRank learn()
                # reverts the last weak ranker when the train metric drops)
                log(line + "  (rolled back)")
                break
            improved = m_train - prev_train
            w = w_new
            self.history.append((fid0 + 1, alpha))
            consec = consec + 1 if fid0 == last_fid else 1
            last_fid = fid0
            # reweight queries: hard ones (low metric under H) gain mass
            e = np.exp(-per_q)
            P = e / e.sum()

            if validation is not None:
                m_val = float(vev.per_query_metric(w.astype(np.float32)).mean())
                line += f"| {m_val:<11.4f}"
                if m_val > best_val:
                    best_val = m_val
                    best_len = len(self.history)
            log(line)
            if improved < self.tolerance and t > 0:
                break
            prev_train = m_train

        if validation is not None and best_len:
            self.history = self.history[:best_len]
            w = np.zeros(F, np.float64)
            for fid, alpha in self.history:
                w[fid - 1] += alpha
        self.weights = w

    # ---- scoring ---------------------------------------------------------
    def eval_dataset(self, ds: Dataset):
        if self.weights is None:
            raise RankLibError("Model not trained/loaded")
        w = np.zeros(ds.n_features, np.float32)
        k = min(len(self.weights), len(w))
        w[:k] = self.weights[:k]
        return [q.feats @ w for q in ds.queries]

    # ---- serialization -----------------------------------------------------
    def model_str(self) -> str:
        head = model_header(self.NAME, {
            "Iteration": self.n_rounds,
            "Train with 'enqueue'": "Yes" if self.no_eq else "No",
        })
        body = " ".join(f"{fid}:{alpha}" for fid, alpha in self.history)
        return head + body + "\n"

    def load_str(self, text: str) -> None:
        _, body = parse_model_params(text)
        self.history = []
        max_fid = 0
        for line in body:
            for tok in line.split():
                fid, _, a = tok.partition(":")
                self.history.append((int(fid), float(a)))
                max_fid = max(max_fid, int(fid))
        if not self.history:
            raise RankLibError("Empty AdaRank model body")
        w = np.zeros(max_fid, np.float64)
        for fid, alpha in self.history:
            w[fid - 1] += alpha
        self.weights = w
