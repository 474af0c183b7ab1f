"""Coordinate Ascent ranker (`-ranker 4`).

Linear model wᵀx that DIRECTLY maximizes the IR metric by cyclic coordinate
line search (ref: learning/CoorAscent.java:~30): weights start uniform
1/F; per restart, features are visited in a (deterministically) shuffled
order; each coordinate is line-searched over a geometric grid of deltas in
both signs; weights re-normalize to Σ|w| = 1; a change is kept only if the
metric gain exceeds the tolerance; best restart wins. Optional L2 penalty
`-reg` subtracts λΣw² from the objective.

TPU redesign: the reference evaluates ONE candidate weight vector at a time
(25 sequential metric evaluations per coordinate). Here the entire
geometric ladder for a coordinate — both signs, all magnitudes — is scored
in a single batched matmul + vmapped metric call
(:class:`LinearMetricEvaluator`), so each coordinate costs one device
round-trip. The search loop itself stays on host: it is inherently
sequential and metric-driven (SURVEY.md §7 "hard parts").

Hyperparameters (reference flags): -r nRestart=5, -i nMaxIteration=25
(line-search depth per coordinate), -tolerance 0.001, -reg off.
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
class CoorAscent(Ranker):
    NAME = "Coordinate Ascent"

    STEP_BASE = 0.05
    STEP_SCALE = 2.0

    def __init__(self, **hp):
        self.n_restart = 5
        self.n_max_iteration = 25     # geometric-ladder depth per coordinate
        self.tolerance = 0.001
        self.reg = None               # L2 penalty weight (None = off)
        self.max_passes = 25          # full feature sweeps per restart
        self.weights = None           # np.float64 [F], Σ|w| = 1
        super().__init__(**hp)

    # ---- objective -------------------------------------------------------
    def _penalty(self, W: np.ndarray) -> np.ndarray:
        if self.reg is None:
            return np.zeros(W.shape[1], np.float64)
        return self.reg * (W * W).sum(axis=0)

    def _candidate_grid(self, w_f: float) -> np.ndarray:
        """Geometric ladder of absolute deltas, both signs, plus sign flip
        and zeroing of the coordinate."""
        depth = max(4, self.n_max_iteration)
        base = self.STEP_BASE * max(abs(w_f), 0.05)
        mags = base * (self.STEP_SCALE ** np.arange(depth))
        deltas = np.concatenate([mags, -mags, [-w_f, -2.0 * w_f]])
        return np.unique(deltas[np.isfinite(deltas)])

    def fit(self, train: Dataset, scorer: MetricScorer, validation=None):
        F = train.n_features
        ev = LinearMetricEvaluator(train, scorer)
        ev_val = LinearMetricEvaluator(validation, scorer) if validation else None

        global_best_w, global_best_m = None, -np.inf
        log(f"Training starts... [{self.NAME}] optimizing {scorer.name}")
        for restart in range(self.n_restart):
            rng = np.random.default_rng(restart)
            order = rng.permutation(F)
            w = np.full(F, 1.0 / F, dtype=np.float64)
            cur = float(ev.mean_metric(w[:, None])[0] - self._penalty(w[:, None])[0])
            log(f"[+] Random restart #{restart + 1}/{self.n_restart}...")
            for sweep in range(self.max_passes):
                improved = False
                for f in order:
                    deltas = self._candidate_grid(w[f])
                    C = len(deltas)
                    W = np.repeat(w[:, None], C, axis=1)
                    W[f, :] += deltas
                    # re-normalize Σ|w| = 1 (skip all-zero candidates)
                    norms = np.abs(W).sum(axis=0)
                    ok = norms > 1e-12
                    W[:, ok] /= norms[ok]
                    vals = ev.mean_metric(W) - self._penalty(W)
                    vals[~ok] = -np.inf
                    best = int(np.argmax(vals))
                    if vals[best] > cur + self.tolerance:
                        w = W[:, best].copy()
                        cur = float(vals[best])
                        improved = True
                log(f"  pass {sweep + 1}: {scorer.name} = {cur:.4f}")
                if not improved:
                    break
            if cur > global_best_m:
                global_best_m, global_best_w = cur, w.copy()
        self.weights = global_best_w
        log("-" * 40)
        log(f"Finished successfully. {scorer.name} on training data: "
            f"{global_best_m:.4f}")
        if ev_val is not None:
            vm = float(ev_val.mean_metric(self.weights[:, None])[0])
            log(f"{scorer.name} on validation data: {vm:.4f}")

    # ---- scoring / io ------------------------------------------------------
    def eval_dataset(self, ds: Dataset):
        if self.weights is None:
            raise RankLibError("Model not trained/loaded")
        w = np.zeros(ds.n_features, np.float64)
        n = min(len(self.weights), ds.n_features)
        w[:n] = self.weights[:n]
        wf = w.astype(np.float32)
        return [q.feats @ wf for q in ds.queries]

    def model_str(self) -> str:
        hdr = model_header(
            self.NAME,
            {
                "Restart": self.n_restart,
                "MaxIteration": self.n_max_iteration,
                "StepBase": self.STEP_BASE,
                "StepScale": self.STEP_SCALE,
                "Tolerance": self.tolerance,
                "Regularized": self.reg is not None,
                "Slack": self.reg if self.reg is not None else 0,
            },
        )
        body = " ".join(
            f"{i + 1}:{self.weights[i]}" for i in range(len(self.weights))
        )
        return hdr + body + "\n"

    def load_str(self, text: str) -> None:
        _, body = parse_model_params(text)
        if not body:
            raise RankLibError("Empty Coordinate Ascent model body")
        pairs = body[0].split()
        max_fid = max(int(p.split(":")[0]) for p in pairs)
        w = np.zeros(max_fid, np.float64)
        for p in pairs:
            fid, _, v = p.partition(":")
            w[int(fid) - 1] = float(v)
        self.weights = w
