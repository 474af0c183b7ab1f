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
Every round is then ONE fused jitted step with donated state: feature
pick (with the noeq/consec guards as masking), α, the strong-model
per-query metric (for both the console table and the P reweighting),
validation metric, and all stop/backtrack conditions evaluated on device
as an active flag — the host dispatches rounds asynchronously and reads
the whole history back in a single transfer (same zero-sync architecture
as gbdt.boost; a blocking round trip through the TPU tunnel costs
~30 ms).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.data.dataset import Dataset
from ranklib_tpu.gbdt.boost import round_capacity
from ranklib_tpu.metrics.base import MetricScorer
from ranklib_tpu.models.base import (
    Ranker, model_header, parse_model_params, register_ranker,
)
from ranklib_tpu.ops.batched_eval import LinearMetricEvaluator
from ranklib_tpu.utils.errors import RankLibError
from ranklib_tpu.utils.logging import event, is_silent, log


class AdaState(NamedTuple):
    """Donated carry of the fused AdaRank round step."""

    P: jnp.ndarray               # [Q] query weights
    w: jnp.ndarray               # [F] accumulated α per feature
    last_fid: jnp.ndarray        # [] int32 (-1 initially)
    consec: jnp.ndarray          # [] int32 consecutive picks of last_fid
    prev_train: jnp.ndarray      # [] f32
    active: jnp.ndarray          # [] bool
    hfid: jnp.ndarray            # [CAP] int32 picked feature per round
    halpha: jnp.ndarray          # [CAP] f32
    hact: jnp.ndarray            # [CAP] bool round kept
    train_m: jnp.ndarray         # [CAP] f32
    val_m: jnp.ndarray           # [CAP] f32


def make_ada_step(scorer, *, no_eq: bool, max_sel: int, tolerance: float,
                  n_queries: int, n_vqueries: int):
    """Build the jitted one-round step: (state, t, S, tb, vb) → state.

    ``tb``/``vb``: tuples of (feats, labels, mask, qidx) device buckets;
    qidx scatters per-query metrics back to Dataset order for P.
    """

    def _perq_and_mean(wvec, buckets, nq):
        """Per-query metric of the linear model wvec, scattered to Dataset
        order ([nq]); padded chunk rows carry sentinel qidx = nq."""
        perq = jnp.zeros((nq + 1,), jnp.float32)
        for feats, labels, mask, qidx in buckets:
            sc = jnp.einsum("bdf,f->bd", feats, wvec,
                            preferred_element_type=jnp.float32)
            vals = scorer.score_from_scores(labels, sc, mask)
            perq = perq.at[qidx].set(vals)
        perq = perq[:-1]
        return perq, perq.mean()

    def step(state: AdaState, t, S, tb, vb) -> AdaState:
        F = state.w.shape[0]
        weighted = state.P @ S                         # [F]
        # noeq / consecutive-pick guard: mask the last feature out
        blocked = (jnp.arange(F) == state.last_fid) & (
            jnp.bool_(no_eq) | (state.consec >= max_sel))
        fid = jnp.argmax(jnp.where(blocked, -jnp.inf, weighted))
        s = S[:, fid]
        num = state.P @ (1.0 + s)
        den = state.P @ (1.0 - s)
        degenerate = (num <= 0) | (den <= 0)
        alpha = 0.5 * jnp.log(jnp.where(degenerate, 1.0, num / den))
        w_new = state.w.at[fid].add(alpha)

        perq, m_train = _perq_and_mean(w_new, tb, n_queries)
        backtrack = m_train < state.prev_train
        keep = state.active & ~degenerate & ~backtrack

        w = jnp.where(keep, w_new, state.w)
        e = jnp.exp(-perq)
        P = jnp.where(keep, e / e.sum(), state.P)
        last_fid = jnp.where(keep, fid.astype(jnp.int32), state.last_fid)
        consec = jnp.where(
            keep,
            jnp.where(fid.astype(jnp.int32) == state.last_fid,
                      state.consec + 1, 1),
            state.consec)
        # tolerance stop: the round is KEPT, later rounds become no-ops
        tol_stop = keep & (m_train - state.prev_train < tolerance) & (t > 0)
        active = keep & ~tol_stop
        prev_train = jnp.where(keep, m_train, state.prev_train)

        val_m = state.val_m
        if vb:
            _, vm = _perq_and_mean(w, vb, n_vqueries)
            val_m = val_m.at[t].set(vm)

        return AdaState(
            P=P, w=w, last_fid=last_fid, consec=consec,
            prev_train=prev_train, active=active,
            hfid=state.hfid.at[t].set(fid.astype(jnp.int32)),
            halpha=state.halpha.at[t].set(alpha),
            hact=state.hact.at[t].set(keep),
            train_m=state.train_m.at[t].set(m_train),
            val_m=val_m,
        )

    from ranklib_tpu.gbdt.boost import _make_stepper

    return _make_stepper(step)


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
        S = jnp.asarray(ev.per_query_matrix(np.eye(F, dtype=np.float32)),
                        jnp.float32)
        def _device_qidx(evaluator, nq):
            out = []
            for f, l, m, q in evaluator.buckets:
                qpad = np.full(f.shape[0], nq, np.int32)   # sentinel slot
                qpad[: len(q)] = q
                out.append((f, l, m, jnp.asarray(qpad)))
            return tuple(out)

        tb = _device_qidx(ev, Q)
        vb = ()
        n_vq = 1
        if validation is not None:
            vev = LinearMetricEvaluator(validation, scorer)
            n_vq = len(validation.queries)
            vb = _device_qidx(vev, n_vq)

        step = make_ada_step(
            scorer, no_eq=self.no_eq, max_sel=self.max_sel_count,
            tolerance=self.tolerance, n_queries=Q, n_vqueries=n_vq)
        CAP = round_capacity(self.n_rounds)
        state = AdaState(
            P=jnp.full((Q,), 1.0 / Q, jnp.float32),
            w=jnp.zeros((F,), jnp.float32),
            last_fid=jnp.int32(-1), consec=jnp.int32(0),
            prev_train=jnp.float32(-np.inf), active=jnp.asarray(True),
            hfid=jnp.zeros((CAP,), jnp.int32),
            halpha=jnp.zeros((CAP,), jnp.float32),
            hact=jnp.zeros((CAP,), bool),
            train_m=jnp.full((CAP,), jnp.nan, jnp.float32),
            val_m=jnp.full((CAP,), jnp.nan, jnp.float32),
        )

        log("Training starts...")
        head = f"{'#iter':<8}| {'Feature':<8}| {scorer.name + '-T':<11}"
        if validation is not None:
            head += f"| {scorer.name + '-V':<11}"
        log(head)
        silent = is_silent()
        if silent:
            from ranklib_tpu.gbdt.boost import run_silent_blocks

            state = run_silent_blocks(step, state, self.n_rounds, S, tb, vb)
        for t in ([] if silent else range(self.n_rounds)):
            state = step(state, t, S, tb, vb)
            if not bool(state.hact[t]):
                log(f"Stop at round {t + 1} (degenerate or rolled back)")
                break
            tm = float(state.train_m[t])
            line = f"{t + 1:<8}| {int(state.hfid[t]) + 1:<8}| {tm:<11.4f}"
            vm = None
            if validation is not None:
                vm = float(state.val_m[t])
                line += f"| {vm:<11.4f}"
            log(line)
            event("round", ranker=self.NAME, round=t + 1,
                  train_metric=tm, val_metric=vm)
            if not bool(state.active):
                break

        hfid, halpha, hact, val_m = jax.device_get(
            (state.hfid, state.halpha, state.hact, state.val_m))
        kept = [t for t in range(self.n_rounds) if hact[t]]
        self.history = [(int(hfid[t]) + 1, float(halpha[t])) for t in kept]
        if validation is not None and kept:
            vals = val_m[kept]
            best = int(np.nanargmax(vals))
            self.history = self.history[: best + 1]
        w = np.zeros(F, np.float64)
        for fid, alpha in self.history:
            w[fid - 1] += alpha
        self.weights = w

    # ---- scoring ---------------------------------------------------------
    def eval_dataset(self, ds: Dataset):
        from ranklib_tpu.data.dataset import query_feats

        if self.weights is None:
            raise RankLibError("Model not trained/loaded")
        w = np.zeros(ds.n_features, np.float32)
        k = min(len(self.weights), len(w))
        w[:k] = self.weights[:k]
        return [query_feats(ds, qi) @ w for qi in range(len(ds.queries))]

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
