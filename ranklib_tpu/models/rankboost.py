"""RankBoost (`-ranker 2`).

Reference behavior (learning/boosting/RankBoost.java:~30): pairwise
boosting over all (winner, loser) doc pairs with a distribution D over
pairs (uniform init). Per round: pick the binary weak ranker
(feature f, threshold θ; q(d)=1 iff value > θ) maximizing
r = Σ D(x,y)(q(x) − q(y)); α = ½ln((1+r)/(1−r));
D ← D·exp(α(q(y)−q(x)))/Z. Final score H(d) = Σ α_t q_t(d). Candidate
thresholds: ``-tc`` (10) evenly spaced values per feature
(learning/boosting/RBWeakRanker.java).

TPU-first shape: D lives as masked [B, D, D] pair matrices per query
bucket. The weak-ranker search runs through the SAME pre-binned histogram
machinery as the GBDT engine: the pair potential
π(d) = Σ_y D(d,y) − Σ_x D(x,d) is histogrammed by (feature, bin) in one
segment-sum, and r(f, θ_t) = Σ_{bins > t} hist[f, ·] is a reversed
cumulative sum — no per-candidate pass over docs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.data.dataset import Dataset, bucketize, flatten
from ranklib_tpu.metrics.base import MetricScorer, score_dataset
from ranklib_tpu.models.base import (
    Ranker, model_header, parse_model_params, register_ranker,
)
from ranklib_tpu.utils.errors import RankLibError
from ranklib_tpu.utils.logging import log


@jax.jit
def _pair_potential(Dmat, mask):
    """π[b, d] = Σ_y D[b, d, y] − Σ_x D[b, x, d] (winner-row minus
    loser-column mass)."""
    return (Dmat.sum(axis=2) - Dmat.sum(axis=1)) * mask


def _hist_potential(binned, pot, n_bins: int):
    """hist[f, b] = Σ_d π(d)·[bin(d, f) = b] — one segment-sum."""
    N, F = binned.shape
    ids = (jnp.arange(F, dtype=jnp.int32)[None, :] * n_bins + binned).reshape(-1)
    data = jnp.broadcast_to(pot[:, None], (N, F)).reshape(-1)
    return jax.ops.segment_sum(data, ids, num_segments=F * n_bins).reshape(F, n_bins)


@functools.partial(jax.jit, static_argnames=("n_bins",))
def _pick_weak(hist, n_bins: int):
    """r(f, t) = Σ_{b > t} hist[f, b]; returns (r*, f*, t*)."""
    rev = jnp.flip(jnp.cumsum(jnp.flip(hist, axis=1), axis=1), axis=1)
    r = jnp.concatenate([rev[:, 1:], jnp.zeros_like(rev[:, :1])], axis=1)
    flat = r.reshape(-1)
    idx = jnp.argmax(flat)
    return flat[idx], (idx // n_bins).astype(jnp.int32), (idx % n_bins).astype(jnp.int32)


@jax.jit
def _update_D(Dmat, q, alpha):
    """Unnormalized D ← D·exp(α(q_y − q_x)); returns (D', local sum)."""
    f = jnp.exp(alpha * (q[:, None, :] - q[:, :, None]))
    Dn = Dmat * f
    return Dn, Dn.sum()


@register_ranker
class RankBoost(Ranker):
    NAME = "RankBoost"

    def __init__(self, **hp):
        self.n_rounds = 300
        self.n_threshold = 10
        self.weaks: list[tuple[int, float, float]] = []  # (fid, θ, α)
        super().__init__(**hp)

    def fit(self, train: Dataset, scorer: MetricScorer,
            validation: Dataset | None = None) -> None:
        feats, _, _ = flatten(train)
        N, F = feats.shape
        T = int(self.n_threshold)
        lo = feats.min(axis=0)
        hi = feats.max(axis=0)
        # T evenly spaced candidate thresholds per feature (ref: RankBoost
        # threshold grid); constant features get an empty (never-max) grid
        grid = lo[:, None] + (hi - lo)[:, None] * (
            np.arange(1, T + 1, dtype=np.float32)[None, :] / (T + 1))
        # bin = #thresholds strictly below value → q_t(d) = [bin > t]
        binned = np.zeros((N, F), np.int32)
        for f in range(F):
            binned[:, f] = np.searchsorted(grid[f], feats[:, f], side="left")
        binned_j = jnp.asarray(binned)
        n_bins = T + 1

        buckets = bucketize(train, with_feats=False)
        _, _, qptr = flatten(train)
        views = []           # (didx, P0 valid-pair mask, mask)
        n_pairs = 0.0
        for b in buckets:
            didx = np.full((b.B, b.D), N, np.int32)
            for row, qi in enumerate(b.qidx):
                s, e = qptr[qi], qptr[qi + 1]
                didx[row, : e - s] = np.arange(s, e, dtype=np.int32)
            L = b.labels
            P = (L[:, :, None] > L[:, None, :]) & b.mask[:, :, None] & b.mask[:, None, :]
            n_pairs += float(P.sum())
            views.append((jnp.asarray(didx), jnp.asarray(P, jnp.float32),
                          jnp.asarray(b.mask, jnp.float32), b.qidx))
        if n_pairs == 0:
            raise RankLibError("RankBoost: no correctly-ordered pairs in data")
        Dmats = [P / n_pairs for _, P, _, _ in views]

        log("Training starts...")
        log(f"{'#iter':<8}| {scorer.name + '-T':<11}")
        self.weaks = []
        scores_flat = jnp.zeros((N + 1,), jnp.float32)
        best_val = -np.inf
        best_len = 0
        for t in range(self.n_rounds):
            pot_flat = jnp.zeros((N + 1,), jnp.float32)
            for (didx, _, mask, _), Dmat in zip(views, Dmats):
                pot = _pair_potential(Dmat, mask)
                pot_flat = pot_flat.at[didx].add(pot)
            hist = _hist_potential(binned_j, pot_flat[:N], n_bins)
            r, f_s, t_s = _pick_weak(hist, n_bins)
            r = float(np.clip(np.asarray(r), -0.999999, 0.999999))
            f_i, t_i = int(np.asarray(f_s)), int(np.asarray(t_s))
            if t_i >= T:      # degenerate: q ≡ 0 everywhere
                log(f"Stop at round {t + 1}: no useful weak ranker")
                break
            alpha = 0.5 * np.log((1.0 + r) / (1.0 - r))
            theta = float(grid[f_i, t_i])
            self.weaks.append((f_i + 1, theta, alpha))

            q_flat = (binned_j[:, f_i] > t_i).astype(jnp.float32)
            scores_flat = scores_flat.at[:N].add(alpha * q_flat)
            q_pad = jnp.concatenate([q_flat, jnp.zeros((1,), jnp.float32)])
            total = 0.0
            newD = []
            for (didx, _, mask, _), Dmat in zip(views, Dmats):
                q = q_pad[didx] * mask
                Dn, s = _update_D(Dmat, q, alpha)
                newD.append(Dn)
                total += float(s)
            Dmats = [Dn / total for Dn in newD]

            m_train = self._metric(train, scorer, scores_flat, qptr)
            log(f"{t + 1:<8}| {m_train:<11.4f}")
            if validation is not None:
                m_val = self.score_metric(validation, scorer)
                if m_val > best_val:
                    best_val = m_val
                    best_len = len(self.weaks)
        if validation is not None and best_len:
            self.weaks = self.weaks[:best_len]

    def _metric(self, ds, scorer, scores_flat, qptr) -> float:
        sc = np.asarray(scores_flat[:-1])
        per_q = [sc[qptr[i]: qptr[i + 1]] for i in range(len(ds.queries))]
        return score_dataset(scorer, ds, per_q)[0]

    # ---- scoring ---------------------------------------------------------
    def eval_dataset(self, ds: Dataset):
        if not self.weaks:
            raise RankLibError("Model not trained/loaded")
        from ranklib_tpu.data.dataset import flatten

        feats, _, qptr = flatten(ds)
        F = feats.shape[1]
        fids = np.array([min(w[0] - 1, F - 1) for w in self.weaks])
        inrange = np.array([w[0] <= F for w in self.weaks], np.float32)
        thetas = np.array([w[1] for w in self.weaks], np.float32)
        alphas = np.array([w[2] for w in self.weaks], np.float32) * inrange
        # H(d) = Σ_t α_t · [v_{f_t}(d) > θ_t] — one gather + one matvec
        flat = (feats[:, fids] > thetas[None, :]).astype(np.float32) @ alphas
        return [flat[qptr[i]: qptr[i + 1]].astype(np.float32)
                for i in range(len(ds.queries))]

    # ---- serialization -----------------------------------------------------
    def model_str(self) -> str:
        head = model_header(self.NAME, {
            "Iteration": self.n_rounds,
            "No. of threshold candidates": self.n_threshold,
        })
        body = "\n".join(f"{fid}:{theta}:{alpha}"
                         for fid, theta, alpha in self.weaks)
        return head + body + "\n"

    def load_str(self, text: str) -> None:
        _, body = parse_model_params(text)
        self.weaks = []
        for line in body:
            for tok in line.split():
                fid, theta, alpha = tok.split(":")
                self.weaks.append((int(fid), float(theta), float(alpha)))
        if not self.weaks:
            raise RankLibError("Empty RankBoost model body")
