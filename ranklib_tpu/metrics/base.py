"""MetricScorer facade + factory (ref: metric/MetricScorerFactory.java:~15).

Metric strings are API surface: ``MAP``, ``NDCG@10``, ``DCG@10``, ``P@10``,
``RR@10``, ``ERR@10``, ``BEST@10`` (case-insensitive; a missing ``@k``
defaults to k=10 for position-truncated metrics, like the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.data.dataset import Dataset, bucketize
from ranklib_tpu.metrics import scorers as S
from ranklib_tpu.ops.sorting import rank_labels
from ranklib_tpu.utils.errors import RankLibError

_METRICS = {
    # name -> (score_fn(L, n, k), swap_fn(L, n, k), uses_k, needs_rel)
    "MAP": (S.ap_score, S.ap_swap, False, True),
    "NDCG": (S.ndcg_score, S.ndcg_swap, True, False),
    "DCG": (S.dcg_score, S.dcg_swap, True, False),
    "P": (S.precision_score, S.precision_swap, True, True),
    "RR": (S.rr_score, S.rr_swap, True, True),
    "ERR": (S.err_score, S.err_swap, True, False),
    "BEST": (S.best_score, S.best_swap, True, False),
}


class MetricScorer:
    """One metric with a fixed cutoff k; pure-functional core.

    ``score_ranked(L, n)`` and ``swap_deltas(L, n)`` are jit-safe; the
    host-level helpers (:meth:`score_query`, :func:`score_dataset`) wrap
    them for numpy callers.
    """

    def __init__(self, name: str, k: int = 10, gmax: float = 4.0):
        name = name.upper()
        if name not in _METRICS:
            raise RankLibError(f"Unknown metric '{name}'")
        self.metric = name
        self.k = int(k)
        self.gmax = float(gmax)
        score_fn, swap_fn, self.uses_k, self.needs_rel = _METRICS[name]
        kk = self.k if self.uses_k else 0
        if name == "ERR":
            self._score = functools.partial(score_fn, k=kk, gmax=self.gmax)
            self._swap = functools.partial(swap_fn, k=kk, gmax=self.gmax)
        else:
            self._score = functools.partial(score_fn, k=kk)
            self._swap = functools.partial(swap_fn, k=kk)

    # Scorers are frozen after __init__ and are passed as STATIC jit
    # arguments throughout (lambdas, fused steps, bucket metrics); value
    # hashing lets two equal instances (e.g. the CLI's separate train and
    # test scorers for the same metric string) share every jit cache
    # entry instead of retracing per object.
    def _key(self):
        # gmax only changes behavior for ERR (the 2^gmax normalization);
        # folding it into every key made e.g. NDCG@10 scorers built under
        # different -gmax values retrace identical programs
        return (self.metric, self.k if self.uses_k else 0,
                self.gmax if self.metric == "ERR" else None)

    def __eq__(self, other):
        return (isinstance(other, MetricScorer)
                and self._key() == other._key())

    def __hash__(self):
        return hash(self._key())

    @property
    def name(self) -> str:
        """Display name, e.g. 'NDCG@10' or 'MAP' (appears in console output
        and -idv files, so the exact string matters)."""
        if self.uses_k:
            return f"{self.metric}@{self.k}"
        return self.metric

    # ---- jit-safe core --------------------------------------------------
    def score_ranked(self, L, n):
        """L: [B, D] labels in ranked order; n: [B] doc counts → [B]."""
        return self._score(L, n)

    def swap_deltas(self, L, n):
        """Signed [B, D, D] metric change for swapping ranked positions."""
        return self._swap(L, n)

    def score_from_scores(self, labels, scores, mask):
        """Rank by scores (stable desc) then score → [B].

        Truncated metrics (everything but MAP) take a ``lax.top_k`` fast
        path when k < D: per-round metric evaluation inside the fused
        training steps is otherwise bound by the full [B, D] sort.
        ``lax.top_k`` breaks ties in favor of the lower index — exactly
        the stable-descending contract of the reference's MergeSorter
        (ref: utilities/MergeSorter.java:~20), so both paths agree
        bit-for-bit (tests/test_metrics.py topk-parity cases).
        """
        n = mask.sum(axis=-1).astype(jnp.int32)
        D = labels.shape[-1]
        k = self.k
        if self.metric != "MAP" and self.uses_k and 0 < k < D:
            nk = jnp.minimum(n, k)
            pos_ok = jnp.arange(k)[None, :] < nk[:, None]
            _, idx = jax.lax.top_k(jnp.where(mask, scores, -jnp.inf), k)
            Lk = jnp.where(pos_ok,
                           jnp.take_along_axis(labels, idx, axis=-1), 0.0)
            if self.metric == "NDCG":
                # true ideal = top-k *labels* over the whole list, not the
                # re-sorted top-k-by-score (they differ whenever a high
                # label falls outside the predicted top k)
                Li, _ = jax.lax.top_k(jnp.where(mask, labels, -jnp.inf), k)
                Li = jnp.where(pos_ok, Li, 0.0)
                ideal = S.dcg_score(Li, nk, k)
                dcg = S.dcg_score(Lk, nk, k)
                return jnp.where(ideal > 0,
                                 dcg / jnp.where(ideal > 0, ideal, 1.0), 0.0)
            return self._score(Lk, nk)
        return self._score(rank_labels(labels, scores, mask), n)

    # ---- host helpers ----------------------------------------------------
    def score_query(self, labels: np.ndarray, scores: np.ndarray) -> float:
        L = jnp.asarray(labels, jnp.float32)[None, :]
        sc = jnp.asarray(scores, jnp.float32)[None, :]
        m = jnp.ones_like(L, dtype=bool)
        return float(self.score_from_scores(L, sc, m)[0])

    def score_in_order(self, labels: np.ndarray) -> float:
        """Score a list already in rank order (ref: scorer.score(RankList))."""
        L = jnp.asarray(labels, jnp.float32)[None, :]
        n = jnp.asarray([labels.shape[0]], jnp.int32)
        return float(self._score(L, n)[0])


def create_scorer(metric: str, gmax: float = 4.0) -> MetricScorer:
    """Parse 'NDCG@10' / 'MAP' / ... → MetricScorer."""
    m = metric.strip().upper()
    if "@" in m:
        name, _, kstr = m.partition("@")
        try:
            k = int(kstr)
        except ValueError:
            raise RankLibError(f"Bad metric cutoff in '{metric}'") from None
    else:
        name, k = m, 10
    return MetricScorer(name, k, gmax)


@functools.partial(jax.jit, static_argnames=("scorer",))
def _bucket_scores(scorer, labels, scores, mask):
    return scorer.score_from_scores(labels, scores, mask)


def score_dataset(scorer: MetricScorer, ds: Dataset, scores_per_query):
    """Macro-averaged metric over a dataset given per-query score arrays.

    Returns (mean, per_query list aligned with ds.queries) — the reference's
    scoreAll + the per-query values `-idv` writes (ref:
    metric/MetricScorer.java scoreAll; eval/Evaluator.java:~800).
    """
    per_query = np.zeros(len(ds.queries), dtype=np.float64)
    buckets = bucketize(ds, with_feats=False)
    for b in buckets:
        sc = np.zeros((b.B, b.D), dtype=np.float32)
        for row, qi in enumerate(b.qidx):
            s = scores_per_query[qi]
            sc[row, : len(s)] = s
        vals = np.asarray(
            _bucket_scores(scorer, jnp.asarray(b.labels), jnp.asarray(sc),
                           jnp.asarray(b.mask))
        )
        per_query[b.qidx] = vals
    return float(per_query.mean()), per_query
