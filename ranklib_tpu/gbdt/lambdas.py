"""Batched lambda-gradient statistics (ref: LambdaMART.computePseudoResponses,
learning/tree/LambdaMART.java:~300).

Reference semantics, per query: sort docs by current model score (desc,
stable); compute the metric swap-change matrix on that ranking; for every
ordered doc pair (i, j) with label_i > label_j:

    rho = 1 / (1 + exp(s_i − s_j))          (= sigmoid(s_j − s_i))
    lambda_i += rho·|Δ|,   lambda_j −= rho·|Δ|
    w_i += rho(1−rho)·|Δ|, w_j += rho(1−rho)·|Δ|

The reference parallelizes this over queries with MyThreadPool; here the
whole O(D²) pair block is one masked [B, D, D] elementwise program (VPU
work), batched over queries and chunked so no temporary exceeds a fixed
element budget. Queries live in padded buckets (see data.dataset), so the
pair matrices never pad to the global max doc count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.data.dataset import Dataset, bucketize, flatten

# max elements of one [Bc, D, D] temporary (f32) — 2^24 ≈ 64 MB
_PAIR_BUDGET = 1 << 24


@functools.partial(jax.jit, static_argnames=("scorer",))
def lambda_weights(scorer, labels, scores, mask):
    """Per-doc lambda and Newton weight for one padded batch.

    labels/scores: [B, D] f32; mask: [B, D] bool. Returns (lam, w) in the
    ORIGINAL doc order of the batch.
    """
    n = mask.sum(axis=-1).astype(jnp.int32)
    key = jnp.where(mask, -scores, jnp.inf)
    order = jnp.argsort(key, axis=-1, stable=True)        # score desc, pads last
    L = jnp.take_along_axis(labels, order, axis=-1)
    S = jnp.take_along_axis(scores, order, axis=-1)

    delta = jnp.abs(scorer.swap_deltas(L, n))             # [B, D, D]
    P = (L[:, :, None] > L[:, None, :]).astype(jnp.float32)
    rho = jax.nn.sigmoid(S[:, None, :] - S[:, :, None])   # sigmoid(s_j − s_i)
    m = P * rho * delta
    lam_ranked = m.sum(axis=2) - m.sum(axis=1)
    ww = P * (rho * (1.0 - rho)) * delta
    w_ranked = ww.sum(axis=2) + ww.sum(axis=1)

    inv = jnp.argsort(order, axis=-1)                     # inverse permutation
    lam = jnp.take_along_axis(lam_ranked, inv, axis=-1)
    w = jnp.take_along_axis(w_ranked, inv, axis=-1)
    z = mask.astype(jnp.float32)
    return lam * z, w * z


def _chunk_rows(B, D):
    rows = max(1, _PAIR_BUDGET // max(1, D * D))
    return min(B, rows)


class BucketView:
    """Device-resident padded view of a flat doc array, per bucket.

    ``didx[B, D]`` indexes the flat doc axis (padding → sentinel N, one past
    the end); gathers/scatters between ``scores_flat[N+1]`` and the [B, D]
    world happen entirely on device. The batch dim is padded up to a
    multiple of the pair-budget chunk size so chunked loops never reshape.
    """

    def __init__(self, bucket, qptr):
        B, D = bucket.labels.shape
        self.rows = _chunk_rows(B, D)
        Bp = ((B + self.rows - 1) // self.rows) * self.rows
        didx = np.full((Bp, D), qptr[-1], dtype=np.int32)
        labels = np.zeros((Bp, D), dtype=np.float32)
        mask = np.zeros((Bp, D), dtype=bool)
        labels[:B] = bucket.labels
        mask[:B] = bucket.mask
        for row, qi in enumerate(bucket.qidx):
            s, e = qptr[qi], qptr[qi + 1]
            didx[row, : e - s] = np.arange(s, e, dtype=np.int32)
        self.didx = jnp.asarray(didx)
        self.labels = jnp.asarray(labels)
        self.mask = jnp.asarray(mask)
        self.qidx = bucket.qidx        # real queries only (first B rows)
        self.B, self.D, self.Bp = B, D, Bp

    def gather(self, flat):
        return flat[self.didx]


def make_bucket_views(ds: Dataset):
    """Bucketed index views over the flattened dataset (no feature copy)."""
    _, _, qptr = flatten(ds)
    return [BucketView(b, qptr) for b in bucketize(ds, with_feats=False)]


def lambda_round(scorer, views, scores_flat):
    """One full lambda pass: returns (lam_flat, w_flat) of shape [N+1].

    Host loop over buckets and fixed-size row chunks; every chunk is the
    same jitted call, so shapes never vary across boosting rounds.
    """
    lam_flat = jnp.zeros_like(scores_flat)
    w_flat = jnp.zeros_like(scores_flat)
    for v in views:
        sc = v.gather(scores_flat)
        for lo in range(0, v.Bp, v.rows):
            hi = lo + v.rows
            lam, w = lambda_weights(scorer, v.labels[lo:hi], sc[lo:hi],
                                    v.mask[lo:hi])
            mk = v.mask[lo:hi]
            lam_flat = lam_flat.at[v.didx[lo:hi]].add(jnp.where(mk, lam, 0.0))
            w_flat = w_flat.at[v.didx[lo:hi]].add(jnp.where(mk, w, 0.0))
    return lam_flat, w_flat
