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
work), batched over queries. Callers (gbdt.boost, parallel.dist) hand in
padded query buckets pre-chunked so no pair temporary exceeds a fixed
element budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


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
