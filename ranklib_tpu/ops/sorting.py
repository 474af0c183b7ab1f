"""Stable ranking primitives.

The reference's MergeSorter (ref: utilities/MergeSorter.java:~20) is a
stable mergesort returning permutation indices; stability defines RankLib's
deterministic tie-breaking everywhere (ranking by score, ideal orderings,
per-feature argsorts). jnp.argsort(stable=True) gives the same contract:
equal keys keep their original relative order.
"""

from __future__ import annotations

import jax.numpy as jnp


def rank_perm(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Permutation ranking docs by score DESC, stable ties, padding last.

    scores/mask: [..., D]. Returns int32 [..., D] such that
    ``take_along_axis(x, perm)`` reorders doc-wise arrays into rank order.
    """
    key = jnp.where(mask, -scores, jnp.inf)
    return jnp.argsort(key, axis=-1, stable=True)


def rank_labels(labels, scores, mask):
    """Labels gathered into score-descending rank order (padding → 0 tail)."""
    perm = rank_perm(scores, mask)
    ranked = jnp.take_along_axis(labels, perm, axis=-1)
    n = mask.sum(axis=-1, keepdims=True)
    pos = jnp.arange(labels.shape[-1])
    return jnp.where(pos < n, ranked, 0.0)


def ideal_labels(labels, mask):
    """Labels sorted descending (the 'correct ranking', stable)."""
    return rank_labels(labels, labels, mask)
