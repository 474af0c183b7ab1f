"""Shared fixture for the gather-locality probes
(exp_gather_scale.py mechanism probe and exp_gather_flat_ab.py A/B).

Models boost._device_buckets' layout without building a Dataset: each
didx row is a query's contiguous 80-160-doc run; rows within a chunk
are same-size-class queries scattered across dataset order; chunks
split at the PAIR_BUDGET row cap. Both probes MUST model the identical
layout for their conclusions to compose — hence one copy.
"""

import numpy as np

PAIR_BUDGET = 1 << 24


def build_didx(n_queries, seed):
    """-> (N, chunk list of [rows, D] int32 didx arrays, pad value N)."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(80, 161, n_queries)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    N = int(sizes.sum())
    classes = {}
    for qi in range(n_queries):
        D = 96 if sizes[qi] <= 96 else 112 if sizes[qi] <= 112 else \
            128 if sizes[qi] <= 128 else 160
        classes.setdefault(D, []).append(qi)
    chunks = []
    for D, qs in sorted(classes.items()):
        B = len(qs)
        didx = np.full((B, D), N, np.int32)
        for row, qi in enumerate(qs):
            didx[row, : sizes[qi]] = np.arange(
                starts[qi], starts[qi] + sizes[qi], dtype=np.int32)
        rows = max(1, min(B, PAIR_BUDGET // (D * D)))
        for lo in range(0, B, rows):
            hi = min(lo + rows, B)
            pad = rows - (hi - lo)
            chunks.append(np.pad(didx[lo:hi], ((0, pad), (0, 0)),
                                 constant_values=N))
    return N, chunks
