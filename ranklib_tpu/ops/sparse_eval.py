"""Device-resident sparse candidate evaluation (embedding-style layer).

The dense candidate evaluator (ops.batched_eval) holds every padded
``[rows, D, F]`` feature block in HBM — the right call for MSLR-class
widths, but the DEVICE-memory wall for wide sparse data (data/sparse.py
module note; the reference's storage answer is
learning/SparseDataPoint.java:~15). This module keeps the dataset on
device in COO form instead — ``fids``/``vals``/``rowid``, memory ~
nonzeros — and evaluates candidate weight matrices with the
embedding-style primitive:

    scores[n, k] = Σ_{j : rowid[j]=n} vals[j] · W[fids[j], k]

i.e. a gather of W rows by fid (one [chunk, K] embedding lookup) followed
by a SORTED segment-sum back to doc rows. The nnz axis is processed in
fixed-size chunks so the gather temporary is bounded (~128 MB at
K = 256); rows may span chunk boundaries — per-chunk partial segment
sums add into the flat score table, exact because row-slot addition
commutes with chunking.

The COO is extracted from MATERIALIZED bounded chunks
(CSRDataset.materialize_rows — the pipeline's ground truth), so lazy
normalization, fid clipping and duplicate-fid last-wins semantics are
inherited exactly rather than re-implemented. Note zscore/linear
normalization DENSIFIES per query (implicit zeros map to −μ/σ ≠ 0): the
COO then holds ~docs × per-query-present-features entries — still far
below N·F for sparse data, but not ~file-nnz; ``sum`` keeps zeros at
zero.

The segment-sum is the one TPU-hostile step (no matmul); the caller
routes to this path only when the dense blocks would not fit HBM.
Numerically the result can differ from the dense matmul in the last
ulps (f32 reduction over a row's nonzeros vs all F columns), so parity
tests pin tight tolerances, not byte equality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.metrics.base import MetricScorer

# nnz entries per device chunk: bounds the [CHUNK, K] gather temporary
# (128 MB f32 at K = 256)
NNZ_CHUNK = 1 << 17


def device_dense_budget_bytes() -> int:
    """HBM budget for dense bucket residency
    (env RANKLIB_TPU_DEVICE_DENSE_MB, default 1024). Above it, rankers
    that support this module route candidate evaluation through the
    sparse layer instead of uploading dense blocks."""
    import os

    mb = os.environ.get("RANKLIB_TPU_DEVICE_DENSE_MB", "1024")
    try:
        return max(0, int(mb)) << 20      # 0 forces the sparse layer
    except ValueError:
        return 1024 << 20


def wants_sparse_eval(ds) -> bool:
    """True when ``ds`` is a CSRDataset whose dense device blocks would
    exceed the budget — the routing predicate for the sparse layer."""
    return (bool(ds.queries) and ds.queries[0].feats is None
            and hasattr(ds, "materialize_rows")
            and ds.n_docs * ds.n_features * 4 > device_dense_budget_bytes())


def build_sparse_data(ds):
    """Device pytree for the jitted evaluation core.

    ``ds``: a data.sparse.CSRDataset. Returns (chunks, buckets, N) where
    chunks is a tuple of (fids [C] i32, vals [C] f32, rowid [C] i32)
    with padding entries pointing at the sentinel row N, and buckets are
    the (labels, mask, didx) metric buckets of
    gbdt.boost._device_buckets.
    """
    from ranklib_tpu.data.sparse import _chunk_bytes
    from ranklib_tpu.gbdt.boost import _device_buckets

    N, F = ds.n_docs, ds.n_features
    rows_per = max(1, _chunk_bytes() // (F * 4))
    f_parts, v_parts, r_parts = [], [], []
    for lo in range(0, N, rows_per):
        hi = min(lo + rows_per, N)
        X = ds.materialize_rows(lo, hi)       # norm/clip/last-wins exact
        r, f = np.nonzero(X)
        f_parts.append(f.astype(np.int32))
        v_parts.append(X[r, f].astype(np.float32))
        r_parts.append((r + lo).astype(np.int32))
    fids = (np.concatenate(f_parts) if f_parts else np.zeros(0, np.int32))
    vals = (np.concatenate(v_parts) if v_parts else np.zeros(0, np.float32))
    rowid = (np.concatenate(r_parts) if r_parts else np.zeros(0, np.int32))
    # chunk = next power of two covering nnz, capped at NNZ_CHUNK: small
    # datasets must not pay a full 131K-entry gather of padding per call
    chunk = 1 << 12
    while chunk < len(fids) and chunk < NNZ_CHUNK:
        chunk <<= 1
    pad = (-len(fids)) % chunk
    if pad:
        fids = np.pad(fids, (0, pad))
        vals = np.pad(vals, (0, pad))
        rowid = np.pad(rowid, (0, pad), constant_values=N)  # sentinel row
    chunks = tuple(
        (jnp.asarray(fids[s: s + chunk]),
         jnp.asarray(vals[s: s + chunk]),
         jnp.asarray(rowid[s: s + chunk]))
        for s in range(0, len(fids), chunk))
    buckets = _device_buckets(ds, sentinel=N)
    return chunks, buckets, N


def sparse_scores_flat(Wf, chunks, N):
    """Wf [F, K] → flat scores [N + 1, K] (sentinel row last) via chunked
    gather + sorted segment-sum."""
    K = Wf.shape[1]
    S = jnp.zeros((N + 1, K), jnp.float32)
    for fids, vals, rowid in chunks:
        part = Wf[fids] * vals[:, None]                       # [C, K]
        S = S + jax.ops.segment_sum(part, rowid, num_segments=N + 1,
                                    indices_are_sorted=True)
    return S


def sparse_mean_metric(scorer: MetricScorer, Wf, chunks, buckets, N,
                       n_queries: int):
    """Wf [F, K] → mean metric [K] over all queries (jit-friendly)."""
    S = sparse_scores_flat(Wf, chunks, N)

    def one_candidate(sc_flat):
        total = jnp.float32(0.0)
        for lab, msk, didx in buckets:
            total += scorer.score_from_scores(lab, sc_flat[didx], msk).sum()
        return total

    return jax.vmap(one_candidate, in_axes=1)(S) / n_queries
