"""Streaming parse→bin loader for wide/sparse inputs (``-sparse``).

The dense pipeline (data.letor → gbdt.binning) materializes the full
``[N, F]`` float32 feature matrix before pre-binning — the right call for
MSLR-class dense data, but the host-RAM wall for wide sparse files (the
case the reference serves with storage-level sparse vectors, ref:
learning/SparseDataPoint.java:~15). This loader never materializes raw
values at all:

  pass 1  letor_stat          — doc/query counts + max fid;
  pass 2  letor_value_stats   — per-feature capped unique sets + min/max,
                                streamed off the file (implicit zeros of
                                unspecified fids folded in);
          thresholds_from_uniques — the SAME decision code the dense
                                pipeline uses, so grids are bit-identical;
  pass 3  letor_fill_binned   — parse + bin in one stream straight into
                                the int16 bin matrix the GBDT engine
                                uploads anyway.

Peak host memory is the 2-byte bin matrix (plus the raw file buffer),
~4× below the dense pipeline's f32 matrix + int bin matrix, independent
of how sparse the file is. GBDT trains bit-identically to the dense path
(tests/test_data.py pins model-string equality); rankers that need raw
feature values (neural, linear, CoorAscent, boosting) go through the
host-CSR loader instead (data/sparse.py — ~nnz memory, bounded dense
chunk materialization).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ranklib_tpu.data.dataset import Dataset, Query
from ranklib_tpu.utils.errors import RankLibError
from ranklib_tpu.utils.logging import log


@dataclass
class BinnedDataset(Dataset):
    """A feats-free Dataset plus its doc-major bin matrix.

    ``queries[i].feats is None``; the training representation is
    ``binned[N, F] int16`` in query file order with ``thresholds[F, B]``
    (value ≤ thresholds[f, b] ⟺ bin ≤ b). Metric/lambda code only needs
    labels+masks and works unchanged; GBDT consumes ``binned`` directly.
    """

    thresholds: np.ndarray = None   # [F, B] float32, +inf padded
    binned: np.ndarray = None       # [N, F] int16, query file order

    def subset_queries(self, idxs) -> "BinnedDataset":
        """New BinnedDataset of the given query indices (k-fold CV folds
        ride the streamed bin matrix — data.cv.prepare_cv dispatches on
        this method)."""
        idxs = list(idxs)
        qptr = np.zeros(len(self.queries) + 1, np.int64)
        np.cumsum([q.n for q in self.queries], out=qptr[1:])
        rows = (np.concatenate([np.arange(qptr[i], qptr[i + 1])
                                for i in idxs])
                if idxs else np.zeros(0, np.int64))
        return BinnedDataset(
            queries=[self.queries[i] for i in idxs],
            n_features=self.n_features, thresholds=self.thresholds,
            binned=self.binned[rows])


def read_letor_binned(path: str, n_threshold: int = 256,
                      thresholds: np.ndarray | None = None,
                      must_have_rel_doc: bool = False,
                      n_features: int | None = None,
                      missing_zero: bool = True,
                      quiet: bool = False,
                      want_descs: bool = False) -> BinnedDataset:
    """Stream a LETOR file directly into a :class:`BinnedDataset`.

    ``thresholds``: bin with an existing grid (validation/test files bin
    with the TRAINING grid, exactly like the dense pipeline). Otherwise
    the grid is computed from this file's own streamed value statistics —
    bit-identical to ``compute_thresholds`` on the dense matrix.

    ``want_descs`` streams the per-doc '#' descriptions too (one extra
    pass) so ``-qrel``/``-indri`` work without the dense fallback (ref:
    learning/SparseDataPoint.java:~15 keeps the description).

    Raises :class:`RankLibError` when the native parser is unavailable
    (no g++) or the file needs the Python parser (oversized tokens) —
    callers fall back to the dense pipeline.
    """
    from ranklib_tpu.gbdt.binning import thresholds_from_uniques
    from ranklib_tpu.native.loader import (
        NativeParseError, native_letor_stat, native_letor_value_stats,
        native_parse_letor_binned,
    )

    if path.endswith(".gz"):
        # streamed temp decompression (shared helper): the three native
        # passes then read the plain file; the temp is unlinked before
        # returning
        from ranklib_tpu.native.loader import gunzip_to_temp

        tmp_path = gunzip_to_temp(path)
        try:
            return read_letor_binned(
                tmp_path, n_threshold=n_threshold, thresholds=thresholds,
                must_have_rel_doc=must_have_rel_doc, n_features=n_features,
                missing_zero=missing_zero, quiet=quiet,
                want_descs=want_descs)
        finally:
            try:
                os.unlink(tmp_path)
            except OSError:
                pass
    try:
        stat = native_letor_stat(path)
    except NativeParseError as e:
        raise RankLibError(str(e)) from None
    if stat is None:
        raise RankLibError(
            "streaming -sparse loader requires the native parser "
            "(g++ unavailable?); use the dense pipeline")
    n_docs, n_queries, max_fid = stat
    if n_docs == 0 or n_queries == 0:
        raise RankLibError(f"No queries read from {path}")
    F = max(max_fid, int(n_features or 0))
    grid_local = thresholds is None
    try:
        if thresholds is None:
            if n_threshold > 400:
                raise RankLibError(
                    f"-sparse streaming supports -tc up to 400 "
                    f"(got {n_threshold}); use the dense pipeline")
            stats = native_letor_value_stats(path, F, n_threshold)
            if stats is None:
                raise RankLibError(
                    "native streaming stats unavailable; use the dense "
                    "pipeline")
            vals, counts, minmax = stats
            thresholds, _ = thresholds_from_uniques(vals, counts, minmax,
                                                    n_threshold)
        elif thresholds.shape[0] != F:
            # the model/train grid defines the feature space; extra fids in
            # this file are unusable by the model (clip — the dense path's
            # with_width semantics), missing ones read as 0
            F = thresholds.shape[0]
        parsed = native_parse_letor_binned(path, thresholds, n_docs,
                                           n_queries)
        if parsed is None:
            raise RankLibError(
                "native streaming binner unavailable; use the dense "
                "pipeline")
        labels, bins, qptr, qids, counts_per_doc = parsed
    except NativeParseError as e:
        raise RankLibError(str(e)) from None
    if not missing_zero:
        from ranklib_tpu.data.letor import _check_fully_specified
        _check_fully_specified(path, counts_per_doc, max_fid, qptr, qids)
    descs = None
    if want_descs:
        from ranklib_tpu.data.letor import read_descs
        descs = read_descs(path, n_docs)

    queries = []
    keep_rows = None
    n_dropped = 0
    if must_have_rel_doc:
        keep_rows = np.ones(n_docs, bool)
    for i, qid in enumerate(qids):
        s, e = int(qptr[i]), int(qptr[i + 1])
        lab = labels[s:e]
        if must_have_rel_doc and not (lab > 0).any():
            keep_rows[s:e] = False
            n_dropped += 1
            continue
        queries.append(Query(qid=qid, labels=lab, feats=None,
                             descs=(descs[s:e] if descs is not None
                                    else [])))
    if not queries:
        raise RankLibError(f"No queries read from {path}")
    if n_dropped:
        if grid_local:
            # the grid above was computed over ALL file rows, but the
            # dense pipeline drops no-rel queries BEFORE computing
            # thresholds — a unique/min/max present only in a dropped
            # query would change the grid and break bit-parity (review
            # finding). Bounce to the dense pipeline (callers catch this
            # as loader-not-applicable).
            raise RankLibError(
                f"{n_dropped} no-relevant-doc queries would be dropped "
                f"after the file-level grid; use the dense pipeline")
        bins = bins[keep_rows]
    if not quiet:
        log(f"Reading feature file [{path}]... [Done.] (streamed to bins)")
        log(f"({len(queries)} ranked lists, "
            f"{sum(q.n for q in queries)} entries read)")
        if n_dropped:
            log(f"({n_dropped} queries with no relevant documents dropped)")
    return BinnedDataset(queries=queries, n_features=F,
                         thresholds=thresholds, binned=bins)


def split_binned(ds: BinnedDataset, n_train: int):
    """Split by query count into two BinnedDatasets (contiguous, so the
    bin matrix slices as views — the -tvs/-tts carve-outs)."""
    n_docs_a = sum(q.n for q in ds.queries[:n_train])
    return (
        BinnedDataset(queries=ds.queries[:n_train], n_features=ds.n_features,
                      thresholds=ds.thresholds, binned=ds.binned[:n_docs_a]),
        BinnedDataset(queries=ds.queries[n_train:], n_features=ds.n_features,
                      thresholds=ds.thresholds, binned=ds.binned[n_docs_a:]),
    )


def binned_from_csr(ds, n_threshold: int = 256,
                    thresholds: np.ndarray | None = None) -> BinnedDataset:
    """BinnedDataset from a CSRDataset via bounded dense chunks — the
    GBDT route for ``-sparse -norm``: the CSR carries LAZY per-query
    normalization (data.sparse.normalize_csr), so chunks materialize
    already-normalized and bin exactly like the dense pipeline's
    normalize-then-bin. Host peak: one chunk + the int16 bin matrix.

    Threshold grids merge chunked capped-unique statistics exactly: a
    chunk overflowing the cap implies the union overflows it (→ the
    evenly spaced min/max grid, same as compute_thresholds), otherwise
    the union of chunk uniques IS the feature's unique set — grids are
    bit-identical to compute_thresholds on the materialized matrix.
    """
    from ranklib_tpu.data.sparse import _chunk_bytes
    from ranklib_tpu.gbdt.binning import (
        bin_features, thresholds_from_uniques,
    )
    from ranklib_tpu.native.loader import native_feature_uniques

    N, F = ds.n_docs, ds.n_features
    rows = max(1, _chunk_bytes() // (max(1, F) * 4))
    if thresholds is None:
        uvals = [np.zeros(0, np.float32) for _ in range(F)]
        over = np.zeros(F, bool)
        minmax = np.empty((F, 2), np.float32)
        minmax[:, 0], minmax[:, 1] = np.inf, -np.inf
        for lo in range(0, N, rows):
            X = ds.materialize_rows(lo, min(lo + rows, N))
            nat = native_feature_uniques(X, n_threshold)
            if nat is None:
                cvals, cc = [], []
                cminmax = np.zeros((F, 2), np.float32)
                for f in range(F):
                    u = np.unique(X[:, f])
                    cvals.append(u[: n_threshold + 1])
                    cc.append(len(u))
                    # NaN-free minmax, exactly compute_thresholds'
                    # fallback rule (np.unique sorts NaN LAST, so
                    # (u[0], u[-1]) fed a NaN into the linspace grid —
                    # review finding); ±inf seeds keep an all-NaN chunk
                    # inert in the cross-chunk min/max merge
                    fin = u[~np.isnan(u)]
                    cminmax[f] = ((fin[0], fin[-1]) if len(fin)
                                  else (np.inf, -np.inf))
                ccounts = np.asarray(cc)
            else:
                v, ccounts, cminmax = nat
                cvals = [v[f][: min(int(ccounts[f]), n_threshold)]
                         for f in range(F)]
                # the native pass normalizes a nothing-seen minmax to
                # (0, 0) — correct single-shot semantics, but a real 0
                # in a cross-CHUNK merge: a chunk whose feature is
                # all-NaN (one canonical-NaN unique) would fold a fake
                # 0 into the running min (review finding, round 5 —
                # streamed over-cap grids read [0, max] vs dense
                # [true_min, max]). All-NaN is exactly count==1 with a
                # NaN unique; restore the inert ±inf seeds for those.
                nan_only = (ccounts == 1) & np.isnan(v[:, 0])
                cminmax[nan_only, 0] = np.inf
                cminmax[nan_only, 1] = -np.inf
            for f in range(F):
                if ccounts[f] > n_threshold:
                    over[f] = True
                elif not over[f]:
                    uvals[f] = np.unique(
                        np.concatenate([uvals[f], cvals[f]]))
                    if len(uvals[f]) > n_threshold:
                        over[f] = True
            minmax[:, 0] = np.minimum(minmax[:, 0], cminmax[:, 0])
            minmax[:, 1] = np.maximum(minmax[:, 1], cminmax[:, 1])
        # no non-NaN value ever seen: normalize the untouched ±inf seeds
        # to the canonical (0, 0) (only over-cap features consume minmax,
        # and those cannot be all-NaN — this is belt-and-braces)
        unseen = minmax[:, 0] > minmax[:, 1]
        minmax[unseen] = 0.0
        counts = np.asarray([n_threshold + 1 if over[f] else len(uvals[f])
                             for f in range(F)])
        thresholds, _ = thresholds_from_uniques(uvals, counts, minmax,
                                                n_threshold)
    binned = np.empty((N, F), np.int16)
    for lo in range(0, N, rows):
        hi = min(lo + rows, N)
        binned[lo:hi] = bin_features(ds.materialize_rows(lo, hi),
                                     thresholds).astype(np.int16)
    return BinnedDataset(
        queries=[Query(qid=q.qid, labels=q.labels, feats=None,
                       descs=q.descs)
                 for q in ds.queries],
        n_features=F, thresholds=thresholds, binned=binned)
