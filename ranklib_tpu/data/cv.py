"""k-fold cross-validation splits.

Deterministic sequential (round-robin) assignment of queries to folds, no
shuffle — matches the reference's FeatureManager.prepareCV semantics
(ref: features/FeatureManager.java:~200): query i lands in test fold
``i % k``; the remaining folds form its training set. With ``tvs`` (train-
validation split ratio, ref: Evaluator -tvs), the tail of each fold's train
queries becomes validation.
"""

from __future__ import annotations

from ranklib_tpu.data.dataset import Dataset
from ranklib_tpu.utils.errors import RankLibError


def prepare_cv(ds: Dataset, n_fold: int, tvs: float = -1.0, lazy=False):
    """(train, validation_or_None, test) Dataset triples — a list, or a
    per-fold generator with ``lazy=True``.

    For subset-materializing datasets (CSR / streamed bins,
    ``subset_queries``) each fold triple COPIES its rows; eager
    preparation would hold ~k× the matrix at once — exactly the host-RAM
    case ``-sparse`` exists for — so the evaluator iterates lazily and
    only one fold's copies are ever live. Plain datasets share Query
    references either way."""
    if n_fold < 2:
        raise RankLibError(f"Need at least 2 folds, got {n_fold}")
    if len(ds.queries) < n_fold:
        raise RankLibError(
            f"Cannot make {n_fold} folds from {len(ds.queries)} queries"
        )
    fold_test = [[] for _ in range(n_fold)]
    for i in range(len(ds.queries)):
        fold_test[i % n_fold].append(i)
    if hasattr(ds, "subset_queries"):        # CSR / binned row subsets
        make = ds.subset_queries
    else:
        def make(idxs):
            return Dataset([ds.queries[i] for i in idxs], ds.n_features)

    def one_fold(f):
        train = [i for g in range(n_fold) if g != f for i in fold_test[g]]
        valid = None
        if tvs and tvs > 0:
            n_train = int(len(train) * tvs)
            if n_train < 1 or n_train >= len(train):
                raise RankLibError(
                    f"-tvs {tvs} leaves an empty train or validation split")
            valid = make(train[n_train:])
            train = train[:n_train]
        return (make(train), valid, make(fold_test[f]))

    if lazy:
        return (one_fold(f) for f in range(n_fold))
    return [one_fold(f) for f in range(n_fold)]


def split_tvs(ds: Dataset, tvs: float):
    """Split one dataset into (train, validation) by ratio (ref: -tvs flag).
    Streaming binned datasets split with their bin-matrix views intact."""
    n_train = int(len(ds.queries) * tvs)
    if n_train < 1 or n_train >= len(ds.queries):
        raise RankLibError(f"-tvs {tvs} leaves an empty train or validation split")
    if getattr(ds, "binned", None) is not None:
        from ranklib_tpu.data.binned import split_binned
        return split_binned(ds, n_train)
    if hasattr(ds, "subset_queries"):        # CSRDataset keeps CSR views
        return (ds.subset_queries(range(n_train)),
                ds.subset_queries(range(n_train, len(ds.queries))))
    return (
        Dataset(ds.queries[:n_train], ds.n_features),
        Dataset(ds.queries[n_train:], ds.n_features),
    )
