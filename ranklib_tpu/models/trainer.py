"""Training harness (ref: learning/RankerTrainer.java:~20).

Creates the ranker, fits it, prints wall-clock training time — the
reference's only profiling output. Hyperparameters arrive as a dict of
per-instance attributes (the reference sets public STATIC fields on ranker
classes before construction; we deliberately drop that global state).
"""

from __future__ import annotations

import time

from ranklib_tpu.data.dataset import Dataset
from ranklib_tpu.metrics.base import MetricScorer
from ranklib_tpu.models.base import Ranker, get_ranker_class
from ranklib_tpu.utils.logging import log


def train_ranker(
    ranker_type,
    train: Dataset,
    scorer: MetricScorer,
    validation: Dataset | None = None,
    hparams: dict | None = None,
    n_dp: int = 0,
    profile_dir: str | None = None,
) -> Ranker:
    """``n_dp > 1`` requests data-parallel training over that many devices
    (rankers that support a ``mesh`` kwarg — the GBDT family).
    ``profile_dir`` wraps the fit in a jax.profiler trace."""
    cls = get_ranker_class(ranker_type)
    hparams = dict(hparams or {})
    resume = hparams.pop("_resume_from", None)
    feature_mask = hparams.pop("_feature_mask", None)
    ranker = cls(**hparams)
    if resume:
        from ranklib_tpu.models.base import load_ranker_file

        loaded = load_ranker_file(resume)
        if type(loaded) is not type(ranker):
            from ranklib_tpu.utils.errors import RankLibError

            raise RankLibError(
                f"-resume model is a {loaded.NAME}, not a {ranker.NAME}")
        if not hasattr(loaded, "ensemble"):
            from ranklib_tpu.utils.errors import RankLibError

            raise RankLibError(
                f"-resume is only supported for tree rankers "
                f"(got {ranker.NAME})")
        ranker.ensemble = loaded.ensemble      # warm start (tree rankers)
    kwargs = {}
    if feature_mask is not None:
        # -feature on the streamed (-sparse) GBDT path: unlisted features
        # are never split on — for tree rankers exactly equivalent to the
        # dense pipeline's column zeroing (a feature absent from every
        # tree contributes nothing at eval either)
        import inspect

        if "feature_mask" in inspect.signature(ranker.fit).parameters:
            kwargs["feature_mask"] = feature_mask
        else:
            log(f"({ranker.NAME} fit() takes no feature mask; "
                f"-feature ignored on this path)")
    if n_dp and n_dp > 1:
        import inspect

        if "mesh" in inspect.signature(ranker.fit).parameters:
            from ranklib_tpu.parallel.dist import make_mesh

            kwargs["mesh"] = make_mesh(n_dp)
        else:
            log(f"({ranker.NAME} has no data-parallel path; -dp ignored)")
    t0 = time.perf_counter()
    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            ranker.fit(train, scorer, validation, **kwargs)
        log(f"Profiler trace written to: {profile_dir}")
    else:
        ranker.fit(train, scorer, validation, **kwargs)
    elapsed = time.perf_counter() - t0
    log("")
    log(f"Training time: {elapsed:.2f} seconds")
    return ranker
