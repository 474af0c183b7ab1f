"""Orchestration flows (ref: eval/Evaluator.java:~400+).

One function per reference flow: train(+validate)(+test), k-fold CV,
load+test, load+rank (rerank), load+score, per-query metric output (-idv).
The CLI (ranklib_tpu.cli) parses RankLib's flags and dispatches here.
"""

from __future__ import annotations

import os

import numpy as np

from ranklib_tpu.data.cv import prepare_cv, split_tvs
from ranklib_tpu.data.dataset import (
    Dataset, feature_mask_from_fids, read_feature_file,
)
from ranklib_tpu.data.letor import read_letor
from ranklib_tpu.data.normalize import normalize_dataset
from ranklib_tpu.data.qrel import apply_qrel
from ranklib_tpu.metrics.base import MetricScorer, create_scorer, score_dataset
from ranklib_tpu.models.base import Ranker, load_ranker_file
from ranklib_tpu.models.trainer import train_ranker
from ranklib_tpu.utils.errors import RankLibError
from ranklib_tpu.utils.logging import log, result


def _prepare(path, norm, feature_fids, must_have_rel, n_features=None,
             qrel=None, missing_zero=False, sparse=False,
             want_descs=False):
    if sparse:
        # -sparse on load/test/rank flows: host CSR, bounded chunks.
        # -norm applies lazily at materialization; -qrel / -indri fetch
        # the '#' descriptions as a side-array (want_descs) so docid
        # matching/output works without the dense fallback.
        from ranklib_tpu.data.sparse import normalize_csr, read_letor_sparse

        ds = read_letor_sparse(path, must_have_rel_doc=must_have_rel,
                               n_features=n_features,
                               missing_zero=missing_zero,
                               want_descs=want_descs or bool(qrel))
        if n_features is not None and ds.n_features != n_features:
            ds = ds.with_width(n_features)
        if qrel:
            apply_qrel(ds, qrel)
        if feature_fids is not None:
            ds = ds.subset_features(feature_fids)
        if norm:
            ds = normalize_csr(ds, norm)
        return ds
    ds = read_letor(path, must_have_rel_doc=must_have_rel,
                    n_features=n_features, missing_zero=missing_zero)
    if n_features is not None and ds.n_features != n_features:
        # file has fids above the training width: clip to the train/model
        # feature space (extra fids are unusable by the model — exactly the
        # reference's unused-global-fid semantics)
        log(f"[{path}] feature width {ds.n_features} -> {n_features} "
            f"(aligned to the training feature space)")
        ds = ds.with_width(n_features)
    if qrel:
        apply_qrel(ds, qrel)
    if feature_fids is not None:
        ds = ds.subset_features(feature_fids)
    if norm:
        normalize_dataset(ds, norm)
    return ds


def write_idv(path: str, scorer: MetricScorer, ds: Dataset, per_query) -> None:
    """Per-query metric file (ref: eval/Evaluator.java:~800, consumed by
    Analyzer): '<metric>   <qid>   <value>' lines + an 'all' summary row."""
    with open(path, "w") as f:
        for q, v in zip(ds.queries, per_query):
            f.write(f"{scorer.name}   {q.qid}   {v:.4f}\n")
        f.write(f"{scorer.name}   all   {float(np.mean(per_query)):.4f}\n")
    log(f"Per-ranked-list performance saved to: {path}")


def write_score_file(path: str, ds: Dataset, scores) -> None:
    """'<qid>\\t<docIndex>\\t<score>' lines (ref: Evaluator score flow)."""
    with open(path, "w") as f:
        for q, s in zip(ds.queries, scores):
            for i, v in enumerate(s):
                f.write(f"{q.qid}\t{i}\t{float(v):.6f}\n")
    log(f"Scores saved to: {path}")


def write_indri_rankings(path: str, ds: Dataset, scores) -> None:
    """Indri-style reranking output (ref: Evaluator -indri flow):
    '<qid> Q0 <docid> <rank> <score> indri' in score-descending order.

    The docid column is the RAW '#' description minus the marker — the
    reference writes description.replace("#", "").trim() verbatim, so a
    multi-token MSLR-style comment ('docid = GX008-86 inc = ...') appears
    as-is here (exactly as the Java tool emits it), while -qrel matching
    deliberately token-extracts via data.qrel.doc_id. Divergent on
    purpose; do not "fix" one to match the other."""
    with open(path, "w") as f:
        for q, s in zip(ds.queries, scores):
            order = np.argsort(-np.asarray(s), kind="stable")
            for rank, idx in enumerate(order, start=1):
                desc = q.descs[idx] if q.descs and q.descs[idx] else ""
                # replace EVERY '#', not just the leading marker — the
                # reference's replace("#", "").trim() applies to embedded
                # '#' too (e.g. 'docid = GX008-86#p2' -> '... GX008-86p2')
                docid = desc.replace("#", "").strip() or f"doc{idx}"
                f.write(f"{q.qid} Q0 {docid} {rank} {float(s[idx]):.6f} indri\n")
    log(f"Reranked lists saved to: {path}")




def _try_stream(args) -> bool:
    """-sparse routes tree rankers through the streaming parse→bin loader
    (data.binned) when its preconditions hold: GBDT-family ranker (only
    trees consume bins; other rankers need raw values) and no per-query
    normalization (transforms raw values before binning); native parser
    available. ``-qrel`` is served by streaming the '#' descriptions as
    a side-array (want_descs). ``-feature`` is served as a split feature
    MASK (exactly equivalent for trees — see models/trainer). Random
    Forests (8) bin with the shared grid exactly like its per-bag MART
    fits would."""
    return bool(args.sparse and args.ranker in (0, 6, 8) and not args.norm)


def _try_stream_norm(args) -> bool:
    """-sparse -norm for tree rankers: the raw-value streaming passes
    can't apply per-query normalization, so the input lands in host CSR
    with LAZY normalization and bins from normalized chunks
    (data.binned.binned_from_csr) — grids and models bit-identical to
    the dense normalize-then-bin pipeline."""
    return bool(args.sparse and args.ranker in (0, 6, 8) and args.norm)


def _read_csr_norm_binned(path, args, must_rel, feature_fids,
                          n_features=None, thresholds=None):
    """CSR → lazy-norm → per-file bins, for -sparse -norm tree rankers.

    Does NOT apply -qrel: callers do that on the returned dataset,
    OUTSIDE their loader-fallback try blocks (a qrel problem is a real
    error, not a loader-applicability signal). Binning only reads
    feature values, so qrel's label overwrite commutes with it; the
    '#' descriptions (want_descs) propagate through binned_from_csr."""
    from ranklib_tpu.data.binned import binned_from_csr
    from ranklib_tpu.data.sparse import normalize_csr, read_letor_sparse

    ds = read_letor_sparse(path, must_have_rel_doc=must_rel,
                           n_features=n_features,
                           missing_zero=args.missingZero,
                           want_descs=bool(args.qrel))
    if n_features is not None and ds.n_features != n_features:
        ds = ds.with_width(n_features)
    if feature_fids is not None:
        ds = ds.subset_features(feature_fids)
    ds = normalize_csr(ds, args.norm)
    tc = args.tc if args.tc is not None else 256
    return binned_from_csr(ds, n_threshold=tc, thresholds=thresholds)


def _try_csr(args) -> bool:
    """-sparse routes RAW-VALUE rankers (neural 1/5/7, RankBoost 2,
    AdaRank 3, CoorAscent 4, linear 9) through the host-CSR loader
    (data.sparse): memory ~ nnz, dense blocks materialized in bounded
    chunks (RankBoost additionally keeps an int16 bin matrix — the GBDT
    streaming loader's discipline). -norm applies LAZILY at
    materialization (normalize_csr: per-query stats held as [Q, F]
    arrays; the dense formula runs per chunk, bit-identical models);
    -qrel streams the '#' descriptions as a side-array (want_descs)."""
    return bool(args.sparse and args.ranker in (1, 2, 3, 4, 5, 7, 9))


def evaluate_train(args) -> Ranker:
    """Flow 3.1/3.2-adjacent: train (+validate) (+test), save model."""
    feature_fids = read_feature_file(args.feature) if args.feature else None
    train_scorer = create_scorer(args.metric2t, gmax=args.gmax)
    test_scorer = (
        create_scorer(args.metric2T, gmax=args.gmax)
        if args.metric2T else train_scorer
    )
    must_rel = train_scorer.needs_rel
    stream = _try_stream(args)
    stream_n = not stream and _try_stream_norm(args)
    csr = not stream and not stream_n and _try_csr(args)
    tts = getattr(args, "tts", -1.0)
    has_tts = bool(tts) and tts > 0
    tvs_wanted = (not args.validate and not has_tts
                  and bool(args.tvs) and args.tvs > 0)
    # when the CSR split-grid branch below will reload the file anyway
    # (-tts/-tvs under the streamed loaders bin per-subset grids), skip
    # the initial parse+bin pass entirely — it was fully discarded, and
    # on multi-GB -sparse inputs it doubled startup I/O+binning (review
    # finding, round 5). The split branch carries its own dense fallback.
    split_reload = (stream or stream_n) and (has_tts or tvs_wanted)
    if stream and not split_reload:
        from ranklib_tpu.data.binned import read_letor_binned
        tc = args.tc if args.tc is not None else 256
        try:
            train = read_letor_binned(
                args.train, n_threshold=tc, must_have_rel_doc=must_rel,
                missing_zero=args.missingZero,
                want_descs=bool(args.qrel))
        except RankLibError as e:
            log(f"[-sparse] streaming loader not applicable ({e}); "
                f"using the dense pipeline")
            stream = False
        if stream and args.qrel:
            # outside the fallback try: a qrel problem is a real error,
            # not a loader-applicability signal (and would recur after a
            # pointless dense re-read)
            apply_qrel(train, args.qrel)
        if stream and feature_fids is not None:
            args.hparams = dict(args.hparams or {})
            args.hparams["_feature_mask"] = feature_mask_from_fids(
                feature_fids, train.n_features)
    if stream_n and not split_reload:
        try:
            train = _read_csr_norm_binned(args.train, args, must_rel,
                                          feature_fids)
        except RankLibError as e:
            log(f"[-sparse] CSR-normalized binning not applicable ({e}); "
                f"using the dense pipeline")
            stream_n = False
        if stream_n and args.qrel:
            apply_qrel(train, args.qrel)
    if csr:
        from ranklib_tpu.data.sparse import normalize_csr, read_letor_sparse
        try:
            train = read_letor_sparse(
                args.train, must_have_rel_doc=must_rel,
                missing_zero=args.missingZero,
                want_descs=bool(args.qrel))
        except RankLibError as e:
            log(f"[-sparse] CSR loader not applicable ({e}); "
                f"using the dense pipeline")
            csr = False
        if csr:
            # qrel/subset/norm outside the fallback try: their errors are
            # real, not loader-applicability signals
            if args.qrel:
                apply_qrel(train, args.qrel)
            if feature_fids is not None:
                train = train.subset_features(feature_fids)
            if args.norm:
                train = normalize_csr(train, args.norm)
    if not stream and not stream_n and not csr:
        train = _prepare(args.train, args.norm, feature_fids, must_rel,
                         missing_zero=args.missingZero,
                         qrel=args.qrel)
    split_test = None
    validation = None
    if (stream or stream_n) and (has_tts or tvs_wanted):
        # Splitting a streamed BinnedDataset would keep the WHOLE-FILE
        # threshold grid, but the dense pipeline computes grids from the
        # train SUBSET (review finding — the kcv per-fold-grid rule
        # applies to -tts/-tvs too). Reload via CSR, split there, and bin
        # each side with the train subset's own grid; the held-out side
        # bins with the TRAIN grid (it only ever scores in bin space).
        from ranklib_tpu.data.binned import binned_from_csr
        try:
            csr_ds = _prepare(args.train, args.norm, feature_fids,
                              must_rel, missing_zero=args.missingZero,
                              sparse=True, want_descs=bool(args.qrel))
        except RankLibError as e:
            log(f"[-sparse] CSR split-grid loader not applicable ({e}); "
                f"using the dense pipeline")
            stream = stream_n = False
            if args.hparams:
                args.hparams.pop("_feature_mask", None)
            train = _prepare(args.train, args.norm, feature_fids,
                             must_rel, missing_zero=args.missingZero,
                             qrel=args.qrel)
            # The dense `elif has_tts` arm below is unreachable (the outer
            # `if` matched), so split HERE or the test carve-out silently
            # trains (review finding, round 5). -tvs needs no rescue: the
            # later `elif validation is None and args.tvs` arm catches it.
            if has_tts:
                train, split_test = split_tvs(train, tts)
                log(f"Train-test split: {len(train.queries)} / "
                    f"{len(split_test.queries)} queries")
        else:
            if args.qrel:
                apply_qrel(csr_ds, args.qrel)
            if args.hparams:
                # the CSR path zeroes unlisted feature columns itself
                args.hparams.pop("_feature_mask", None)
            tc = args.tc if args.tc is not None else 256
            tr_c, held_c = split_tvs(csr_ds,
                                     tts if has_tts else args.tvs)
            train = binned_from_csr(tr_c, n_threshold=tc)
            held_b = binned_from_csr(held_c, thresholds=train.thresholds)
            if has_tts:
                split_test = held_b
                log(f"Train-test split: {len(train.queries)} / "
                    f"{len(split_test.queries)} queries")
            else:
                validation = held_b
    elif has_tts:
        # -tts: carve the test set out of the training file; it overrides
        # -tvs and an explicit -test file (ref: Evaluator -tts precedence)
        train, split_test = split_tvs(train, tts)
        log(f"Train-test split: {len(train.queries)} / "
            f"{len(split_test.queries)} queries")
    if args.validate:
        if stream_n:
            validation = _read_csr_norm_binned(
                args.validate, args, must_rel, feature_fids,
                n_features=train.n_features, thresholds=train.thresholds)
            if args.qrel:
                apply_qrel(validation, args.qrel)
        elif stream:
            from ranklib_tpu.data.binned import read_letor_binned
            validation = read_letor_binned(
                args.validate, thresholds=train.thresholds,
                must_have_rel_doc=must_rel, n_features=train.n_features,
                missing_zero=args.missingZero,
                want_descs=bool(args.qrel))
            if args.qrel:
                apply_qrel(validation, args.qrel)
        elif csr:
            # single-site CSR preparation (read→width→qrel→subset→norm):
            # _prepare's sparse branch
            validation = _prepare(args.validate, args.norm, feature_fids,
                                  must_rel, n_features=train.n_features,
                                  missing_zero=args.missingZero,
                                  sparse=True, qrel=args.qrel)
        else:
            validation = _prepare(args.validate, args.norm, feature_fids,
                                  must_rel, missing_zero=args.missingZero,
                                  n_features=train.n_features,
                                  qrel=args.qrel)
    elif (validation is None and args.tvs and args.tvs > 0
          and not has_tts):
        train, validation = split_tvs(train, args.tvs)
    ranker = train_ranker(args.ranker, train, train_scorer, validation,
                          args.hparams, n_dp=getattr(args, "dp", 0),
                          profile_dir=getattr(args, "profile", None))
    m_train, _ = score_dataset(train_scorer, train, ranker.eval_dataset(train))
    result(f"{train_scorer.name} on training data: {m_train:.4f}")
    if validation is not None:
        m_val, _ = score_dataset(train_scorer, validation,
                                 ranker.eval_dataset(validation))
        result(f"{train_scorer.name} on validation data: {m_val:.4f}")
    if args.test or split_test is not None:
        if split_test is not None:
            test = split_test
        elif stream_n:
            test = _read_csr_norm_binned(
                args.test, args, False, feature_fids,
                n_features=train.n_features, thresholds=train.thresholds)
            if args.qrel:
                apply_qrel(test, args.qrel)
        elif stream:
            from ranklib_tpu.data.binned import read_letor_binned
            test = read_letor_binned(
                args.test, thresholds=train.thresholds,
                n_features=train.n_features,
                missing_zero=args.missingZero,
                want_descs=bool(args.qrel))
            if args.qrel:
                apply_qrel(test, args.qrel)
        elif csr:
            test = _prepare(args.test, args.norm, feature_fids, False,
                            n_features=train.n_features,
                            missing_zero=args.missingZero, sparse=True,
                            qrel=args.qrel)
        else:
            test = _prepare(args.test, args.norm, feature_fids, False,
                            n_features=train.n_features, qrel=args.qrel,
                            missing_zero=args.missingZero)
        m_test, per_q = score_dataset(test_scorer, test, ranker.eval_dataset(test))
        result(f"{test_scorer.name} on test data: {m_test:.4f}")
        if args.idv:
            write_idv(args.idv, test_scorer, test, per_q)
    if args.save:
        ranker.save(args.save)
    return ranker


def evaluate_kcv(args) -> None:
    """k-fold cross validation (ref flow 3.2: -kcv, -kcvmd, -kcvmn)."""
    feature_fids = read_feature_file(args.feature) if args.feature else None
    train_scorer = create_scorer(args.metric2t, gmax=args.gmax)
    test_scorer = (
        create_scorer(args.metric2T, gmax=args.gmax)
        if args.metric2T else train_scorer
    )
    fold_binning = False
    if _try_stream(args) or _try_stream_norm(args):
        # tree-ranker kcv with -sparse: the file lands in host CSR
        # (memory ~ nnz; -norm applies lazily) and EACH FOLD bins its own
        # training rows via the chunked capped-unique merge
        # (data.binned.binned_from_csr) — per-fold threshold grids
        # exactly like the dense pipeline / the reference's per-fold
        # ranker init (ref: features/FeatureManager.java:~200 prepareCV +
        # learning/tree/LambdaMART.java:~40). Validation/test bin with
        # their fold's TRAINING grid. RANKLIB_TPU_KCV_SHARED_GRID=1
        # restores the round-3 fast path (bin the whole file once,
        # folds subset bin rows — exact only when every feature has
        # <= -tc distinct values).
        shared = os.environ.get("RANKLIB_TPU_KCV_SHARED_GRID") == "1"
        shared_mask = False
        sparse_loaded = False
        try:
            if shared and not args.norm:
                from ranklib_tpu.data.binned import read_letor_binned
                ds = read_letor_binned(
                    args.train, n_threshold=args.tc if args.tc is not None
                    else 256, must_have_rel_doc=train_scorer.needs_rel,
                    missing_zero=args.missingZero,
                    want_descs=bool(args.qrel))
                shared_mask = True
            elif shared:
                ds = _read_csr_norm_binned(args.train, args,
                                           train_scorer.needs_rel,
                                           feature_fids)
            else:
                ds = _prepare(args.train, args.norm, feature_fids,
                              train_scorer.needs_rel,
                              missing_zero=args.missingZero, sparse=True,
                              want_descs=bool(args.qrel))
                fold_binning = True
            sparse_loaded = True
        except RankLibError as e:
            log(f"[-sparse] sparse kcv loader not applicable ({e}); "
                f"using the dense pipeline")
            fold_binning = False
            ds = _prepare(args.train, args.norm, feature_fids,
                          train_scorer.needs_rel, qrel=args.qrel,
                          missing_zero=args.missingZero)
        if sparse_loaded:
            # qrel outside the fallback try on EVERY sparse branch: a
            # qrel problem is a real error, not a loader signal
            if args.qrel:
                apply_qrel(ds, args.qrel)
            if shared_mask and feature_fids is not None:
                args.hparams = dict(args.hparams or {})
                args.hparams["_feature_mask"] = feature_mask_from_fids(
                    feature_fids, ds.n_features)
    else:
        ds = _prepare(args.train, args.norm, feature_fids,
                      train_scorer.needs_rel, qrel=args.qrel,
                      missing_zero=args.missingZero,
                      # CSR folds only for rankers whose fit consumes CSR
                      sparse=args.sparse and _try_csr(args))
    splits = prepare_cv(ds, args.kcv, args.tvs if args.tvs else -1.0,
                        lazy=True)   # one fold's copies live at a time
    if fold_binning:
        from ranklib_tpu.data.binned import binned_from_csr

        tc = args.tc if args.tc is not None else 256

        def _bin_folds(gen):
            for tr, va, te in gen:
                tr_b = binned_from_csr(tr, n_threshold=tc)
                yield (tr_b,
                       binned_from_csr(va, thresholds=tr_b.thresholds)
                       if va is not None else None,
                       binned_from_csr(te, thresholds=tr_b.thresholds))

        splits = _bin_folds(splits)
    scores_train, scores_test = [], []
    for fold, (tr, va, te) in enumerate(splits):
        log("")
        log(f"Fold {fold + 1} / {args.kcv}...")
        # -profile with -kcv: one trace dir per fold (a single shared dir
        # would overwrite; silently dropping the flag looked like a
        # broken profiler — review finding)
        profile = getattr(args, "profile", None)
        ranker = train_ranker(args.ranker, tr, train_scorer, va, args.hparams,
                              n_dp=getattr(args, "dp", 0),
                              profile_dir=(os.path.join(
                                  profile, f"fold{fold + 1}")
                                  if profile else None))
        m_tr, _ = score_dataset(train_scorer, tr, ranker.eval_dataset(tr))
        m_te, _ = score_dataset(test_scorer, te, ranker.eval_dataset(te))
        scores_train.append(m_tr)
        scores_test.append(m_te)
        if args.kcvmd:
            os.makedirs(args.kcvmd, exist_ok=True)
            name = args.kcvmn or "model"
            ranker.save(os.path.join(args.kcvmd, f"f{fold + 1}.{name}"))
    result("")
    result("Summary:")
    result(f"{'Fold':<8}| {train_scorer.name + ' (train)':<16}| "
           f"{test_scorer.name + ' (test)':<16}")
    for i, (a, b) in enumerate(zip(scores_train, scores_test)):
        result(f"Fold {i + 1:<3}| {a:<16.4f}| {b:<16.4f}")
    result(f"{'Avg.':<8}| {np.mean(scores_train):<16.4f}| "
        f"{np.mean(scores_test):<16.4f}")


def evaluate_test_only(args) -> None:
    """Flow 3.3: -load model -test file -metric2T metric [-idv file]."""
    scorer = create_scorer(args.metric2T or args.metric2t, gmax=args.gmax)
    ranker = load_ranker_file(args.load)
    feature_fids = read_feature_file(args.feature) if args.feature else None
    test = _prepare(args.test, args.norm, feature_fids, False,
                    qrel=args.qrel, missing_zero=args.missingZero,
                    sparse=args.sparse)
    m, per_q = score_dataset(scorer, test, ranker.eval_dataset(test))
    result(f"{scorer.name} on test data: {m:.4f}")
    if args.idv:
        write_idv(args.idv, scorer, test, per_q)


def evaluate_rank(args) -> None:
    """Flow 3.3: -load model -rank file [-score out] [-indri out]."""
    ranker = load_ranker_file(args.load)
    feature_fids = read_feature_file(args.feature) if args.feature else None
    data = _prepare(args.rank, args.norm, feature_fids, False,
                    qrel=args.qrel, missing_zero=args.missingZero,
                    sparse=args.sparse,
                    want_descs=bool(args.indri))
    scores = ranker.eval_dataset(data)
    if args.score:
        write_score_file(args.score, data, scores)
    if args.indri:
        write_indri_rankings(args.indri, data, scores)
    if not args.score and not args.indri:
        # No implicit side-effect file: the reference's rank flow only
        # writes where asked. Print the reranking to stdout instead —
        # it IS the flow's result, so -silent must not swallow it.
        for q, s in zip(data.queries, scores):
            order = np.argsort(-np.asarray(s), kind="stable")
            result(f"{q.qid}\t" + " ".join(str(int(i)) for i in order))

