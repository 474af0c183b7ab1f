"""Streaming parse→bin loader (-sparse): exact parity with the dense
pipeline, sparse-file semantics, strict -missingZero, CLI flow.

The streaming path (data.binned + native letor_value_stats/fill_binned)
must be bit-identical to parse-dense → compute_thresholds → bin_features:
same grids, same bins, same trained model text.
"""

import numpy as np
import pytest

from ranklib_tpu.data.binned import BinnedDataset, read_letor_binned, split_binned
from ranklib_tpu.data.dataset import flatten
from ranklib_tpu.data.letor import read_letor
from ranklib_tpu.gbdt.binning import bin_features, compute_thresholds
from ranklib_tpu.metrics.base import create_scorer
from ranklib_tpu.models.gbdt import MART, LambdaMART
from ranklib_tpu.native.loader import native_available
from ranklib_tpu.utils.errors import RankLibError
from tests.fixtures import synth_dataset, write_letor_text

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native parser unavailable (no g++)")


def _write_sparse(ds, path, rng, drop=0.5):
    """LETOR text with ~drop of the (doc, fid) pairs omitted (they read as
    0 under missing-zero) — a genuinely sparse file."""
    with open(path, "w") as f:
        for q in ds.queries:
            for i in range(q.n):
                keep = rng.random(q.feats.shape[1]) >= drop
                toks = " ".join(
                    f"{j + 1}:{q.feats[i, j]:.6g}"
                    for j in range(q.feats.shape[1]) if keep[j])
                f.write(f"{int(q.labels[i])} qid:{q.qid} {toks}\n")


@pytest.fixture(scope="module")
def sparse_file(tmp_path_factory):
    rng = np.random.default_rng(7)
    ds = synth_dataset(n_queries=20, n_features=9, min_docs=5, max_docs=18,
                       gmax=2, seed=3)
    path = tmp_path_factory.mktemp("stream") / "sparse.txt"
    _write_sparse(ds, path, rng)
    return str(path)


def test_stream_matches_dense_bins(sparse_file):
    dense = read_letor(sparse_file, missing_zero=True)
    feats, labels, qptr = flatten(dense)
    thr, _ = compute_thresholds(feats, 256)
    bins = bin_features(feats, thr)

    bd = read_letor_binned(sparse_file, n_threshold=256)
    assert isinstance(bd, BinnedDataset)
    assert bd.n_features == dense.n_features
    np.testing.assert_array_equal(bd.thresholds, thr)
    np.testing.assert_array_equal(np.asarray(bd.binned, np.int32), bins)
    lab2 = np.concatenate([q.labels for q in bd.queries])
    np.testing.assert_array_equal(lab2, labels)
    assert [q.qid for q in bd.queries] == [q.qid for q in dense.queries]
    assert all(q.feats is None for q in bd.queries)


def test_stream_grid_parity_negative_and_ties(tmp_path):
    """Negative values, -0.0, constant features, and a feature that is
    never specified all follow the dense pipeline's decisions."""
    path = tmp_path / "edge.txt"
    lines = [
        "2 qid:1 1:-1.5 2:3 4:7",
        "1 qid:1 1:-0.0 2:3",
        "0 qid:1 2:3 4:-2",
        "1 qid:2 1:2.25 4:7",
        "0 qid:2 1:-1.5",
    ]
    path.write_text("\n".join(lines) + "\n")
    dense = read_letor(str(path), missing_zero=True)
    feats, _, _ = flatten(dense)
    thr, _ = compute_thresholds(feats, 256)
    bins = bin_features(feats, thr)
    bd = read_letor_binned(str(path), n_threshold=256)
    np.testing.assert_array_equal(bd.thresholds, thr)
    np.testing.assert_array_equal(np.asarray(bd.binned, np.int32), bins)


def test_stream_grid_path_when_many_uniques(tmp_path):
    """> tc uniques → the evenly spaced min/max grid, identical to dense."""
    rng = np.random.default_rng(11)
    path = tmp_path / "many.txt"
    with open(path, "w") as f:
        for i in range(300):
            f.write(f"{i % 3} qid:{i // 30} 1:{rng.random():.9g} "
                    f"2:{i}\n")
    dense = read_letor(str(path), missing_zero=True)
    feats, _, _ = flatten(dense)
    thr, _ = compute_thresholds(feats, 16)
    bins = bin_features(feats, thr)
    bd = read_letor_binned(str(path), n_threshold=16)
    np.testing.assert_array_equal(bd.thresholds, thr)
    np.testing.assert_array_equal(np.asarray(bd.binned, np.int32), bins)


def test_stream_trained_model_identical(sparse_file):
    """LambdaMART trained on the streamed BinnedDataset emits the exact
    model text of the dense pipeline (same trees, thresholds, outputs)."""
    scorer = create_scorer("NDCG@10")
    dense = read_letor(sparse_file, missing_zero=True, quiet=True)
    r1 = LambdaMART(n_trees=8, n_leaves=4)
    r1.fit(dense, scorer)
    bd = read_letor_binned(sparse_file, quiet=True)
    r2 = LambdaMART(n_trees=8, n_leaves=4)
    r2.fit(bd, scorer)
    assert r1.model_str() == r2.model_str()
    # bin-space evaluation returns the dense path's scores exactly
    s1 = r1.eval_dataset(dense)
    s2 = r2.eval_dataset(bd)
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_stream_mart_and_validation_split(sparse_file):
    scorer = create_scorer("NDCG@10")
    dense = read_letor(sparse_file, missing_zero=True, quiet=True)
    from ranklib_tpu.data.cv import split_tvs
    dtr, dva = split_tvs(dense, 0.7)
    r1 = MART(n_trees=6, n_leaves=4, early_stop=3)
    r1.fit(dtr, scorer, validation=dva)

    bd = read_letor_binned(sparse_file, quiet=True)
    btr, bva = split_tvs(bd, 0.7)
    assert isinstance(btr, BinnedDataset) and btr.binned.shape[0] == sum(
        q.n for q in btr.queries)
    r2 = MART(n_trees=6, n_leaves=4, early_stop=3)
    r2.fit(btr, scorer, validation=bva)
    assert r1.model_str() == r2.model_str()


def test_stream_missing_zero_strict(tmp_path):
    path = tmp_path / "gap.txt"
    path.write_text("1 qid:1 1:1 2:2\n0 qid:1 1:3\n")
    with pytest.raises(RankLibError, match="missingZero"):
        read_letor_binned(str(path), missing_zero=False)
    bd = read_letor_binned(str(path), missing_zero=True, quiet=True)
    assert bd.binned.shape == (2, 2)


def test_stream_must_have_rel_drops_rows(tmp_path):
    """With a LOCAL grid, rel-doc drops would skew thresholds vs the
    dense drop-first pipeline → loader-not-applicable (callers fall back
    dense). With a GIVEN grid (validation/test reads) dropping is safe
    and rows slice out."""
    path = tmp_path / "rel.txt"
    path.write_text("0 qid:1 1:1\n0 qid:1 1:2\n"
                    "1 qid:2 1:3\n0 qid:2 1:4\n")
    with pytest.raises(RankLibError, match="dense pipeline"):
        read_letor_binned(str(path), must_have_rel_doc=True, quiet=True)
    grid = read_letor_binned(str(path), quiet=True).thresholds
    bd = read_letor_binned(str(path), must_have_rel_doc=True,
                           thresholds=grid, quiet=True)
    assert len(bd.queries) == 1 and bd.queries[0].qid == "2"
    assert bd.binned.shape[0] == 2


def test_stream_warm_start_matches_dense(sparse_file):
    """-resume on a streamed dataset: bin-space scoring of the prior
    ensemble must reproduce the dense warm start exactly."""
    scorer = create_scorer("NDCG@10")
    dense = read_letor(sparse_file, missing_zero=True, quiet=True)
    full = LambdaMART(n_trees=10, n_leaves=4)
    full.fit(dense, scorer)

    half = LambdaMART(n_trees=5, n_leaves=4)
    half.fit(dense, scorer)
    resumed_dense = LambdaMART(n_trees=10, n_leaves=4)
    resumed_dense.load_str(half.model_str())
    resumed_dense.n_trees = 10
    resumed_dense.fit(dense, scorer)

    bd = read_letor_binned(sparse_file, quiet=True)
    resumed_stream = LambdaMART(n_trees=10, n_leaves=4)
    resumed_stream.load_str(half.model_str())
    resumed_stream.n_trees = 10
    resumed_stream.fit(bd, scorer)
    assert resumed_stream.model_str() == resumed_dense.model_str()


def test_cli_sparse_flow(tmp_path, sparse_file):
    """-sparse end-to-end through the CLI: train, test, save."""
    from ranklib_tpu import cli
    model = tmp_path / "m.txt"
    rc = cli.main(["-train", sparse_file, "-ranker", "6", "-tree", "4",
                   "-leaf", "3", "-metric2t", "NDCG@10", "-sparse",
                   "-missingZero", "-tts", "0.7", "-save", str(model),
                   "-silent"])
    assert rc == 0
    text = model.read_text()
    assert text.startswith("## LambdaMART")
    # identical model without -sparse (dense pipeline)
    model2 = tmp_path / "m2.txt"
    rc = cli.main(["-train", sparse_file, "-ranker", "6", "-tree", "4",
                   "-leaf", "3", "-metric2t", "NDCG@10", "-missingZero",
                   "-tts", "0.7", "-save", str(model2), "-silent"])
    assert rc == 0
    assert model2.read_text() == text


def test_streamed_binned_reads_gzip(tmp_path):
    """.gz inputs stream through a temp decompression (parity with the
    plain file, byte-identical bins)."""
    import gzip

    from ranklib_tpu.data.binned import read_letor_binned
    from tests.fixtures import synth_dataset, write_letor_text

    plain = str(tmp_path / "t.txt")
    write_letor_text(synth_dataset(n_queries=6, n_features=5, seed=9), plain)
    gz = plain + ".gz"
    with open(plain, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    a = read_letor_binned(plain, n_threshold=16, quiet=True)
    b = read_letor_binned(gz, n_threshold=16, quiet=True)
    np.testing.assert_array_equal(a.binned, b.binned)
    np.testing.assert_array_equal(a.thresholds, b.thresholds)
    assert [q.qid for q in a.queries] == [q.qid for q in b.queries]


def test_stream_rf_model_identical(sparse_file):
    """Random Forests (-ranker 8) on the streamed BinnedDataset: byte-
    equal model vs the dense pipeline for BOTH -rtype 0 (batched bags)
    and -rtype 6 (sequential weighted bags), plus bin-space eval parity
    (the review gap: -ranker 8 -sparse silently fell back dense)."""
    from ranklib_tpu.models.rf import RFRanker

    scorer = create_scorer("NDCG@10")
    dense = read_letor(sparse_file, missing_zero=True, quiet=True)
    bd = read_letor_binned(sparse_file, quiet=True)
    for rtype in (0, 6):
        r1 = RFRanker(n_bags=3, n_trees=2, n_leaves=3, ranker_type=rtype)
        r1.fit(dense, scorer)
        r2 = RFRanker(n_bags=3, n_trees=2, n_leaves=3, ranker_type=rtype)
        r2.fit(bd, scorer)
        assert r1.model_str() == r2.model_str()
        s1 = r1.eval_dataset(dense)
        s2 = r2.eval_dataset(bd)
        for a, b in zip(s1, s2):
            np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_cli_sparse_rf_flow(tmp_path, sparse_file):
    """-ranker 8 -sparse end-to-end through the CLI: identical model to
    the dense pipeline (streamed loader, no dense fallback)."""
    from ranklib_tpu import cli

    model = tmp_path / "m.txt"
    rc = cli.main(["-train", sparse_file, "-ranker", "8", "-bag", "3",
                   "-tree", "2", "-leaf", "3", "-metric2t", "NDCG@10",
                   "-sparse", "-missingZero", "-save", str(model),
                   "-silent"])
    assert rc == 0
    text = model.read_text()
    assert text.startswith("## Random Forests")
    model2 = tmp_path / "m2.txt"
    rc = cli.main(["-train", sparse_file, "-ranker", "8", "-bag", "3",
                   "-tree", "2", "-leaf", "3", "-metric2t", "NDCG@10",
                   "-missingZero", "-save", str(model2), "-silent"])
    assert rc == 0
    assert model2.read_text() == text


def test_tts_sparse_grid_matches_dense(tmp_path, sparse_file):
    """-tts under -sparse: the dense pipeline computes threshold grids
    from the TRAIN SUBSET, so the streamed path must too (review
    finding: split_binned kept the whole-file grid). -tc 8 forces
    evenly spaced min/max grids, which diverge immediately if the
    held-out rows leak into the stats."""
    from ranklib_tpu import cli

    outs = {}
    for tag, extra in (("dense", []), ("sparse", ["-sparse"])):
        model = tmp_path / f"tts_{tag}.txt"
        rc = cli.main(["-train", sparse_file, "-ranker", "6", "-tree",
                       "4", "-leaf", "3", "-tc", "8", "-metric2t",
                       "NDCG@10", "-missingZero", "-tts", "0.7",
                       "-save", str(model), "-silent", *extra])
        assert rc == 0
        outs[tag] = model.read_text()
    assert outs["dense"] == outs["sparse"]


def test_tvs_sparse_grid_matches_dense(tmp_path, sparse_file):
    """-tvs (train-validation carve-out) under -sparse: same per-subset
    grid rule; validation scores/early-stop ride the train grid."""
    from ranklib_tpu import cli

    outs = {}
    for tag, extra in (("dense", []), ("sparse", ["-sparse"])):
        model = tmp_path / f"tvs_{tag}.txt"
        rc = cli.main(["-train", sparse_file, "-ranker", "6", "-tree",
                       "4", "-leaf", "3", "-tc", "8", "-metric2t",
                       "NDCG@10", "-missingZero", "-tvs", "0.7",
                       "-save", str(model), "-silent", *extra])
        assert rc == 0
        outs[tag] = model.read_text()
    assert outs["dense"] == outs["sparse"]


def test_sparse_relddrop_grid_matches_dense(tmp_path):
    """A no-relevant-doc query under a needs-rel metric (MAP): the dense
    pipeline drops it BEFORE computing grids; the streamed loader's
    file-level grid would include its values, so it must bounce to the
    dense pipeline and stay byte-identical (review finding)."""
    from ranklib_tpu import cli

    rng = np.random.default_rng(11)
    ds = synth_dataset(n_queries=12, n_features=5, min_docs=5,
                       max_docs=10, gmax=2, seed=5)
    for i in range(ds.queries[3].n):       # one query with no rel docs
        ds.queries[3].labels[i] = 0.0
    # give the dropped query an extreme value so the file-level grid
    # provably differs from the kept-rows grid
    ds.queries[3].feats[0, 2] = 99.0
    path = tmp_path / "relcase.txt"
    _write_sparse(ds, str(path), rng, drop=0.3)
    outs = {}
    for tag, extra in (("dense", []), ("sparse", ["-sparse"])):
        model = tmp_path / f"rel_{tag}.txt"
        rc = cli.main(["-train", str(path), "-ranker", "6", "-tree", "3",
                       "-leaf", "3", "-tc", "4", "-metric2t", "MAP",
                       "-missingZero", "-save", str(model), "-silent",
                       *extra])
        assert rc == 0
        outs[tag] = model.read_text()
    assert outs["dense"] == outs["sparse"]


def test_stream_grid_duplicate_fids_last_wins(tmp_path):
    """Duplicate fid:val pairs on one line: the dense parser overwrites
    (last wins), so the streamed value-stats pass must not let the
    overwritten value into the unique set / min-max, and coverage must
    count the line once so the implicit-zero fold still fires (review
    finding, round 5: '1:5.0 1:7.0' diverged the streamed grid from
    dense)."""
    path = tmp_path / "dup.txt"
    lines = [
        "1 qid:1 1:5.0 1:7.0 2:1.0",
        "0 qid:1 2:3.0",
        "2 qid:2 1:2.0 2:4.0 2:-1.0",
        "0 qid:2 1:2.0",
    ]
    path.write_text("\n".join(lines) + "\n")
    dense = read_letor(str(path), missing_zero=True)
    feats, _, _ = flatten(dense)
    thr, _ = compute_thresholds(feats, 256)
    bins = bin_features(feats, thr)
    bd = read_letor_binned(str(path), n_threshold=256)
    np.testing.assert_array_equal(bd.thresholds, thr)
    np.testing.assert_array_equal(np.asarray(bd.binned, np.int32), bins)
