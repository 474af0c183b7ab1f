"""Data layer: LETOR parsing, bucketing, normalizers, CV splits."""

import numpy as np
import pytest

from ranklib_tpu.data.cv import prepare_cv
from ranklib_tpu.data.dataset import bucketize, flatten, padded_size
from ranklib_tpu.data.letor import read_letor
from ranklib_tpu.data.normalize import get_normalizer, normalize_dataset
from ranklib_tpu.utils.errors import RankLibError

from fixtures import synth_dataset, write_letor_text

LETOR_SAMPLE = """\
2 qid:1 1:0.5 3:1.0 # docA
0 qid:1 1:0.1 2:0.2 # docB
1 qid:2 2:0.9
0 qid:2 1:0.3 3:0.4 # docD
0 qid:2 1:0.0
"""


def test_parse_basic(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text(LETOR_SAMPLE)
    ds = read_letor(str(p), quiet=True)
    assert len(ds.queries) == 2
    assert ds.n_features == 3
    q1, q2 = ds.queries
    assert q1.qid == "1" and q1.n == 2
    assert q2.qid == "2" and q2.n == 3
    np.testing.assert_allclose(q1.feats[0], [0.5, 0.0, 1.0])
    np.testing.assert_allclose(q1.labels, [2, 0])
    assert q1.descs[0] == "# docA"
    # missing fids read as zero
    np.testing.assert_allclose(q2.feats[0], [0.0, 0.9, 0.0])


def test_parse_gzip(tmp_path):
    import gzip

    p = tmp_path / "train.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write(LETOR_SAMPLE)
    ds = read_letor(str(p), quiet=True)
    assert ds.n_docs == 5


def test_must_have_rel_doc(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("0 qid:1 1:1\n0 qid:1 1:2\n1 qid:2 1:3\n")
    ds = read_letor(str(p), must_have_rel_doc=True, quiet=True)
    assert len(ds.queries) == 1 and ds.queries[0].qid == "2"


def test_parse_errors(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1 1:0.5\n")  # no qid
    with pytest.raises(RankLibError):
        read_letor(str(p), quiet=True)


def test_roundtrip(tmp_path):
    ds = synth_dataset(n_queries=5, n_features=7, seed=3)
    p = tmp_path / "rt.txt"
    write_letor_text(ds, p)
    ds2 = read_letor(str(p), quiet=True)
    assert len(ds2.queries) == len(ds.queries)
    for a, b in zip(ds.queries, ds2.queries):
        np.testing.assert_allclose(a.labels, b.labels)
        np.testing.assert_allclose(a.feats, b.feats, rtol=1e-5)


def test_padded_size_and_buckets():
    assert padded_size(1) == 8
    assert padded_size(8) == 8
    assert padded_size(9) == 16
    assert padded_size(1200) == 1280
    assert padded_size(1500) == 1536
    assert padded_size(5000) == 5120
    ds = synth_dataset(n_queries=30, min_docs=3, max_docs=100, seed=1)
    buckets = bucketize(ds)
    total = sum(b.B for b in buckets)
    assert total == 30
    for b in buckets:
        assert b.feats.shape == (b.B, b.D, ds.n_features)
        for row in range(b.B):
            n = int(b.n_docs[row])
            assert b.mask[row, :n].all() and not b.mask[row, n:].any()
            q = ds.queries[int(b.qidx[row])]
            np.testing.assert_allclose(b.labels[row, :n], q.labels)
            np.testing.assert_allclose(b.feats[row, :n], q.feats)


def test_flatten():
    ds = synth_dataset(n_queries=4, seed=2)
    feats, labels, qptr = flatten(ds)
    assert feats.shape[0] == labels.shape[0] == ds.n_docs
    assert qptr[0] == 0 and qptr[-1] == ds.n_docs
    q0 = ds.queries[0]
    np.testing.assert_allclose(feats[: q0.n], q0.feats)


def test_normalizers_per_query():
    feats = np.array([[1.0, -2.0], [3.0, 2.0]], np.float32)
    out = get_normalizer("sum")(feats)
    np.testing.assert_allclose(out[:, 0], [0.25, 0.75])
    np.testing.assert_allclose(out[:, 1], [-0.5, 0.5])
    out = get_normalizer("linear")(feats)
    np.testing.assert_allclose(out, [[0, 0], [1, 1]])
    out = get_normalizer("zscore")(feats)
    np.testing.assert_allclose(out.mean(axis=0), [0, 0], atol=1e-6)
    # degenerate feature (constant) → zeros / unchanged, never NaN
    const = np.ones((3, 1), np.float32)
    for name in ("sum", "zscore", "linear"):
        assert np.isfinite(get_normalizer(name)(const)).all()


def test_normalize_dataset_is_per_query():
    ds = synth_dataset(n_queries=3, seed=5)
    normalize_dataset(ds, "linear")
    for q in ds.queries:
        assert q.feats.min() >= 0.0 and q.feats.max() <= 1.0 + 1e-6


def test_prepare_cv_deterministic_round_robin():
    ds = synth_dataset(n_queries=10, seed=7)
    splits = prepare_cv(ds, 3)
    assert len(splits) == 3
    # every query appears in exactly one test fold
    seen = []
    for train, valid, test in splits:
        assert valid is None
        assert len(train.queries) + len(test.queries) == 10
        seen += [q.qid for q in test.queries]
    assert sorted(seen) == sorted(q.qid for q in ds.queries)
    # fold 0 test = queries 0, 3, 6, 9 (round-robin, no shuffle)
    assert [q.qid for q in splits[0][2].queries] == [
        ds.queries[i].qid for i in (0, 3, 6, 9)
    ]


def test_prepare_cv_with_tvs():
    ds = synth_dataset(n_queries=12, seed=8)
    splits = prepare_cv(ds, 3, tvs=0.75)
    for train, valid, test in splits:
        assert valid is not None
        assert len(train.queries) == 6 and len(valid.queries) == 2


def test_missing_zero_strict_semantics(tmp_path):
    """The reference errors on an unspecified fid unless -missingZero
    (ref: learning/DataPoint.java:~120). Both parsers must enforce it;
    with missing_zero=True the gap reads as 0."""
    import pytest

    from ranklib_tpu.data.letor import read_letor
    from ranklib_tpu.utils.errors import RankLibError

    sparse = tmp_path / "sparse.txt"
    sparse.write_text("2 qid:1 1:0.5 3:1.0\n"     # fid 2 missing
                      "0 qid:1 1:0.1 2:0.2 3:0.3\n")
    for use_native in (False, True):
        with pytest.raises(RankLibError, match="missingZero"):
            read_letor(str(sparse), quiet=True, use_native=use_native,
                       missing_zero=False)
        ds = read_letor(str(sparse), quiet=True, use_native=use_native,
                        missing_zero=True)
        assert ds.queries[0].feats[0, 1] == 0.0

    dense = tmp_path / "dense.txt"
    dense.write_text("2 qid:1 1:0.5 2:0.0 3:1.0\n"
                     "0 qid:1 1:0.1 2:0.2 3:0.3\n")
    for use_native in (False, True):
        ds = read_letor(str(dense), quiet=True, use_native=use_native,
                        missing_zero=False)
        assert ds.n_features == 3


def test_cli_missing_zero_flag(tmp_path):
    """-missingZero is real CLI surface: strict by default, permissive
    with the flag (train flow, LinearRegRank for speed)."""
    from ranklib_tpu.cli import main

    train = tmp_path / "train.txt"
    train.write_text("2 qid:1 1:0.9 2:0.8\n0 qid:1 1:0.1\n"
                     "1 qid:2 1:0.5 2:0.4\n0 qid:2 1:0.2 2:0.6\n")
    save = str(tmp_path / "m.txt")
    base = ["-train", str(train), "-ranker", "9",
            "-metric2t", "NDCG@10", "-save", save]
    assert main(base) == 1                 # strict default: error exit
    assert not (tmp_path / "m.txt").exists()
    assert main(base + ["-missingZero"]) == 0
    assert (tmp_path / "m.txt").exists()
