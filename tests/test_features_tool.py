"""FeatureManager standalone tool: shuffle + k-fold partition files
(reference: ciir.umass.edu.features.FeatureManager.main)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import synth_dataset, write_letor_text  # noqa: E402

from ranklib_tpu.data.letor import read_letor  # noqa: E402
from ranklib_tpu.features_tool import main, read_query_groups  # noqa: E402
from ranklib_tpu.utils.errors import RankLibError  # noqa: E402


@pytest.fixture()
def letor_file(tmp_path):
    ds = synth_dataset(n_queries=11, n_features=5, min_docs=2, max_docs=6,
                       seed=7, w_seed=3)
    p = tmp_path / "data.txt"
    write_letor_text(ds, p)
    return p


def _qids(path):
    return [qid for qid, _ in read_query_groups(str(path))]


def test_kfold_files(letor_file, tmp_path):
    out = tmp_path / "folds"
    assert main(["-input", str(letor_file), "-output", str(out),
                 "-k", "3"]) == 0
    all_qids = _qids(letor_file)
    for f in range(1, 4):
        train = _qids(out / f"f{f}.train.data.txt")
        test = _qids(out / f"f{f}.test.data.txt")
        # round-robin: query i tests in fold i % k (matches prepare_cv)
        assert test == all_qids[f - 1::3]
        assert sorted(train + test) == sorted(all_qids)
        assert not set(train) & set(test)
        # fold files are themselves valid LETOR inputs
        ds = read_letor(str(out / f"f{f}.train.data.txt"), quiet=True)
        assert ds.n_features == 5


def test_kfold_lines_verbatim(letor_file, tmp_path):
    out = tmp_path / "folds"
    main(["-input", str(letor_file), "-output", str(out), "-k", "2"])
    src_lines = set(letor_file.read_text().splitlines())
    got = set((out / "f1.train.data.txt").read_text().splitlines())
    got |= set((out / "f1.test.data.txt").read_text().splitlines())
    assert got == src_lines


def test_kfold_tvs_validation(letor_file, tmp_path):
    out = tmp_path / "folds"
    assert main(["-input", str(letor_file), "-output", str(out),
                 "-k", "3", "-tvs", "0.7"]) == 0
    all_qids = set(_qids(letor_file))
    for f in range(1, 4):
        train = _qids(out / f"f{f}.train.data.txt")
        valid = _qids(out / f"f{f}.validation.data.txt")
        test = _qids(out / f"f{f}.test.data.txt")
        assert valid and train
        assert set(train) | set(valid) | set(test) == all_qids
        assert len(train) == int((len(train) + len(valid)) * 0.7)


def test_shuffle_preserves_groups(letor_file, tmp_path):
    out = tmp_path / "sh"
    assert main(["-input", str(letor_file), "-output", str(out),
                 "-shuffle", "-seed", "5"]) == 0
    shuffled = out / "data.txt.shuffled"
    src = dict(read_query_groups(str(letor_file)))
    got = dict(read_query_groups(str(shuffled)))
    assert got == src                       # same groups, lines verbatim
    # deterministic under a seed; actually permuted for this fixture
    main(["-input", str(letor_file), "-output", str(tmp_path / "sh2"),
          "-shuffle", "-seed", "5"])
    assert (tmp_path / "sh2" / "data.txt.shuffled").read_text() \
        == shuffled.read_text()
    assert _qids(shuffled) != _qids(letor_file)


def test_shuffle_then_partition(letor_file, tmp_path):
    out = tmp_path / "both"
    assert main(["-input", str(letor_file), "-output", str(out),
                 "-shuffle", "-seed", "1", "-k", "2"]) == 0
    # folds are cut from the SHUFFLED order and named after the shuffled file
    shuffled_qids = _qids(out / "data.txt.shuffled")
    test1 = _qids(out / "f1.test.data.txt.shuffled")
    assert test1 == shuffled_qids[0::2]


def test_errors(letor_file, tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("1 nofid:3 1:0.5\n")
    with pytest.raises(RankLibError):
        read_query_groups(str(bad))
    # too many folds → error exit code, no crash
    assert main(["-input", str(letor_file), "-output", str(tmp_path / "e"),
                 "-k", "99"]) == 1
    # nothing to do → argparse error
    with pytest.raises(SystemExit):
        main(["-input", str(letor_file), "-output", str(tmp_path / "e2")])
