"""Randomization test + Analyzer (ref: stats/RandomPermutationTest.java,
eval/Analyzer.java)."""

import numpy as np
import pytest

from ranklib_tpu.analyzer import analyze, read_idv
from ranklib_tpu.stats.significance import randomization_test
from ranklib_tpu.utils.errors import RankLibError


def test_randomization_test_null_is_insignificant():
    rng = np.random.default_rng(0)
    base = rng.normal(0.5, 0.1, size=200)
    target = base + rng.normal(0, 0.05, size=200)   # no systematic shift
    p = randomization_test(base, target, 2000, seed=1)
    assert p > 0.05


def test_randomization_test_detects_real_shift():
    rng = np.random.default_rng(0)
    base = rng.normal(0.5, 0.05, size=100)
    target = base + 0.08 + rng.normal(0, 0.02, size=100)
    p = randomization_test(base, target, 2000, seed=1)
    assert p < 0.01


def test_randomization_test_identical_inputs():
    v = np.full(50, 0.3)
    assert randomization_test(v, v, 500) == pytest.approx(1.0)


def _write_idv(path, qvals, metric="NDCG@10"):
    with open(path, "w") as f:
        for q, v in qvals.items():
            f.write(f"{metric}   {q}   {v:.4f}\n")
        f.write(f"{metric}   all   {np.mean(list(qvals.values())):.4f}\n")


def test_read_idv_skips_all_row(tmp_path):
    p = tmp_path / "a.txt"
    _write_idv(p, {"1": 0.5, "2": 0.7})
    vals = read_idv(str(p))
    assert vals == {"1": 0.5, "2": 0.7}


def test_analyzer_end_to_end(tmp_path):
    rng = np.random.default_rng(3)
    qids = [str(i) for i in range(1, 61)]
    base = {q: float(rng.uniform(0.2, 0.6)) for q in qids}
    better = {q: min(1.0, base[q] + float(rng.uniform(0.05, 0.3)))
              for q in qids}
    same = {q: base[q] + float(rng.normal(0, 0.01)) for q in qids}
    d = tmp_path / "runs"
    d.mkdir()
    _write_idv(tmp_path / "base.txt", base)
    _write_idv(d / "better.txt", better)
    _write_idv(d / "same.txt", same)
    results = analyze(str(d), str(tmp_path / "base.txt"), 2000)
    by_name = {r["name"]: r for r in results}
    assert by_name["better.txt"]["p"] < 0.01
    assert by_name["better.txt"]["win"] == 60
    assert by_name["same.txt"]["p"] > 0.05


def test_analyzer_mismatched_queries_raises(tmp_path):
    _write_idv(tmp_path / "base.txt", {"1": 0.5, "2": 0.6})
    d = tmp_path / "runs"
    d.mkdir()
    _write_idv(d / "run.txt", {"1": 0.5})
    with pytest.raises(RankLibError):
        analyze(str(d), str(tmp_path / "base.txt"), 100)


def test_analyzer_skips_non_numeric_stray_file(tmp_path, capsys):
    """A stray 3-token text file in the -all directory is SKIPPED with
    the designed message instead of crashing the whole -ana run with an
    uncaught ValueError (review finding, round 5)."""
    from ranklib_tpu.analyzer import analyze

    base = tmp_path / "base.idv"
    base.write_text("NDCG@10   q1   0.5\nNDCG@10   all   0.5\n")
    d = tmp_path / "runs"
    d.mkdir()
    (d / "run1.idv").write_text("NDCG@10   q1   0.7\nNDCG@10   all   0.7\n")
    (d / "README.txt").write_text("foo bar baz\n")
    res = analyze(str(d), str(base), n_permutations=100)
    assert [r["name"] for r in res] == ["run1.idv"]
