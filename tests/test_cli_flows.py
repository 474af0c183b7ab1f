"""CLI dispatch tests for the remaining flows: -ana, -combine, -indri,
-qrel, -eventlog (ref: eval/Evaluator.java argv loop + Analyzer/Combiner
mains)."""

import json
import os

import numpy as np
import pytest

from ranklib_tpu.cli import main
from tests.fixtures import synth_dataset, write_letor_text


@pytest.fixture()
def letor(tmp_path):
    train = synth_dataset(n_queries=12, n_features=6, seed=31, signal=3.0)
    test = synth_dataset(n_queries=8, n_features=6, seed=32, w_seed=31,
                         signal=3.0)
    tr = tmp_path / "train.txt"
    te = tmp_path / "test.txt"
    write_letor_text(train, tr)
    write_letor_text(test, te)
    return str(tr), str(te)


def test_cli_idv_then_analyzer(tmp_path, letor, capsys):
    tr, te = letor
    d = tmp_path / "runs"
    d.mkdir()
    assert main(["-train", tr, "-ranker", "4", "-r", "1", "-metric2t",
                 "NDCG@10", "-test", te, "-idv", str(d / "ca.txt")]) == 0
    assert main(["-train", tr, "-ranker", "9", "-metric2t", "NDCG@10",
                 "-test", te, "-idv", str(tmp_path / "base.txt")]) == 0
    assert main(["-ana", "-all", str(d), "-base", str(tmp_path / "base.txt"),
                 "-np", "500"]) == 0
    out = capsys.readouterr().out
    assert "Overall comparison" in out and "p-value" in out


def test_cli_combine(tmp_path, letor):
    tr, te = letor
    d = tmp_path / "bags"
    d.mkdir()
    for i in range(2):
        assert main(["-train", tr, "-ranker", "8", "-bag", "2", "-tree", "1",
                     "-leaf", "4", "-metric2t", "NDCG@10",
                     "-save", str(d / f"b{i}.txt")]) == 0
    out = tmp_path / "all.txt"
    assert main(["-combine", str(d), "-o", str(out)]) == 0
    text = out.read_text()
    assert text.startswith("## Random Forests")
    assert text.count("<ensemble>") == 4
    assert main(["-load", str(out), "-test", te, "-metric2T", "NDCG@10"]) == 0


def test_cli_rank_indri_and_score(tmp_path, letor):
    tr, te = letor
    model = tmp_path / "m.txt"
    assert main(["-train", tr, "-ranker", "9", "-metric2t", "NDCG@10",
                 "-save", str(model)]) == 0
    sc = tmp_path / "sc.txt"
    ind = tmp_path / "indri.txt"
    assert main(["-load", str(model), "-rank", te, "-score", str(sc),
                 "-indri", str(ind)]) == 0
    lines = sc.read_text().strip().splitlines()
    assert len(lines) > 0 and len(lines[0].split("\t")) == 3
    iline = ind.read_text().splitlines()[0].split()
    assert iline[1] == "Q0" and iline[-1] == "indri"


def test_cli_rank_without_outputs_writes_no_file(tmp_path, letor, capsys,
                                                 monkeypatch):
    """-rank with neither -score nor -indri prints the reranking and must
    NOT silently create a file (the reference's rank flow only writes
    where asked)."""
    tr, te = letor
    model = tmp_path / "m.txt"
    assert main(["-train", tr, "-ranker", "9", "-metric2t", "NDCG@10",
                 "-save", str(model)]) == 0
    monkeypatch.chdir(tmp_path)
    before = set(os.listdir(tmp_path))
    capsys.readouterr()
    assert main(["-load", str(model), "-rank", te]) == 0
    assert set(os.listdir(tmp_path)) == before
    out = capsys.readouterr().out
    assert any("\t" in ln for ln in out.splitlines())


def test_cli_qrel_changes_metric(tmp_path, letor, capsys):
    tr, te = letor
    model = tmp_path / "m.txt"
    assert main(["-train", tr, "-ranker", "9", "-metric2t", "NDCG@10",
                 "-save", str(model)]) == 0
    capsys.readouterr()
    assert main(["-load", str(model), "-test", te, "-metric2T", "P@5"]) == 0
    base_out = capsys.readouterr().out
    # qrel marking every doc non-relevant → P@5 must become 0
    qrel = tmp_path / "all_zero.qrel"
    from ranklib_tpu.data.letor import read_letor
    ds = read_letor(te, quiet=True)
    with open(qrel, "w") as f:
        for q in ds.queries:
            for i in range(q.n):
                f.write(f"{q.qid} 0 doc{q.qid}_{i} 0\n")
    assert main(["-load", str(model), "-test", te, "-metric2T", "P@5",
                 "-qrel", str(qrel)]) == 0
    qrel_out = capsys.readouterr().out
    assert "P@5 on test data: 0.0000" in qrel_out
    assert "P@5 on test data: 0.0000" not in base_out


def test_cli_eventlog(tmp_path, letor):
    tr, _ = letor
    ev = tmp_path / "events.jsonl"
    assert main(["-train", tr, "-ranker", "9", "-metric2t", "NDCG@10",
                 "-eventlog", str(ev)]) == 0
    from ranklib_tpu.utils.logging import set_event_log
    set_event_log(None)          # close so the file is flushed
    recs = [json.loads(x) for x in ev.read_text().splitlines()] \
        if ev.read_text().strip() else []
    assert isinstance(recs, list)


def test_tts_split_flow(tmp_path):
    """-tts carves test out of the training file and overrides -tvs
    (ref: Evaluator -tts precedence)."""
    from tests.fixtures import synth_dataset, write_letor_text
    from ranklib_tpu.cli import main

    train = tmp_path / "train.txt"
    write_letor_text(synth_dataset(n_queries=20, n_features=6, seed=21,
                                   signal=3.0), str(train))
    rc = main(["-train", str(train), "-ranker", "9", "-tts", "0.7",
               "-metric2t", "NDCG@10", "-save", str(tmp_path / "m.txt")])
    assert rc == 0
    assert (tmp_path / "m.txt").read_text().startswith("## Linear Regression")


def test_sparse_tts_dense_fallback_still_splits(tmp_path, capsys,
                                                monkeypatch):
    """-sparse -tts when the CSR split-grid loader bails: the dense
    fallback must STILL carve the test set (the dense `elif has_tts` arm
    is unreachable once the sparse arm matched — advisor finding, round
    5). Before the fix the model silently trained on ALL queries and no
    test metric was emitted."""
    import ranklib_tpu.data.sparse as sparse_mod
    from ranklib_tpu.cli import main
    from ranklib_tpu.utils.errors import RankLibError
    from tests.fixtures import synth_dataset, write_letor_text

    train = tmp_path / "train.txt"
    write_letor_text(synth_dataset(n_queries=20, n_features=6, seed=21,
                                   signal=3.0), str(train))

    def _boom(*a, **k):
        raise RankLibError("forced: CSR loader not applicable")

    monkeypatch.setattr(sparse_mod, "read_letor_sparse", _boom)
    rc = main(["-train", str(train), "-ranker", "6", "-sparse",
               "-tts", "0.7", "-tree", "3", "-leaf", "4",
               "-metric2t", "NDCG@10"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "using the dense pipeline" in out
    assert "Train-test split: 14 / 6 queries" in out
    assert "on test data:" in out


def test_python_api_roundtrip(tmp_path):
    """api.read/train/evaluate/save/load/rank/score — the documented
    programmatic surface. (The `def` header was accidentally absorbed
    into the preceding test when the tts-fallback test landed — review
    finding, round 5.)"""
    import ranklib_tpu.api as rl
    from tests.fixtures import synth_dataset, write_letor_text

    p = tmp_path / "train.txt"
    write_letor_text(synth_dataset(n_queries=12, n_features=6, seed=2,
                                   signal=3.0), str(p))
    ds = rl.read(str(p))
    model = rl.train(ds, ranker="Linear Regression", metric="NDCG@10")
    m = rl.evaluate(model, ds, metric="NDCG@10")
    assert m > 0.8
    mean, pq = rl.evaluate(model, ds, metric="NDCG@10", per_query=True)
    assert len(pq) == 12 and abs(mean - m) < 1e-9
    mp = tmp_path / "m.txt"
    rl.save(model, str(mp))
    model2 = rl.load(str(mp))
    s1, s2 = rl.score(model, ds), rl.score(model2, ds)
    for a, b in zip(s1, s2):
        assert np.allclose(a, b, atol=1e-6)
    perms = rl.rank(model, ds)
    assert all(len(pm) == q.n for pm, q in zip(perms, ds.queries))
    # integer ranker id + hyperparams route
    lm = rl.train(ds, ranker=6, n_trees=3, n_leaves=4)
    assert rl.evaluate(lm, ds) > 0.5


def test_validate_and_test_files_with_extra_features(tmp_path, letor):
    """A validation/test file whose max fid exceeds the training file's
    must align to the training feature space instead of crashing in
    binning (review fix)."""
    tr, _ = letor
    wide = synth_dataset(n_queries=6, n_features=9, seed=33, w_seed=31,
                         signal=3.0)
    wide_path = tmp_path / "wide.txt"
    write_letor_text(wide, wide_path)
    model = tmp_path / "m.txt"
    rc = main(["-train", tr, "-validate", str(wide_path), "-test",
               str(wide_path), "-ranker", "6", "-tree", "2", "-leaf", "3",
               "-metric2t", "NDCG@10", "-save", str(model)])
    assert rc == 0 and model.exists()


def test_cli_leaf_one_is_clean_error(letor):
    tr, _ = letor
    rc = main(["-train", tr, "-ranker", "6", "-tree", "2", "-leaf", "1",
               "-metric2t", "NDCG@10"])
    assert rc == 1


def test_python_api_sparse_read(tmp_path):
    """api.read(sparse=True) returns a CSR dataset that trains identically."""
    import ranklib_tpu.api as rl
    from ranklib_tpu.data.sparse import CSRDataset
    from tests.fixtures import synth_dataset, write_letor_text

    path = str(tmp_path / "t.txt")
    write_letor_text(synth_dataset(n_queries=8, n_features=6, seed=3,
                                   signal=3.0), path)
    dense = rl.read(path)
    csr = rl.read(path, sparse=True)
    assert isinstance(csr, CSRDataset)
    m_d = rl.train(dense, ranker=9)
    m_c = rl.train(csr, ranker=9)
    import numpy as np
    np.testing.assert_allclose(m_d.weights, m_c.weights, atol=1e-9)


def test_silent_still_prints_final_results(tmp_path, letor, capsys):
    """-silent mutes per-round progress only; final metric lines and the
    rank-flow stdout ranking still print (the reference's -silent gates
    Ranker.verbose, not the Evaluator result prints — review finding,
    round 5: '-silent -test' exited 0 with zero bytes of output)."""
    tr, te = letor
    model = tmp_path / "m.txt"
    capsys.readouterr()
    assert main(["-silent", "-train", tr, "-ranker", "9",
                 "-metric2t", "NDCG@10", "-test", te,
                 "-save", str(model)]) == 0
    out = capsys.readouterr().out
    assert "on training data:" in out and "on test data:" in out
    assert "Training starts" not in out        # progress stays muted
    capsys.readouterr()
    assert main(["-silent", "-load", str(model), "-test", te,
                 "-metric2T", "NDCG@10"]) == 0
    assert "on test data:" in capsys.readouterr().out
    capsys.readouterr()
    assert main(["-silent", "-load", str(model), "-rank", te]) == 0
    out = capsys.readouterr().out
    assert any("\t" in ln for ln in out.splitlines())


def test_indri_docid_strips_every_hash(tmp_path, letor):
    """The indri docid is description.replace('#','').strip() — EMBEDDED
    '#' drop too, exactly like the reference (review finding: only the
    leading marker was stripped)."""
    from ranklib_tpu.evaluator import write_indri_rankings
    from ranklib_tpu.data.letor import read_letor

    tr, te = letor
    ds = read_letor(te, quiet=True)
    ds.queries[0].descs = ["# docid=GX008-86#part2"] * ds.queries[0].n
    out = tmp_path / "i.txt"
    write_indri_rankings(str(out), ds,
                         [q.labels.astype(float) for q in ds.queries])
    first = out.read_text().splitlines()[0].split()
    assert first[2] == "docid=GX008-86part2"
