"""External qrel judgments (-qrel) applied to evaluation data."""

import numpy as np
import pytest

from ranklib_tpu.data.dataset import Dataset, Query
from ranklib_tpu.data.qrel import apply_qrel, doc_id, read_qrel
from ranklib_tpu.utils.errors import RankLibError


def _ds():
    q1 = Query("1", np.array([0.0, 0.0], np.float32),
               np.zeros((2, 3), np.float32), descs=["# docA", "# docB"])
    q2 = Query("2", np.array([0.0], np.float32),
               np.zeros((1, 3), np.float32), descs=["#docid = GX1 inc = 1"])
    return Dataset([q1, q2], 3)


def test_doc_id_forms():
    assert doc_id("# docA") == "docA"
    assert doc_id("#docid = GX1 inc = 1") == "GX1"
    assert doc_id("") == ""
    # word-boundary matching (review finding, round 5): an embedded
    # 'docid' substring or a stray '=' elsewhere must not hijack the
    # extraction
    assert doc_id("# mydocid = GX1 docid = GX2") == "GX2"
    assert doc_id("# docidentifier GX8 rank = 2") == "docidentifier"
    assert doc_id("#DOCID=GX3") == "GX3"
    assert doc_id("# docid GX4 inc = 1") == "docid"  # no '=': first token


def test_apply_qrel(tmp_path):
    p = tmp_path / "q.qrel"
    p.write_text("1 0 docA 2\n1 0 docB 0\n2 0 GX1 3\n1 0 unseen 1\n")
    ds = _ds()
    apply_qrel(ds, str(p))
    np.testing.assert_array_equal(ds.queries[0].labels, [2.0, 0.0])
    np.testing.assert_array_equal(ds.queries[1].labels, [3.0])


def test_unjudged_docs_zeroed(tmp_path):
    p = tmp_path / "q.qrel"
    p.write_text("1 0 docA 2\n")
    ds = _ds()
    ds.queries[0].labels[:] = [1.0, 1.0]
    apply_qrel(ds, str(p))
    np.testing.assert_array_equal(ds.queries[0].labels, [2.0, 0.0])


def test_bad_qrel_raises(tmp_path):
    p = tmp_path / "bad.qrel"
    p.write_text("1 0 docA\n")
    with pytest.raises(RankLibError):
        read_qrel(str(p))
