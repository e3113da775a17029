"""Block join (parent/child): doc-id-block semantics mirroring
ToParentBlockJoinQuery / ToChildBlockJoinQuery behavior."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher, TermQuery
from lucene_solr_ray.search.blockjoin import (
    ToChildBlockJoinQuery,
    ToParentBlockJoinQuery,
)

# children precede their parent (addDocuments block contract):
# block 1: docs 0,1 children -> parent 2
# block 2: doc 3 child -> parent 4
# block 3: docs 5,6,7 children -> parent 8
DOCS = [
    "childdoc python java",          # 0
    "childdoc python",               # 1
    "parentdoc alice",               # 2
    "childdoc rust",                 # 3
    "parentdoc bob",                 # 4
    "childdoc python rust",          # 5
    "childdoc cobol",                # 6
    "childdoc python python java",   # 7
    "parentdoc carol",               # 8
]


@pytest.fixture(scope="module")
def bidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("bj_corpus")
    pq.write_table(pa.table({"content": pa.array(DOCS)}),
                   str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("bj_index"))
    build_index(str(d), out, rows_per_partition=20)
    return out


def test_to_parent_matching_parents(bidx):
    s = IndexSearcher(bidx)
    q = ToParentBlockJoinQuery(TermQuery("python"), TermQuery("parentdoc"),
                               score_mode="none")
    t = s.search(q, k=10)
    # parents 2 (children 0,1) and 8 (children 5,7) have python children
    assert sorted(t["doc_id"].to_pylist()) == [2, 8]
    assert all(x == 1.0 for x in t["score"].to_pylist())


def test_to_parent_score_modes(bidx):
    s = IndexSearcher(bidx)
    child = TermQuery("python")
    pf = TermQuery("parentdoc")
    cdocs, cscores = s._score(child)
    by_doc = dict(zip(cdocs.tolist(), cscores.tolist()))
    import numpy as np

    want = {
        "total": {2: by_doc[0] + by_doc[1], 8: by_doc[5] + by_doc[7]},
        "avg": {2: (by_doc[0] + by_doc[1]) / 2,
                8: (by_doc[5] + by_doc[7]) / 2},
        "max": {2: max(by_doc[0], by_doc[1]),
                8: max(by_doc[5], by_doc[7])},
    }
    for mode, expect in want.items():
        t = s.search(ToParentBlockJoinQuery(child, pf, mode), k=10)
        got = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
        assert set(got) == set(expect), mode
        for d in expect:
            assert got[d] == pytest.approx(expect[d], rel=1e-6), (mode, d)


def test_to_parent_no_match(bidx):
    s = IndexSearcher(bidx)
    q = ToParentBlockJoinQuery(TermQuery("zzz"), TermQuery("parentdoc"))
    assert s.search(q, k=10).num_rows == 0


def test_to_child_propagates_parent_score(bidx):
    s = IndexSearcher(bidx)
    q = ToChildBlockJoinQuery(TermQuery("carol"), TermQuery("parentdoc"))
    t = s.search(q, k=10)
    # carol = parent 8 -> children 5,6,7 all get her score
    assert sorted(t["doc_id"].to_pylist()) == [5, 6, 7]
    assert len(set(t["score"].to_pylist())) == 1


def test_to_child_first_block(bidx):
    s = IndexSearcher(bidx)
    q = ToChildBlockJoinQuery(TermQuery("alice"), TermQuery("parentdoc"))
    t = s.search(q, k=10)
    assert sorted(t["doc_id"].to_pylist()) == [0, 1]
