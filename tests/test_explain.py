"""Explanation API: the explain value must equal the search score."""

import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index, merge_index
from lucene_solr_ray.search import (
    BooleanQuery,
    BoostQuery,
    IndexSearcher,
    TermQuery,
)
from lucene_solr_ray.sources import generate_table


@pytest.fixture(scope="module")
def eidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("ex_corpus")
    pq.write_table(generate_table(300, seed=61), str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("ex_idx"))
    build_index(str(d), out, rows_per_partition=100)
    merge_index(out)
    return out


def test_explain_matches_search_score(eidx):
    s = IndexSearcher(eidx)
    for q in [
        TermQuery("return"),
        BooleanQuery.build(should=[TermQuery("return"), TermQuery("def")]),
        BooleanQuery.build(must=[TermQuery("return")],
                           must_not=[TermQuery("zzz")]),
        BoostQuery(TermQuery("return"), 2.5),
    ]:
        t = s.search(q, k=3)
        for doc, score in zip(t["doc_id"].to_pylist(),
                              t["score"].to_pylist()):
            e = s.explain(q, doc)
            assert e["match"]
            assert e["value"] == pytest.approx(score, rel=1e-5), q
            assert e["description"]


def test_explain_non_match(eidx):
    s = IndexSearcher(eidx)
    e = s.explain(TermQuery("zzznothere"), 0)
    assert not e["match"] and e["value"] == 0.0
    # MUST_NOT exclusion explains as no-match
    hit = int(s.search(TermQuery("return"), k=1)["doc_id"][0].as_py())
    e2 = s.explain(BooleanQuery.build(must=[TermQuery("return")],
                                      must_not=[TermQuery("return")]), hit)
    assert not e2["match"]


def test_explain_structure(eidx):
    s = IndexSearcher(eidx)
    hit = int(s.search(TermQuery("return"), k=1)["doc_id"][0].as_py())
    e = s.explain(TermQuery("return"), hit)
    kinds = [d["description"].split("(")[0] for d in e["details"]]
    assert kinds == ["idf", "tfNorm"]
