"""PKIndexSplitter analogue: split by filter query, children share
segments via hardlinks and are exactly complementary."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index, split_by_query
from lucene_solr_ray.search import IndexSearcher, MatchAllDocsQuery, TermQuery
from lucene_solr_ray.sources import generate_table


def test_split_by_query_complementary(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("pk_src")
    pq.write_table(generate_table(300, seed=9), str(d / "a.parquet"))
    idx = str(tmp_path_factory.mktemp("pk_idx") / "idx")
    build_index(str(d), idx, rows_per_partition=100)
    parent = IndexSearcher(idx)
    q = TermQuery("return")
    want_match = parent._docs_only(q)
    assert 0 < want_match.size < parent.max_doc
    out_m = str(tmp_path_factory.mktemp("pk_out") / "match")
    out_r = str(tmp_path_factory.mktemp("pk_out2") / "rest")
    rep = split_by_query(idx, q, out_m, out_r)
    assert rep["docs_per_child"] == [int(want_match.size),
                                     parent.max_doc - int(want_match.size)]
    sm = IndexSearcher(out_m)
    sr = IndexSearcher(out_r)
    got_m = sm._docs_only(MatchAllDocsQuery())
    got_r = sr._docs_only(MatchAllDocsQuery())
    assert np.array_equal(got_m, want_match)
    assert got_m.size + got_r.size == parent.max_doc
    assert np.intersect1d(got_m, got_r).size == 0
    # every 'return' doc searches in the match child with parent scores...
    tm = sm.search(q, k=5)
    assert tm.num_rows > 0
    # ...and the rest child has none
    assert sr.search(q, k=5).num_rows == 0
