"""New-parser queries through the sharded scatter/gather: rank identity.

Surround span queries, simple-grammar booleans and XML-built dismax
must score identically on the single-process searcher and on
search_sharded at two shard counts (global df broadcast covers span
and wrapper queries too).
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher, search_sharded
from lucene_solr_ray.search.simpleparser import simple_parse
from lucene_solr_ray.search.surround import surround_query
from lucene_solr_ray.search.xmlparser import parse_xml_query

DOCS = [
    "alpha beta gamma delta",
    "alpha gamma beta",
    "beta alpha xx gamma",
    "gamma yy alpha beta zz",
    "alpha alpha beta",
    "delta epsilon alpha",
    "gamma delta beta beta",
    "epsilon alpha beta gamma",
]


@pytest.fixture(scope="module")
def pidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("pdcorpus")
    tbl = pa.table({
        "repo": pa.array(["r"] * len(DOCS)),
        "path": pa.array([f"p{i}" for i in range(len(DOCS))]),
        "commit": pa.array(["c"] * len(DOCS)),
        "lang": pa.array(["txt"] * len(DOCS)),
        "content": pa.array(DOCS),
    })
    pq.write_table(tbl, str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("pdindex"))
    build_index(str(d), out, rows_per_partition=2, store_positions=True)
    return out


def test_parser_queries_rank_identical_sharded(pidx, ray_session):
    az = get_analyzer("simple")
    queries = [
        surround_query("alpha w beta"),
        surround_query("3N(gamma, delta)"),
        simple_parse("alpha + beta -delta", az),
        simple_parse("epsilon | delta", az),
        parse_xml_query("""
        <DisjunctionMaxQuery tieBreaker="0.4">
          <TermQuery>alpha</TermQuery><TermQuery>delta</TermQuery>
        </DisjunctionMaxQuery>"""),
        parse_xml_query("""
        <SpanNear slop="1" inOrder="false">
          <SpanTerm>beta</SpanTerm><SpanTerm>gamma</SpanTerm>
        </SpanNear>"""),
    ]
    s = IndexSearcher(pidx)
    want = [s.search(q, k=8).to_pydict() for q in queries]
    for num_shards in (2, 4):
        got = search_sharded(pidx, queries, k=8,
                             num_shards=num_shards).to_pydict()
        for qi, w in enumerate(want):
            m = [i for i, q in enumerate(got["query_id"]) if q == qi]
            assert [got["doc_id"][i] for i in m] == w["doc_id"], (
                num_shards, qi)
            assert [got["score"][i] for i in m] == pytest.approx(
                w["score"]), (num_shards, qi)
