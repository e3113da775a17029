"""MemoryIndex (single-doc percolation), dedup conflict resolvers, TTL
deletes."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from lucene_solr_ray.search.memoryindex import MemoryIndex
from lucene_solr_ray.search.query import (
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    parse_query,
)


def test_memoryindex_term_and_bool():
    mi = MemoryIndex("the quick brown fox jumps")
    assert mi.matches(TermQuery("quick"))
    assert not mi.matches(TermQuery("slow"))
    assert mi.matches(BooleanQuery.build(must=[TermQuery("quick")],
                                         must_not=[TermQuery("slow")]))
    assert not mi.matches(BooleanQuery.build(must=[TermQuery("quick")],
                                             must_not=[TermQuery("fox")]))
    assert mi.score(TermQuery("quick")) > 0


def test_memoryindex_phrase_and_prefix():
    mi = MemoryIndex("alpha beta gamma beta gamma")
    assert mi.matches(PhraseQuery(("beta", "gamma")))
    assert not mi.matches(PhraseQuery(("gamma", "alpha")))
    assert mi.matches(PrefixQuery("gam"))
    # percolation via the parser
    from lucene_solr_ray.analysis import get_analyzer

    q = parse_query('"beta gamma" -delta', get_analyzer("standard"))
    assert mi.matches(q)


def test_exact_dedup_resolvers(ray_session):
    rows = [
        {"id": 1, "ts": 10, "text": "same content"},
        {"id": 2, "ts": 30, "text": "same content"},
        {"id": 3, "ts": 20, "text": "same content"},
        {"id": 4, "ts": 5, "text": "unique content"},
    ]
    from lucene_solr_ray.stages.dedup import exact_dedup

    ds = rd.from_items(rows)
    by_min = {r["content_md5"]: r["keep_id"]
              for r in exact_dedup(ds, "text", "id").take_all()}
    by_max = {r["content_md5"]: r["keep_id"]
              for r in exact_dedup(rd.from_items(rows), "text", "id",
                                   resolver="keep_max").take_all()}
    recent = {r["content_md5"]: r["keep_id"]
              for r in exact_dedup(rd.from_items(rows), "text", "id",
                                   resolver="most_recent",
                                   order_col="ts").take_all()}
    dup_hash = [h for h, k in by_min.items() if k == 1][0]
    assert by_min[dup_hash] == 1
    assert by_max[dup_hash] == 3
    assert recent[dup_hash] == 2  # highest ts wins


def test_ttl_delete(tmp_path_factory, ray_session):
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.index.deletes import ttl_delete
    from lucene_solr_ray.search import IndexSearcher

    d = tmp_path_factory.mktemp("ttl_corpus")
    pq.write_table(pa.table({
        "content": pa.array([f"doc {i} evergreen" for i in range(10)]),
        "expire_at": pa.array(np.arange(10, dtype=np.int64)),
    }), str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("ttl_idx"))
    build_index(str(d), out, rows_per_partition=10)
    n = ttl_delete(out, "expire_at", 4)
    assert n == 4
    s = IndexSearcher(out)
    assert s._docs_only(TermQuery("evergreen")).tolist() == list(range(4, 10))
    # second pass: nothing newly expired
    assert ttl_delete(out, "expire_at", 4) == 0
