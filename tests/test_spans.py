"""Span query algebra over the positional index, vs hand-checked docs."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)

DOCS = [
    "alpha beta gamma delta",          # 0
    "alpha gamma beta",                # 1
    "beta alpha xx gamma",             # 2
    "gamma yy alpha beta zz",          # 3
    "alpha alpha beta",                # 4
    "delta epsilon",                   # 5
]


@pytest.fixture(scope="module")
def sidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("scorpus")
    tbl = pa.table({
        "repo": pa.array(["r"] * len(DOCS)),
        "path": pa.array([f"p{i}" for i in range(len(DOCS))]),
        "commit": pa.array(["c"] * len(DOCS)),
        "lang": pa.array(["txt"] * len(DOCS)),
        "content": pa.array(DOCS),
    })
    pq.write_table(tbl, str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("sindex"))
    build_index(str(d), out, rows_per_partition=10, store_positions=True)
    return IndexSearcher(out)


def docs_of(s, q):
    d, _ = s._score(q)
    return d.tolist()


def test_span_term(sidx):
    assert docs_of(sidx, SpanTermQuery("alpha")) == [0, 1, 2, 3, 4]


def test_span_near_ordered(sidx):
    q = SpanNearQuery((SpanTermQuery("alpha"), SpanTermQuery("beta")),
                      slop=0, in_order=True)
    assert docs_of(sidx, q) == [0, 3, 4]  # adjacent ordered
    q1 = SpanNearQuery((SpanTermQuery("alpha"), SpanTermQuery("beta")),
                       slop=1, in_order=True)
    assert docs_of(sidx, q1) == [0, 1, 3, 4]  # one-gap ordered


def test_span_near_unordered(sidx):
    q = SpanNearQuery((SpanTermQuery("alpha"), SpanTermQuery("beta")),
                      slop=0, in_order=False)
    assert docs_of(sidx, q) == [0, 2, 3, 4]  # 'beta alpha' counts too


def test_span_or_and_not(sidx):
    q = SpanOrQuery((SpanTermQuery("delta"), SpanTermQuery("epsilon")))
    assert docs_of(sidx, q) == [0, 5]
    # alpha not immediately followed by beta
    near = SpanNearQuery((SpanTermQuery("alpha"), SpanTermQuery("beta")),
                         slop=0, in_order=True)
    q2 = SpanNotQuery(SpanTermQuery("alpha"), near)
    assert docs_of(sidx, q2) == [1, 2, 4]  # doc4: first alpha survives


def test_span_first(sidx):
    q = SpanFirstQuery(SpanTermQuery("gamma"), end=1)
    assert docs_of(sidx, q) == [3]  # gamma at position 0 only in doc 3


def test_span_nested(sidx):
    inner = SpanOrQuery((SpanTermQuery("beta"), SpanTermQuery("gamma")))
    q = SpanNearQuery((SpanTermQuery("alpha"), inner), slop=0,
                      in_order=True)
    assert docs_of(sidx, q) == [0, 1, 3, 4]


def test_span_matches_counts_and_sloppy_freq(sidx):
    """span_matches exposes the raw span enumeration: counts and
    sloppyFreq = sum 1/(1+width) agree with a hand walk of DOCS."""
    import numpy as np

    from lucene_solr_ray.search.spans import span_matches, score_spans

    q = SpanNearQuery((SpanTermQuery("alpha"), SpanTermQuery("beta")),
                      slop=1, in_order=True)
    docs, counts, freqs = span_matches(sidx, q)
    # doc0 "alpha beta ..." gap0 -> 1 span, freq 1/1
    # doc1 "alpha gamma beta" gap1 -> 1 span, freq 1/2
    # doc3 "... alpha beta zz" gap0; doc4 "alpha alpha beta": pairs
    # (0,2) gap1 and (1,2) gap0 -> 2 spans, freq 1/2 + 1
    by = dict(zip(docs.tolist(), zip(counts.tolist(), freqs.tolist())))
    assert by[0] == (1, 1.0)
    assert by[1] == (1, 0.5)
    assert by[3] == (1, 1.0)
    assert by[4] == (2, 1.5)
    assert 2 not in by  # "beta alpha" is out of order
    sdocs, _ = score_spans(sidx, q)
    assert np.array_equal(docs, sdocs)
