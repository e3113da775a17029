"""MultiPhraseQuery: slot alternatives, brute-force cross-check."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher, PhraseQuery
from lucene_solr_ray.search.query import MultiPhraseQuery

DOCS = [
    "the fast fox ran",            # 0: fast fox
    "a quick fox jumped",          # 1: quick fox
    "the fast dog barked",         # 2: fast but no fox
    "fox quick weird order",       # 3: wrong order
    "slow fox crept",              # 4: neither alternative
    "fast fox and quick fox",      # 5: BOTH -> freq 2
]


@pytest.fixture(scope="module")
def mpidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("mp_corpus")
    pq.write_table(pa.table({"content": pa.array(DOCS)}),
                   str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("mp_idx"))
    build_index(str(d), out, rows_per_partition=10, store_positions=True)
    return out


def test_multiphrase_alternatives(mpidx):
    s = IndexSearcher(mpidx)
    q = MultiPhraseQuery((("fast", "quick"), ("fox",)))
    docs, scores = s._score(q)
    assert docs.tolist() == [0, 1, 5]
    # doc 5 matched twice -> higher freq leg than a 1-len doc would...
    # check freq effect by comparing with the single-alternative phrases
    d_fast, _ = s._score(PhraseQuery(("fast", "fox")))
    d_quick, _ = s._score(PhraseQuery(("quick", "fox")))
    assert set(docs.tolist()) == set(d_fast.tolist()) | set(d_quick.tolist())


def test_multiphrase_single_slots_equals_phrase_docs(mpidx):
    s = IndexSearcher(mpidx)
    mq = MultiPhraseQuery((("fast",), ("fox",)))
    pqr = PhraseQuery(("fast", "fox"))
    d1, s1 = s._score(mq)
    d2, s2 = s._score(pqr)
    assert d1.tolist() == d2.tolist()
    assert np.allclose(s1, s2)  # same freq/norm; idf legs identical


def test_multiphrase_three_slots(mpidx):
    s = IndexSearcher(mpidx)
    q = MultiPhraseQuery((("fast", "quick"), ("fox",), ("ran", "jumped")))
    docs, _ = s._score(q)
    assert docs.tolist() == [0, 1]


def test_multiphrase_missing_slot(mpidx):
    s = IndexSearcher(mpidx)
    q = MultiPhraseQuery((("fast",), ("zebra",)))
    docs, _ = s._score(q)
    assert docs.size == 0


def test_parser_builds_multiphrase_for_synonyms(mpidx):
    from lucene_solr_ray.analysis.synonyms import (
        SynonymAnalyzer,
        parse_synonym_rules,
    )
    from lucene_solr_ray.search.query import parse_query

    ana = SynonymAnalyzer(parse_synonym_rules(["fast, quick"]),
                          base="standard")
    q = parse_query('"fast fox"', ana)
    assert isinstance(q, MultiPhraseQuery)
    assert q.slots == (("fast", "quick"), ("fox",))
    s = IndexSearcher(mpidx)
    docs, _ = s._score(q)
    assert docs.tolist() == [0, 1, 5]  # both surface forms match
    # single-position synonym term -> OR of alternatives
    q2 = parse_query("fast", ana)
    from lucene_solr_ray.search.query import BooleanQuery

    assert isinstance(q2, BooleanQuery)
    terms = {sub.term for _, sub in q2.clauses}
    assert terms == {"fast", "quick"}
