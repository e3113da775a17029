"""SimpleQueryParser grammar: shapes, tolerance, flags, index semantics.

Mirrors lucene/queryparser/.../simple/SimpleQueryParser.java: the
error-tolerant +/|/-/quote/prefix grammar over analyzed terms.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_solr_ray.search.simpleparser import ALL_FLAGS, simple_parse

AZ = get_analyzer("simple")


def P(text, **kw):
    return simple_parse(text, AZ, **kw)


# ----------------------------------------------------------------- shapes

def test_default_or_and_explicit_ops():
    assert P("alpha beta") == BooleanQuery.build(
        should=[TermQuery("alpha"), TermQuery("beta")])
    assert P("alpha + beta") == BooleanQuery.build(
        must=[TermQuery("alpha"), TermQuery("beta")])
    assert P("alpha | beta") == BooleanQuery.build(
        should=[TermQuery("alpha"), TermQuery("beta")])


def test_left_associative_no_precedence():
    # (x AND b) OR c — reading order, unlike classic parser precedence
    assert P("x + b | c") == BooleanQuery.build(should=[
        BooleanQuery.build(must=[TermQuery("x"), TermQuery("b")]),
        TermQuery("c"),
    ])
    # (x OR b) AND c
    assert P("x | b + c") == BooleanQuery.build(must=[
        BooleanQuery.build(should=[TermQuery("x"), TermQuery("b")]),
        TermQuery("c"),
    ])


def test_negation_shapes():
    # negation wraps as the reference's (MUST_NOT x, SHOULD *:*)
    wrap = BooleanQuery.build(must_not=[TermQuery("beta")],
                              should=[MatchAllDocsQuery()])
    assert P("alpha -beta") == BooleanQuery.build(
        should=[TermQuery("alpha"), wrap])
    assert P("alpha + -beta") == BooleanQuery.build(
        must=[TermQuery("alpha")], must_not=[TermQuery("beta")])
    assert P("-alpha + beta") == BooleanQuery.build(
        must=[TermQuery("beta")], must_not=[TermQuery("alpha")])
    # double negative cancels
    assert P("--alpha") == TermQuery("alpha")


def test_grouping_phrase_prefix_fuzzy():
    assert P("(x | b) + c") == BooleanQuery.build(must=[
        BooleanQuery.build(should=[TermQuery("x"), TermQuery("b")]),
        TermQuery("c"),
    ])
    assert P('"alpha beta"') == PhraseQuery(("alpha", "beta"))
    assert P('"alpha beta"~3') == PhraseQuery(("alpha", "beta"), slop=3)
    assert P("alph*") == PrefixQuery("alph")
    assert P("alpha~1") == FuzzyQuery("alpha", max_edits=1)
    assert P("alpha~") == FuzzyQuery("alpha", max_edits=2)


def test_error_tolerance_never_raises():
    assert P("") == MatchAllDocsQuery()
    assert P(")))") == MatchAllDocsQuery()
    assert P("( alpha") == TermQuery("alpha")    # unterminated group
    assert P('"alpha beta') == PhraseQuery(("alpha", "beta"))
    assert P("+ | +") == MatchAllDocsQuery()     # operators only
    assert P("alpha +") == TermQuery("alpha")    # trailing operator
    assert P("alpha + | b") == BooleanQuery.build(  # doubled op: last wins
        should=[TermQuery("alpha"), TermQuery("b")])


def test_escape_and_literals():
    # escaped '+' folds into the token; the letter tokenizer then splits
    # it away and the stopword 'a' vanishes
    assert P(r"a\+b") == TermQuery("b")
    assert P(r'\"alpha') == TermQuery("alpha")  # escaped quote: literal
    # mid-token '*' is literal; analysis splits around it -> phrase
    assert P("ta*le") == PhraseQuery(("ta", "le"))


def test_flags_disable_features():
    assert simple_parse("alpha -beta", AZ, flags=ALL_FLAGS - {"NOT"}) == \
        BooleanQuery.build(should=[TermQuery("alpha"), TermQuery("beta")])
    assert simple_parse("alph*", AZ, flags=ALL_FLAGS - {"PREFIX"}) == \
        TermQuery("alph")
    q = simple_parse('"a b"', AZ, flags=ALL_FLAGS - {"PHRASE"})
    assert not isinstance(q, PhraseQuery)


def test_default_op_and():
    assert P("alpha beta", default_op="AND") == BooleanQuery.build(
        must=[TermQuery("alpha"), TermQuery("beta")])


# ------------------------------------------------------------- index docs

DOCS = [
    "alpha beta gamma",        # 0
    "alpha gamma",             # 1
    "beta delta",              # 2
    "alpha beta beta",         # 3
    "gamma delta",             # 4
]


@pytest.fixture(scope="module")
def qidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("simpcorpus")
    tbl = pa.table({
        "repo": pa.array(["r"] * len(DOCS)),
        "path": pa.array([f"p{i}" for i in range(len(DOCS))]),
        "commit": pa.array(["c"] * len(DOCS)),
        "lang": pa.array(["txt"] * len(DOCS)),
        "content": pa.array(DOCS),
    })
    pq.write_table(tbl, str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("simpindex"))
    build_index(str(d), out, rows_per_partition=10, store_positions=True)
    return IndexSearcher(out)


def docs_of(s, q):
    d, _ = s._score(q)
    return sorted(d.tolist())


def test_semantics_on_index(qidx):
    assert docs_of(qidx, P("alpha + beta")) == [0, 3]
    assert docs_of(qidx, P("alpha -beta")) == [0, 1, 3, 4]  # a OR (NOT b)
    assert docs_of(qidx, P("alpha + -beta")) == [1]
    assert docs_of(qidx, P("delta | gamma")) == [0, 1, 2, 4]
    assert docs_of(qidx, P('"alpha beta"')) == [0, 3]
    assert docs_of(qidx, P("gamm* + delta")) == [4]


def test_pathological_inputs_stay_fast_and_quiet():
    import time

    # hostile nesting: never raises (paren depth caps, extra ignored)
    deep = "(" * 20000 + "alpha" + ")" * 20000
    assert P(deep) == TermQuery("alpha")
    # huge flat input: O(n) combination, one BooleanQuery per run
    t0 = time.time()
    q = P(" ".join(["alpha"] * 20000))
    assert time.time() - t0 < 5.0
    assert len(q.clauses) == 20000


def test_all_negative_conjunction(qidx):
    # '-alpha + -gamma' == docs containing neither term
    q = P("-alpha + -gamma")
    assert docs_of(qidx, q) == [2]  # "beta delta" alone lacks both


def test_never_raises_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_solr_ray.search.query import Query

    @settings(max_examples=300, deadline=None)
    @given(st.text(
        alphabet=st.sampled_from(list('ab+|-"()\\*~^ \t')), max_size=60))
    def check(s):
        q = simple_parse(s, AZ)
        assert isinstance(q, Query)

    check()
