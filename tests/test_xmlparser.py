"""XML query parser: element -> query mapping, boosts, spans, errors.

Mirrors lucene/queryparser/.../xml/CoreParser.java builder registry.
"""

import pytest

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    TermQuery,
    TermRangeQuery,
)
from lucene_solr_ray.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucene_solr_ray.search.xmlparser import (
    XmlParserException,
    parse_xml_query,
)

AZ = get_analyzer("simple")


def P(xml):
    return parse_xml_query(xml, AZ)


def test_term_and_terms():
    assert P("<TermQuery>alpha</TermQuery>") == TermQuery("alpha")
    # TermsQuery analyzes: stopword 'the' drops, case folds
    assert P("<TermsQuery>The Alpha BETA</TermsQuery>") == \
        BooleanQuery.build(should=[TermQuery("alpha"), TermQuery("beta")])
    assert P("<TermsQuery>alpha</TermsQuery>") == TermQuery("alpha")


def test_boolean_clauses_and_msm():
    q = P("""
    <BooleanQuery minimumNumberShouldMatch="1">
      <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>b</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>c</TermQuery></Clause>
      <Clause occurs="filter"><TermQuery>d</TermQuery></Clause>
    </BooleanQuery>""")
    assert q == BooleanQuery.build(
        must=[TermQuery("a")], must_not=[TermQuery("b")],
        should=[TermQuery("c")], filter=[TermQuery("d")], msm=1)


def test_boost_attribute_wraps():
    assert P('<TermQuery boost="2.5">x</TermQuery>') == \
        BoostQuery(TermQuery("x"), 2.5)


def test_constant_score_dismax_range_matchall():
    assert P("""<ConstantScoreQuery boost="3">
                  <TermQuery>x</TermQuery>
                </ConstantScoreQuery>""") == \
        ConstantScoreQuery(TermQuery("x"), score=3.0)
    assert P("""<DisjunctionMaxQuery tieBreaker="0.3">
                  <TermQuery>x</TermQuery><TermQuery>y</TermQuery>
                </DisjunctionMaxQuery>""") == \
        DisjunctionMaxQuery((TermQuery("x"), TermQuery("y")),
                            tie_breaker=0.3)
    assert P("""<RangeQuery lowerTerm="aaa" upperTerm="bbb"
                 includeUpper="false"/>""") == \
        TermRangeQuery("aaa", "bbb", True, False)
    assert P("<MatchAllDocsQuery/>") == MatchAllDocsQuery()


def test_user_query_delegates_to_classic():
    q = P("<UserQuery>alpha AND beta</UserQuery>")
    assert q == BooleanQuery.build(
        must=[TermQuery("alpha"), TermQuery("beta")])


def test_span_tree():
    q = P("""
    <SpanNear slop="2" inOrder="false">
      <SpanTerm>alpha</SpanTerm>
      <SpanOr><SpanTerm>beta</SpanTerm><SpanTerm>gamma</SpanTerm></SpanOr>
    </SpanNear>""")
    assert q == SpanNearQuery(
        (SpanTermQuery("alpha"),
         SpanOrQuery((SpanTermQuery("beta"), SpanTermQuery("gamma")))),
        slop=2, in_order=False)
    assert P("""<SpanFirst end="3">
                  <SpanTerm>x</SpanTerm>
                </SpanFirst>""") == \
        SpanFirstQuery(SpanTermQuery("x"), end=3)
    assert P("""<SpanNot>
                  <Include><SpanTerm>x</SpanTerm></Include>
                  <Exclude><SpanTerm>y</SpanTerm></Exclude>
                </SpanNot>""") == \
        SpanNotQuery(SpanTermQuery("x"), SpanTermQuery("y"))
    assert P("<SpanOrTerms>Alpha beta</SpanOrTerms>") == \
        SpanOrQuery((SpanTermQuery("alpha"), SpanTermQuery("beta")))
    # BoostingTermQuery maps onto the span term (payload scoring is a
    # separate engine surface)
    assert P("<BoostingTermQuery>x</BoostingTermQuery>") == \
        SpanTermQuery("x")


def test_errors():
    with pytest.raises(XmlParserException):
        P("<NoSuchQuery>x</NoSuchQuery>")
    with pytest.raises(XmlParserException):
        P("<BooleanQuery><TermQuery>x</TermQuery></BooleanQuery>")
    with pytest.raises(XmlParserException):
        P("<SpanNear><TermQuery>x</TermQuery></SpanNear>")
    with pytest.raises(XmlParserException):
        P("<TermQuery></TermQuery>")
    with pytest.raises(XmlParserException):
        P("<SpanNot><Include><SpanTerm>x</SpanTerm></Include></SpanNot>")


def test_fuzz_found_edges():
    # empty Include/Exclude (was IndexError)
    with pytest.raises(XmlParserException):
        P("<SpanNot><Include></Include></SpanNot>")
    # bad numeric attribute (was ValueError)
    with pytest.raises(XmlParserException):
        P('<SpanFirst end="x"><SpanTerm>a</SpanTerm></SpanFirst>')
    # malformed XML (was ElementTree.ParseError)
    with pytest.raises(XmlParserException):
        P("<TermQuery>unclosed")


def test_seeded_fuzz_never_leaks_foreign_exceptions():
    import random

    from lucene_solr_ray.search.query import Query
    from lucene_solr_ray.search.spans import SpanQuery

    rng = random.Random(3)
    tags = ["TermQuery", "BooleanQuery", "Clause", "SpanNear", "SpanNot",
            "Include", "Exclude", "SpanTerm", "ConstantScoreQuery",
            "DisjunctionMaxQuery", "RangeQuery", "Bogus"]
    attrs = ["", ' boost="2"', ' occurs="must"', ' end="x"',
             ' slop="1"', ' occurs="junk"']

    def gen(depth):
        tag, at = rng.choice(tags), rng.choice(attrs)
        if depth <= 0 or rng.random() < 0.4:
            return f"<{tag}{at}>{rng.choice(['alpha', ''])}</{tag}>"
        kids = "".join(gen(depth - 1) for _ in range(rng.randint(0, 3)))
        return f"<{tag}{at}>{kids}</{tag}>"

    for _ in range(1500):
        try:
            q = P(gen(rng.randint(0, 4)))
            assert isinstance(q, (Query, SpanQuery))
        except XmlParserException:
            pass
