"""Golden parse tests mirroring the reference's
``queryparser/.../classic/TestQueryParser.java`` shapes (public grammar;
our Query dataclasses instead of Query.toString())."""

import pytest

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.search.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    BoostQuery,
    FieldedQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    parse_query,
)
from lucene_solr_ray.search.queryparser import ClassicQueryParser


@pytest.fixture(scope="module")
def ana():
    return get_analyzer("standard")


def P(text, ana, **kw):
    return ClassicQueryParser(ana, **kw).parse(text)


def test_single_and_default_or(ana):
    assert P("hello", ana) == TermQuery("hello")
    q = P("hello world", ana)
    assert q == BooleanQuery(
        ((SHOULD, TermQuery("hello")), (SHOULD, TermQuery("world"))))


def test_mods(ana):
    q = P("+cat -dog emu", ana)
    assert q.clauses == ((MUST, TermQuery("cat")),
                         (MUST_NOT, TermQuery("dog")),
                         (SHOULD, TermQuery("emu")))


def test_and_or_not_keywords(ana):
    q = P("cat AND dog", ana)
    assert q.clauses == ((MUST, TermQuery("cat")), (MUST, TermQuery("dog")))
    q = P("cat && dog", ana)
    assert q.clauses == ((MUST, TermQuery("cat")), (MUST, TermQuery("dog")))
    q = P("cat OR dog", ana)
    assert q.clauses == ((SHOULD, TermQuery("cat")), (SHOULD, TermQuery("dog")))
    q = P("cat AND NOT dog", ana)
    assert q.clauses == ((MUST, TermQuery("cat")), (MUST_NOT, TermQuery("dog")))
    # TestQueryParser: "a AND b OR c" -> +a +b c (classic retroactivity)
    q = P("cat AND dog OR emu", ana)
    assert q.clauses == ((MUST, TermQuery("cat")), (MUST, TermQuery("dog")),
                         (SHOULD, TermQuery("emu")))


def test_default_and_operator(ana):
    q = P("cat dog", ana, default_op="AND")
    assert q.clauses == ((MUST, TermQuery("cat")), (MUST, TermQuery("dog")))
    # OR demotes the previous clause under default-AND
    q = P("cat OR dog", ana, default_op="AND")
    assert q.clauses == ((SHOULD, TermQuery("cat")), (SHOULD, TermQuery("dog")))


def test_parens_nesting(ana):
    q = P("(cat OR dog) AND -emu", ana)
    inner = BooleanQuery(((SHOULD, TermQuery("cat")),
                          (SHOULD, TermQuery("dog"))))
    assert q.clauses == ((MUST, inner), (MUST_NOT, TermQuery("emu")))
    q = P("((cat))", ana)
    assert q == TermQuery("cat")


def test_boost(ana):
    assert P("term^2", ana) == BoostQuery(TermQuery("term"), 2.0)
    assert P("term^0.5", ana) == BoostQuery(TermQuery("term"), 0.5)
    q = P("(cat dog)^3", ana)
    assert isinstance(q, BoostQuery) and q.boost == 3.0
    q = P('"cat dog"^2', ana)
    assert q == BoostQuery(PhraseQuery(("cat", "dog")), 2.0)


def test_fuzzy(ana):
    assert P("roam~", ana) == FuzzyQuery("roam", 2)
    assert P("roam~1", ana) == FuzzyQuery("roam", 1)
    assert P("roam~2", ana) == FuzzyQuery("roam", 2)
    # fuzzy + boost, reference order term~n^b
    assert P("roam~1^3", ana) == BoostQuery(FuzzyQuery("roam", 1), 3.0)


def test_phrase_and_slop(ana):
    assert P('"hello world"', ana) == PhraseQuery(("hello", "world"))
    assert P('"hello world"~2', ana) == PhraseQuery(("hello", "world"),
                                                    slop=2)


def test_ranges(ana):
    assert P("[a TO b]", ana) == TermRangeQuery("a", "b", True, True)
    assert P("{a TO b}", ana) == TermRangeQuery("a", "b", False, False)
    assert P("[a TO b}", ana) == TermRangeQuery("a", "b", True, False)
    assert P("[* TO b]", ana) == TermRangeQuery(None, "b", True, True)
    assert P("[a TO *]", ana) == TermRangeQuery("a", None, True, True)


def test_wildcards(ana):
    assert P("pre*", ana) == PrefixQuery("pre")
    assert P("w?ld*", ana) == WildcardQuery("w?ld*")
    assert P("TERM*", ana) == PrefixQuery("term")  # lowercased, unanalyzed
    assert P("/ab+c/", ana) == RegexpQuery("ab+c")


def test_stopword_clause_vanishes(ana):
    # "the" is in the standard stop set
    assert P("the hello", ana) == TermQuery("hello")
    assert P("the", ana) == BooleanQuery((), 0)


def test_field_routing(ana):
    q = P("lang:en hello", ana, fields={"lang", "content"})
    assert q.clauses[0] == (SHOULD, FieldedQuery("lang", TermQuery("en")))
    q = P("lang:(cat OR dog)", ana, fields={"lang"})
    assert isinstance(q, FieldedQuery) and q.field == "lang"
    # no field set (single-field index): prefix dropped
    assert P("lang:en", ana) == TermQuery("en")


def test_escapes(ana):
    # UAX#29 keeps ':' between letters (MidLetter) -> one token
    assert P(r"foo\:bar", ana, fields=set()) == TermQuery("foo:bar")
    # escaped special char; the 'a' stopword drops, leaving one token —
    # a single-term phrase collapses to TermQuery (Lucene behavior)
    q = P(r'"a\"b"', ana)
    assert q == TermQuery("b")


def test_multiword_clause_is_phrase(ana):
    # analyzer splits "hash-join" -> classic parser emits a phrase
    assert P("hash-join", ana, fields=set()) != TermQuery("hash")


def test_parse_query_compat(ana):
    # the public entry point routes through the classic parser
    q = parse_query("+table -join", ana)
    assert q.clauses == ((MUST, TermQuery("table")),
                         (MUST_NOT, TermQuery("join")))
    assert parse_query('"stream scan"', ana) == PhraseQuery(
        ("stream", "scan"))


def test_errors(ana):
    with pytest.raises(ValueError):
        P("(cat OR dog", ana)
    with pytest.raises(ValueError):
        P('"unterminated', ana)
    with pytest.raises(ValueError):
        P("cat) dog", ana)


def test_min_should_match_spec():
    """Solr mm grammar (SolrPluginUtils.calculateMinShouldMatch)."""
    from lucene_solr_ray.search.queryparser import parse_min_should_match

    assert parse_min_should_match("3", 5) == 3
    assert parse_min_should_match("-2", 5) == 3
    assert parse_min_should_match("75%", 4) == 3
    assert parse_min_should_match("75%", 5) == 3     # floor
    assert parse_min_should_match("-25%", 4) == 3
    # conditionals: n<spec applies when clause_count > n, largest n wins
    spec = "2<-25% 9<-3"
    assert parse_min_should_match(spec, 2) == 2      # <=2: all required
    assert parse_min_should_match(spec, 8) == 6      # -25% of 8
    assert parse_min_should_match(spec, 12) == 9     # -3 of 12
    # clamped to the clause count
    assert parse_min_should_match("99", 4) == 4
    assert parse_min_should_match("", 7) == 0


def test_pure_negative_top_level(tmp_path_factory, ray_session):
    """Solr's fixNegativeQuery: '-fox' at the top level matches every
    doc EXCEPT fox docs (raw Lucene would match nothing); nested pure
    negatives keep Lucene semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.analysis import get_analyzer
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher, parse_query

    d = tmp_path_factory.mktemp("pn_src")
    pq.write_table(pa.table({
        "doc_key": pa.array([0, 1, 2], pa.int64()),
        "content": pa.array(["fox here", "dog there", "cat alone"]),
    }), str(d / "x.parquet"))
    out = str(tmp_path_factory.mktemp("pn_idx") / "idx")
    build_index(str(d), out, text_field="content", rows_per_partition=10)
    s = IndexSearcher(out)
    ana = get_analyzer("standard")

    assert s._docs_only(parse_query("-fox", ana)).tolist() == [1, 2]
    assert s._docs_only(parse_query("-fox -dog", ana)).tolist() == [2]
    # positive+negative unchanged
    assert s._docs_only(parse_query("dog -fox", ana)).tolist() == [1]


def test_matchall_clause_in_boolean(ana):
    """'*:*' maps to MatchAllDocsQuery, standalone and composed inside
    a boolean tree (a composite q like '*:* AND lang:en' must keep its
    match-all clause, not have the substring stripped)."""
    from lucene_solr_ray.search.query import MatchAllDocsQuery

    p = ClassicQueryParser(ana)
    assert isinstance(p.parse("*:*"), MatchAllDocsQuery)
    q = p.parse("*:* AND beta")
    assert isinstance(q, BooleanQuery)
    occs = [(occ, type(sub).__name__) for occ, sub in q.clauses]
    assert ("MUST", "MatchAllDocsQuery") in occs
    assert ("MUST", "TermQuery") in occs
