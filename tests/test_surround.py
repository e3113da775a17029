"""Surround query language: grammar, rewrite semantics, span equivalence.

Mirrors the reference surround parser's behavior
(lucene/queryparser/.../surround/parser/QueryParser.jj and
query/DistanceQuery.java) via the engine's span algebra.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    TermQuery,
)
from lucene_solr_ray.search.spans import (
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucene_solr_ray.search.surround import (
    SrndOp,
    SrndTerm,
    SurroundSyntaxError,
    TooManyBasicQueries,
    parse_surround,
    surround_query,
    surround_search,
)

DOCS = [
    "alpha beta gamma delta",          # 0
    "alpha gamma beta",                # 1
    "beta alpha xx gamma",             # 2
    "gamma yy alpha beta zz",          # 3
    "alpha alpha beta",                # 4
    "delta epsilon",                   # 5
    "gammaray burst",                  # 6
]


@pytest.fixture(scope="module")
def sidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("surcorpus")
    tbl = pa.table({
        "repo": pa.array(["r"] * len(DOCS)),
        "path": pa.array([f"p{i}" for i in range(len(DOCS))]),
        "commit": pa.array(["c"] * len(DOCS)),
        "lang": pa.array(["txt"] * len(DOCS)),
        "content": pa.array(DOCS),
    })
    pq.write_table(tbl, str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("surindex"))
    build_index(str(d), out, rows_per_partition=10, store_positions=True)
    return IndexSearcher(out)


# ---------------------------------------------------------------- grammar

def test_precedence_or_and_not_w():
    # W binds tighter than NOT, NOT tighter than AND, AND tighter than OR
    ast = parse_surround("a OR b AND c NOT d W e")
    assert ast == SrndOp("or", (
        SrndTerm("a"),
        SrndOp("and", (
            SrndTerm("b"),
            SrndOp("not", (
                SrndTerm("c"),
                SrndOp("w", (SrndTerm("d"), SrndTerm("e")), 1),
            )),
        )),
    ))


def test_prefix_form_equals_infix():
    assert parse_surround("AND(a, b)") == parse_surround("a AND b")
    assert parse_surround("OR(a, b, c)") == parse_surround("a OR b OR c")
    assert parse_surround("3W(a, b)") == parse_surround("a 3W b")
    assert parse_surround("N(a, b)") == parse_surround("a n b")


def test_distance_defaults_and_case():
    assert parse_surround("a w b") == SrndOp(
        "w", (SrndTerm("a"), SrndTerm("b")), 1)
    assert parse_surround("a 5N b") == SrndOp(
        "n", (SrndTerm("a"), SrndTerm("b")), 5)


def test_chain_flattens_same_distance():
    ast = parse_surround("a W b W c")
    assert ast == SrndOp(
        "w", (SrndTerm("a"), SrndTerm("b"), SrndTerm("c")), 1)


def test_quoted_term_and_boost():
    ast = parse_surround('"hash join"^2 OR x')
    assert ast.children[0] == SrndTerm("hash join", quoted=True, weight=2.0)


def test_syntax_errors():
    for bad in ("", "a OR", "(a", "NOT a", "W(a)", "a AND", "a,b"):
        with pytest.raises(SurroundSyntaxError):
            parse_surround(bad)


# ---------------------------------------------------------------- rewrite

def test_rewrite_boolean_shapes():
    q = surround_query("a AND b NOT c")
    assert q == BooleanQuery.build(must=[
        TermQuery("a"),
        BooleanQuery.build(must=[TermQuery("b")],
                           must_not=[TermQuery("c")]),
    ])
    assert surround_query("Alpha^1.5") == BoostQuery(TermQuery("alpha"), 1.5)


def test_rewrite_distance_shapes():
    q = surround_query("3W(a, OR(b, c))")
    assert q == SpanNearQuery(
        (SpanTermQuery("a"),
         SpanOrQuery((SpanTermQuery("b"), SpanTermQuery("c")))),
        slop=2, in_order=True)
    qn = surround_query("a 2n b")
    assert qn == SpanNearQuery(
        (SpanTermQuery("a"), SpanTermQuery("b")), slop=1, in_order=False)


def test_rewrite_rejects_illegal_distance_subqueries():
    with pytest.raises(SurroundSyntaxError):
        surround_query("W(a AND b, c)")
    with pytest.raises(SurroundSyntaxError):
        surround_query("N(a NOT b, c)")
    with pytest.raises(SurroundSyntaxError):
        surround_query("W(a^2, b)")


# ------------------------------------------------------- index semantics

def docs_of(s, q):
    d, _ = s._score(q)
    return sorted(d.tolist())


def test_w_matches_ordered_adjacency(sidx):
    q = surround_query("alpha W beta")
    assert docs_of(sidx, q) == [0, 3, 4]
    q2 = surround_query("2W(alpha, beta)")
    assert docs_of(sidx, q2) == [0, 1, 3, 4]


def test_n_matches_unordered(sidx):
    q = surround_query("alpha N beta")
    assert docs_of(sidx, q) == [0, 2, 3, 4]


def test_w_scores_match_phrase_scorer(sidx):
    """W(adjacent, ordered) ranks exactly like ExactPhraseScorer."""
    from lucene_solr_ray.search.query import PhraseQuery

    sd, ss = sidx._score(surround_query("alpha w beta"))
    pd_, ps = sidx._score_phrase(PhraseQuery(("alpha", "beta")))
    assert sd.tolist() == pd_.tolist()
    assert ss == pytest.approx(ps.tolist(), rel=1e-6)


def test_boolean_of_spans(sidx):
    # distance result usable as a boolean clause
    q = surround_query("gamma AND (alpha W beta)")
    assert docs_of(sidx, q) == [0, 3]
    qn = surround_query("alpha NOT (alpha w beta)")
    assert docs_of(sidx, qn) == [1, 2]


def test_truncation_expansion(sidx):
    q = surround_query("gamma* OR epsilon", sidx)
    assert docs_of(sidx, q) == [0, 1, 2, 3, 5, 6]
    # truncation inside a distance op expands to SpanOr
    qs = surround_query("W(alpha, bet*)", sidx)
    assert docs_of(sidx, qs) == [0, 3, 4]
    # embedded wildcard (SrndTruncQuery)
    qt = surround_query("g?mma", sidx)
    assert docs_of(sidx, qt) == [0, 1, 2, 3]


def test_too_many_basic_queries(sidx):
    with pytest.raises(TooManyBasicQueries):
        surround_query("a* OR b* OR g*", sidx, max_basic_queries=2)
    with pytest.raises(SurroundSyntaxError):
        surround_query("a*")  # truncation without a searcher


def test_surround_search_topk(sidx):
    res = surround_search(sidx, "alpha w beta", k=2)
    assert isinstance(res, pa.Table) and res.num_rows == 2


def test_depth_cap_and_flat_chains():
    import time

    with pytest.raises(SurroundSyntaxError):
        parse_surround("(" * 200 + "a" + ")" * 200)
    # flat same-op chains flatten in O(n)
    t0 = time.time()
    ast = parse_surround(" OR ".join(["beta"] * 5000))
    assert time.time() - t0 < 5.0
    assert len(ast.children) == 5000
    with pytest.raises(TooManyBasicQueries):
        surround_query(" OR ".join(["beta"] * 5000))  # > max_basic_queries
