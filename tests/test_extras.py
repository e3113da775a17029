"""Secondary operators: DisMax, boost, rescorer, MLT, suggest, spellcheck,
highlighter."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import (
    BooleanQuery,
    BoostQuery,
    DisjunctionMaxQuery,
    IndexSearcher,
    TermQuery,
    highlight,
    more_like_this,
    rescore,
    spellcheck,
    suggest_prefix,
)
from lucene_solr_ray.sources import generate_table


@pytest.fixture(scope="module")
def xidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("xcorpus")
    tbl = generate_table(300, seed=5)
    pq.write_table(tbl, str(d / "c.parquet"), row_group_size=100)
    out = str(tmp_path_factory.mktemp("xindex"))
    build_index(str(d), out, rows_per_partition=100)
    return out, tbl["content"].to_pylist()


def test_dismax_semantics(xidx):
    idx, _ = xidx
    s = IndexSearcher(idx)
    qa, qb = TermQuery("return"), TermQuery("def")
    da, sa = s._score(qa)
    db, sb = s._score(qb)
    union = np.unique(np.concatenate([da, db]))
    a = np.zeros(union.size)
    b = np.zeros(union.size)
    a[np.searchsorted(union, da)] = sa
    b[np.searchsorted(union, db)] = sb
    # tie_breaker 0 -> pure max
    d0, s0 = s._score(DisjunctionMaxQuery((qa, qb), 0.0))
    np.testing.assert_allclose(s0, np.maximum(a, b), rtol=1e-6)
    # tie_breaker 1 -> sum
    d1, s1 = s._score(DisjunctionMaxQuery((qa, qb), 1.0))
    np.testing.assert_allclose(s1, a + b, rtol=1e-6)


def test_boost_scales_scores(xidx):
    idx, _ = xidx
    s = IndexSearcher(idx)
    d0, s0 = s._score(TermQuery("return"))
    d1, s1 = s._score(BoostQuery(TermQuery("return"), 2.0))
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_allclose(s1, s0 * np.float32(2.0), rtol=1e-7)


def test_rescorer_reorders_window(xidx):
    idx, _ = xidx
    s = IndexSearcher(idx)
    first = s.search(TermQuery("return"), k=20)
    out = rescore(s, first, TermQuery("def"), 1.0, 5.0, window=10)
    assert out.num_rows == first.num_rows
    assert set(out["doc_id"].to_pylist()) == set(first["doc_id"].to_pylist())
    # docs matching the rescore query rise within the window
    d_def = set(s._score(TermQuery("def"))[0].tolist())
    top = out["doc_id"].to_pylist()[:3]
    if d_def & set(first["doc_id"].to_pylist()[:10]):
        assert any(d in d_def for d in top)


def test_more_like_this_finds_self_similar(xidx):
    idx, texts = xidx
    s = IndexSearcher(idx)
    q = more_like_this(s, texts[5], min_term_freq=1, min_doc_freq=2)
    t = s.search(q, k=5)
    assert 5 in t["doc_id"].to_pylist()  # the source doc itself ranks high


def test_suggest_and_spellcheck(xidx):
    idx, _ = xidx
    s = IndexSearcher(idx)
    sug = suggest_prefix(s, "re", n=5).to_pydict()
    assert sug["term"], "prefix 're' should suggest (return...)"
    assert all(t.startswith("re") for t in sug["term"])
    assert sug["ttf"] == sorted(sug["ttf"], reverse=True)
    sp = spellcheck(s, "retorn", max_edits=1, n=5).to_pydict()
    assert "return" in sp["term"]


def test_highlight_window():
    text = "alpha beta the return value of return is gamma delta " * 3
    h = highlight(text, ["return", "value"], window_chars=60)
    assert "<em>return</em>" in h and len(h) < 200
    assert highlight("no hits here", ["zzz"]) == "no hits here"


def test_query_result_cache(xidx):
    idx, _ = xidx
    s = IndexSearcher(idx)
    q = TermQuery("return")
    a = s.search(q, k=7)
    assert ("qr", q, 7, None, False) in s._result_cache
    b = s.search(q, k=7)
    assert a is b  # cache hit returns the same table object
    c = s.search(q, k=8)
    assert c is not a


def test_highlight_results_end_to_end(tmp_path_factory, ray_session):
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher, TermQuery
    from lucene_solr_ray.search.extras import highlight_results
    from lucene_solr_ray.sources import generate_table

    d = tmp_path_factory.mktemp("hl_corpus")
    pq.write_table(generate_table(120, seed=71), str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("hl_idx"))
    build_index(str(d), out, rows_per_partition=60)
    s = IndexSearcher(out)
    q = TermQuery("return")
    res = s.search(q, k=5)
    t = highlight_results(s, q, res)
    assert t.num_rows == res.num_rows
    assert all("<em>" in sn and "return" in sn.lower()
               for sn in t["snippet"].to_pylist())


def test_spellcheck_collation(tmp_path_factory, ray_session):
    import pyarrow.parquet as pq

    from lucene_solr_ray.analysis import get_analyzer
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.extras import spellcheck_collate
    from lucene_solr_ray.sources import generate_table

    d = tmp_path_factory.mktemp("col_corpus")
    pq.write_table(generate_table(200, seed=81), str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("col_idx"))
    build_index(str(d), out, rows_per_partition=100)
    s = IndexSearcher(out)
    ana = get_analyzer("standard")
    # pick a real vocabulary term and mangle it (swap two letters)
    vocab = [t for t in s.reader.unique_terms()
             if len(t) >= 6 and t.isalpha() and s.doc_freq(t) >= 3]
    word = vocab[0]
    bad = word[:2] + word[3] + word[2] + word[4:]
    assert s.doc_freq(bad) == 0 or (bad := word[1:] + word[0])
    r = spellcheck_collate(s, f"retrun {bad}", ana)
    assert r["changed"]
    assert "return" in r["collation"]
    assert r["hits"] > 0
    # a clean query passes through unchanged
    r2 = spellcheck_collate(s, "return", ana)
    assert not r2["changed"] and r2["hits"] > 0


def test_canned_collectors(tmp_path_factory, ray_session):
    """Collector extension point with the canonical instances
    (search/collectors.py — TotalHitCount / TopN / ScoreHistogram /
    EarlyTerminating / FieldValueFacet vs the plain search path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher, TermQuery
    from lucene_solr_ray.search.collectors import (
        EarlyTerminating,
        FieldValueFacet,
        ScoreHistogram,
        TopN,
        TotalHitCount,
    )

    docs = [f"common {'rare ' if i % 3 == 0 else ''}w{i}"
            for i in range(30)]
    d = tmp_path_factory.mktemp("coll_src")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "content": pa.array(docs),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("coll_idx") / "idx")
    build_index(str(d), out, text_field="content", rows_per_partition=10)
    s = IndexSearcher(out)
    q = TermQuery("rare")
    assert s.collect(q, TotalHitCount()) == 10
    top = s.collect(q, TopN(3))
    ref = s.search(q, k=3)
    assert [d_ for d_, _ in top] == ref["doc_id"].to_pylist()
    hist = s.collect(q, ScoreHistogram(bins=5))
    assert hist.sum() == 10
    assert s.collect(q, EarlyTerminating(limit=4)) == 4
    lang_vals = np.asarray(["a" if i % 2 == 0 else "b"
                            for i in range(30)], dtype=object)
    facet = s.collect(q, FieldValueFacet(lang_vals))
    # rare docs are i % 3 == 0: evens {0,6,12,18,24}, odds {3,9,...,27}
    assert facet == {"a": 5, "b": 5}


def test_elevate_pins_docs_then_organic(xidx):
    from lucene_solr_ray.search.extras import elevate

    idx, _ = xidx
    s = IndexSearcher(idx)
    q = TermQuery("return")
    organic = s.search(q, k=10)["doc_id"].to_pylist()
    pinned = [organic[-1], organic[0]] if len(organic) >= 2 else organic
    t = elevate(s, q, pinned, k=5)
    got = t["doc_id"].to_pylist()
    assert got[: len(pinned)] == pinned
    assert t["elevated"].to_pylist()[: len(pinned)] == [1] * len(pinned)
    # organic fill excludes pinned and preserves organic order
    rest = [d for d in organic if d not in pinned]
    assert got[len(pinned):] == rest[: 5 - len(pinned)]


def test_blended_infix_suggester():
    import numpy as np
    from lucene_solr_ray.analysis import get_analyzer
    from lucene_solr_ray.search.suggester import BlendedInfixSuggester

    ana = get_analyzer("simple_nostop")
    s = BlendedInfixSuggester.from_pairs(
        [("fast merge join", 10.0), ("merge fast sort", 10.0),
         ("sort scan fast", 10.0), ("nothing here", 5.0)], ana)
    t = s.suggest("fa", ana, n=5).to_pandas()
    # reciprocal blender: pos 0 -> 10, pos 1 -> 5, pos 2 -> 3.33...
    assert t.surface.tolist() == [
        "fast merge join", "merge fast sort", "sort scan fast"]
    assert np.allclose(t.weight.tolist(), [10.0, 5.0, 10 / 3])

    # linear blender + multi-token query (all-terms-required semantics)
    s2 = BlendedInfixSuggester.from_pairs(
        [("alpha beta gamma", 10.0), ("beta gamma alpha", 10.0)], ana)
    s2.blender = "linear"
    t2 = s2.suggest("gamma al", ana, n=5).to_pandas()
    # best matched position: key1 min(pos(gamma)=2, pos(al*)=0)=0 -> 1.0
    # key2 min(pos(gamma)=1, pos(al*)=2)=1 -> 0.9
    assert t2.surface.tolist() == ["alpha beta gamma", "beta gamma alpha"]
    assert np.allclose(t2.weight.tolist(), [10.0, 9.0])


def test_common_terms_query(tmp_path_factory, ray_session):
    """CommonTermsQuery: rare terms drive the match set; common terms
    only add score; no-rare-terms degrades to plain OR."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher, TermQuery
    from lucene_solr_ray.search.extras import common_terms_query
    from lucene_solr_ray.search.query import BooleanQuery

    docs = (["common filler text"] * 40
            + ["common rareword payload", "rareword alone here"])
    d = tmp_path_factory.mktemp("ctq_src")
    pq.write_table(pa.table({
        "doc_key": pa.array(range(len(docs)), pa.int64()),
        "content": pa.array(docs),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("ctq_idx") / "idx")
    build_index(str(d), out, text_field="content", rows_per_partition=50)
    s = IndexSearcher(out)

    q = common_terms_query(s, ["common", "rareword"],
                           max_tf_fraction=0.2)
    got = set(s._docs_only(q).tolist())
    # ONLY the rareword docs match (common is score-only)
    assert got == {40, 41}
    # the common term still contributes score: doc 40 (has both) ranks
    # above doc 41 (rare only)
    docs_r, scores = s._score(q)
    r = {int(d): float(x) for d, x in zip(docs_r, scores)}
    assert r[40] > r[41]
    # all-common fallback = plain OR
    q2 = common_terms_query(s, ["common", "filler"],
                            max_tf_fraction=0.01)
    want = set(s._docs_only(BooleanQuery.build(
        should=[TermQuery("common"), TermQuery("filler")])).tolist())
    assert set(s._docs_only(q2).tolist()) == want


def test_sweetspot_similarity_plateau(tmp_path_factory, ray_session):
    """SweetSpotSimilarity: docs inside the length plateau outrank
    longer docs with the same tf/idf profile (misc/SweetSpotSimilarity
    computeLengthNorm)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.similarities import SweetSpotSimilarity

    docs = ["target one two",                       # len 3 (plateau)
            "target " + " ".join(f"w{i}" for i in range(30))]  # len 31
    d = tmp_path_factory.mktemp("ss_src")
    pq.write_table(pa.table({
        "doc_key": pa.array(range(len(docs)), pa.int64()),
        "content": pa.array(docs),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("ss_idx") / "idx")
    build_index(str(d), out, text_field="content", rows_per_partition=10)
    s = IndexSearcher(out)
    sim = SweetSpotSimilarity(ln_min=1, ln_max=5)
    union, scores = sim.score_or(s, ["target"])
    r = {int(d): float(x) for d, x in zip(union, scores)}
    assert r[0] > r[1]
    # plateau exactness: norm is 1.0 inside, < 1.0 outside
    assert np.allclose(sim.length_norm(np.array([1, 3, 5])), 1.0)
    assert (sim.length_norm(np.array([6, 10, 31])) < 1.0).all()


def test_complex_phrase_query(tmp_path_factory, ray_session):
    """ComplexPhraseQueryParser: wildcards inside quoted phrases expand
    against the dictionary into MultiPhrase slots."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.extras import complex_phrase_query

    docs = ["john smith works here", "jonah smith sleeps",
            "smith john reversed", "john smyth variant",
            "johannes brahms composer"]
    d = tmp_path_factory.mktemp("cpq_src")
    pq.write_table(pa.table({
        "doc_key": pa.array(range(len(docs)), pa.int64()),
        "content": pa.array(docs),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("cpq_idx") / "idx")
    build_index(str(d), out, text_field="content",
                store_positions=True, rows_per_partition=10)
    s = IndexSearcher(out)

    q = complex_phrase_query(s, "jo* smith")
    got = set(s._docs_only(q).tolist())
    assert got == {0, 1}  # john smith, jonah smith; NOT reversed/smyth

    q2 = complex_phrase_query(s, "john sm?th")
    assert set(s._docs_only(q2).tolist()) == {0, 3}

    # no expansion -> no match
    assert complex_phrase_query(s, "zz* smith") is None

    # plain phrase path still works (with slop)
    q3 = complex_phrase_query(s, "john works", slop=1)
    assert set(s._docs_only(q3).tolist()) == {0}


def test_elevation_excludes(tmp_path_factory, ray_session):
    """elevate.xml exclude='true' docs never surface, even when they
    rank organically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher, TermQuery
    from lucene_solr_ray.search.extras import elevate

    d = tmp_path_factory.mktemp("elx_src")
    pq.write_table(pa.table({
        "doc_key": pa.array(range(6), pa.int64()),
        "content": pa.array(["hit"] * 6),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("elx_idx") / "idx")
    build_index(str(d), out, text_field="content", rows_per_partition=10)
    s = IndexSearcher(out)
    t = elevate(s, TermQuery("hit"), [4], k=5, excluded_docs=[0, 1])
    docs = t["doc_id"].to_pylist()
    assert docs[0] == 4 and t["elevated"][0].as_py() == 1
    assert 0 not in docs and 1 not in docs
    assert len(docs) == 4  # 6 docs - 2 excluded, capped organically


def test_fuzzy_like_this(xidx):
    from lucene_solr_ray.search.extras import fuzzy_like_this
    from lucene_solr_ray.search.query import (
        BooleanQuery, BoostQuery, TermQuery,
    )

    idx, _ = xidx
    s = IndexSearcher(idx)
    q = fuzzy_like_this(s, "retur", max_edits=1, max_num_terms=8)
    clauses = dict((c.query.term if isinstance(c, BoostQuery) else c.term,
                    c.boost if isinstance(c, BoostQuery) else 1.0)
                   for _o, c in q.clauses)
    assert "return" in clauses and clauses["return"] < 1.0
    # exact vocabulary hit keeps boost 1.0 (plain TermQuery clause)
    q2 = fuzzy_like_this(s, "return", max_edits=1, max_num_terms=8)
    assert any(c == TermQuery("return") for _o, c in q2.clauses)
    # the query is searchable end-to-end
    assert s.search(q, k=5).num_rows > 0
    # unmatched text -> empty boolean
    q3 = fuzzy_like_this(s, "zzzzzzzzz", max_edits=1)
    assert q3 == BooleanQuery.build()
