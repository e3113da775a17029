"""Miscellaneous filter family + phonetic matching (the Solr
miscellaneous/ and phonetic/ packages)."""

import numpy as np
import pyarrow as pa

from lucene_solr_ray.analysis.analyzers import StandardAnalyzer
from lucene_solr_ray.analysis.misc import (
    FilterChainAnalyzer,
    join_hyphenations,
    keep_words,
    keyword_overrides,
    length_filter,
    pattern_replace,
    remove_duplicates,
    trim_token,
    truncate_token,
)
from lucene_solr_ray.analysis.phonetic import PhoneticAnalyzer, soundex


def test_per_token_filters():
    assert length_filter(3, 5)("ab") is None
    assert length_filter(3, 5)("abcde") == "abcde"
    assert length_filter(3, 5)("abcdef") is None
    assert keep_words({"ray", "data"})("spark") is None
    assert keep_words({"ray"})("ray") == "ray"
    assert trim_token("  x ") == "x"
    assert trim_token("   ") is None
    assert truncate_token(3)("abcdef") == "abc"
    f = pattern_replace(r"\d+", "#")
    assert f("abc123def45") == "abc#def#"
    assert pattern_replace(r".*", "")("xyz") is None


def test_keyword_overrides_wraps_stemmer():
    from lucene_solr_ray.analysis.filters import porter_stem

    f = keyword_overrides(porter_stem, keywords={"running"},
                          overrides={"mice": "mouse"})
    assert f("running") == "running"       # KeywordMarker bypass
    assert f("mice") == "mouse"            # StemmerOverride
    assert f("jumping") == porter_stem("jumping")


def test_stream_filters():
    t, p = remove_duplicates(["a", "a", "b", "a"], [0, 0, 1, 2])
    assert (t, p) == (["a", "b", "a"], [0, 1, 2])
    t, p = join_hyphenations(["hyphen-", "ated", "word"], [0, 1, 2])
    assert (t, p) == (["hyphenated", "word"], [0, 2])


def test_filter_chain_analyzer_positions():
    an = FilterChainAnalyzer(
        "misc_test", StandardAnalyzer(stop_words=()),
        token_filters=[length_filter(2, 100)],
        stream_filters=[remove_duplicates],
    )
    toks, pos = an.tokens_with_positions("a bb cc bb")
    # "a" dropped with a position gap preserved
    assert toks == ["bb", "cc", "bb"]
    assert pos == [1, 2, 3]


def test_soundex_canonical_vectors():
    # the NARA standard's published examples
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"   # H transparent
    assert soundex("Ashcroft") == "A261"
    assert soundex("Tymczak") == "T522"    # vowel separates same codes
    assert soundex("Pfister") == "P236"    # Pf collapses
    assert soundex("Honeyman") == "H555"
    assert soundex("Lee") == "L000"
    assert soundex("Wu") == "W000"
    assert soundex("") == ""
    assert soundex("123") == ""


def test_phonetic_analyzer_inject():
    an = PhoneticAnalyzer()
    toks, pos = an.tokens_with_positions("Robert called")
    # original + code at the SAME position (posIncr-0 twin)
    assert toks == ["robert", "R163", "called", "C430"]
    assert pos == [0, 0, 1, 1]
    no_inject = PhoneticAnalyzer(inject=False)
    assert no_inject.tokens("Robert called") == ["R163", "C430"]


def test_phonetic_index_search_end_to_end(tmp_path_factory, ray_session):
    """Phonetic index: misspelled name queries hit via the injected
    Soundex twin (Solr's PhoneticFilterFactory use case)."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.analysis.analyzers import get_analyzer
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher, TermQuery

    d = tmp_path_factory.mktemp("phon_corpus")
    pq.write_table(pa.table({
        "doc_key": pa.array([0, 1], pa.int64()),
        "content": pa.array(["robert smith", "alice jones"]),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("phon_idx") / "idx")
    build_index(str(d), out, text_field="content", analyzer="phonetic",
                rows_per_partition=10)
    s = IndexSearcher(out)
    ana = get_analyzer("phonetic")
    # "Rupert Smyth" -> codes R163 S530 match doc 0's injected codes
    q_terms = [t for t in ana.tokens("Rupert") if t != "rupert"]
    hits = s.search(TermQuery(q_terms[0]), k=10)
    assert {int(h) for h in hits["doc_id"].to_numpy()} == {0}


def test_reversed_wildcard_leading_pattern(tmp_path_factory, ray_session):
    """Leading-wildcard queries over a ReversedWildcardAnalyzer index
    return exactly what a plain index's full-dictionary scan returns,
    via the marker-prefix range scan (ReversedWildcardFilterFactory)."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.analysis.misc import (
        REVERSE_MARKER,
        ReversedWildcardAnalyzer,
    )
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.query import WildcardQuery

    d = tmp_path_factory.mktemp("revw_corpus")
    texts = ["indexing searching", "parser tokenizer", "scanner testing",
             "merging walking", "nothing here"]
    pq.write_table(pa.table({
        "doc_key": pa.array(list(range(len(texts))), pa.int64()),
        "content": pa.array(texts),
    }), str(d / "docs.parquet"))

    plain_out = str(tmp_path_factory.mktemp("revw_plain") / "idx")
    rev_out = str(tmp_path_factory.mktemp("revw_rev") / "idx")
    build_index(str(d), plain_out, text_field="content",
                rows_per_partition=10)
    build_index(str(d), rev_out, text_field="content",
                analyzer=ReversedWildcardAnalyzer(),
                rows_per_partition=10)

    s_plain = IndexSearcher(plain_out)
    s_rev = IndexSearcher(rev_out)
    assert s_rev._reversed_terms_available()
    assert not s_plain._reversed_terms_available()
    for pattern in ["*ing", "*ser", "?canner", "*arch*", "*"]:
        want = {int(x) for x in
                s_plain._docs_only(WildcardQuery(pattern))}
        got = {int(x) for x in s_rev._docs_only(WildcardQuery(pattern))}
        assert got == want, pattern
    # the rewrite really used marker terms (range path, not full scan)
    terms = s_rev._rewrite_terms(WildcardQuery("*ing"))
    assert terms and all(t.startswith(REVERSE_MARKER) for t in terms)
