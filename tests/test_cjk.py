"""CJK analysis chain + ICU folding (analysis/cjk.py) golden-token tests
mirroring the reference's TestCJKAnalyzer / TestCJKWidthFilter /
TestICUFoldingFilter vectors, plus an end-to-end index/search pass."""

import pyarrow as pa
import pytest

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.analysis.cjk import cjk_bigrams, cjk_width_fold, icu_fold


def test_width_fold_fullwidth_ascii():
    assert cjk_width_fold("Ｔｅｓｔ　１２３４") == "Test 1234"


def test_width_fold_halfwidth_katakana_composition():
    # TestCJKWidthFilter: halfwidth katakana folds to fullwidth; voiced
    # marks compose (ｶﾞ -> ガ, ﾊﾟ -> パ)
    assert cjk_width_fold("ｶﾀｶﾅ") == "カタカナ"
    assert cjk_width_fold("ｳﾞｨｯﾂ") == "ヴィッツ"
    assert cjk_width_fold("ﾊﾟﾅｿﾆｯｸ") == "パナソニック"


def test_bigrams_han():
    # TestCJKAnalyzer.testJa1-style: consecutive Han chars bigram
    a = get_analyzer("cjk")
    assert a.tokens("日本語検索") == ["日本", "本語", "語検", "検索"]


def test_bigrams_across_scripts_and_whitespace():
    # buffer spans Hiragana/Katakana/Han and whitespace (posIncr 1)
    a = get_analyzer("cjk")
    assert a.tokens("のテキスト検索") == [
        "のテ", "テキ", "キス", "スト", "ト検", "検索"]
    assert a.tokens("カナ バイト") == ["カナ", "ナバ", "バイ", "イト"]


def test_lone_cjk_char_is_unigram():
    a = get_analyzer("cjk")
    assert a.tokens("中 hello") == ["中", "hello"]


def test_non_cjk_passthrough_lowercased_with_stops():
    a = get_analyzer("cjk")
    assert a.tokens("The Search 検索 Engine") == ["search", "検索",
                                                 "engine"]


def test_bigram_positions_sequential():
    a = get_analyzer("cjk")
    toks, pos = a.tokens_with_positions("多くの人々")
    assert toks == ["多く", "くの", "の人", "人々"]
    assert pos == [0, 1, 2, 3]


def test_hangul_bigrams():
    a = get_analyzer("cjk")
    assert a.tokens("한국어") == ["한국", "국어"]


def test_icu_fold_vectors():
    # ICUFoldingFilter: accents, case, compat forms, non-decomposables
    assert icu_fold("Résumé") == "resume"
    assert icu_fold("Über") == "uber"
    assert icu_fold("ﬁnance") == "finance"
    assert icu_fold("Ｆｕｌｌ") == "full"
    assert icu_fold("straße") == "strasse"
    assert icu_fold("Ødegård") == "odegard"
    assert icu_fold("Œuvre") == "oeuvre"
    assert icu_fold("Łódź") == "lodz"


def test_icu_analyzer_batch_matches_scalar():
    a = get_analyzer("icu_folded")
    texts = ["Über Café", "naïve ﬁles", "Ｔｏｋｙｏ tower"]
    t, d, p = a.tokens_batch(texts)
    flat = []
    for x in texts:
        flat.extend(a.tokens(x))
    assert t == flat


def test_cjk_index_and_search(tmp_path_factory, ray_session):
    """Full Ray path: build a positional index with analyzer='cjk' and
    run term + phrase queries over the bigrammed postings."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index, merge_index
    from lucene_solr_ray.search import IndexSearcher, TermQuery
    from lucene_solr_ray.search.query import PhraseQuery

    d = tmp_path_factory.mktemp("cjk_src")
    docs = [
        "日本語のテキスト検索エンジン",
        "検索は楽しい",
        "hello world",
        "全文検索エンジンの実装",
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("cjk_idx") / "idx")
    build_index(str(d), out, text_field="text", analyzer="cjk",
                rows_per_partition=2, store_positions=True)
    merge_index(out)
    s = IndexSearcher(out)
    hits = s.search(TermQuery("検索"), k=10)
    assert set(hits["doc_id"].to_pylist()) == {0, 1, 3}
    # phrase over bigrams: 検索エンジン == bigram sequence 検索 索エ エン ンジ ジン
    q = PhraseQuery(get_analyzer("cjk").tokens("検索エンジン"))
    hits = s.search(q, k=10)
    assert set(hits["doc_id"].to_pylist()) == {0, 3}
    # docs where 検索 is present but not followed by エンジン are excluded
    assert 1 not in set(hits["doc_id"].to_pylist())
