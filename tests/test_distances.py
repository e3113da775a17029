"""StringDistance family (suggest/spell): reference-faithful values and
the distance-ranked spellcheck ordering."""

import pytest

from lucene_solr_ray.search.distances import (
    jaro_winkler_distance,
    levenshtein_distance,
    lucene_levenshtein_distance,
    ngram_distance,
)


def test_identity_and_empty():
    for f in (levenshtein_distance, jaro_winkler_distance,
              lambda a, b: ngram_distance(a, b)):
        assert f("same", "same") == pytest.approx(1.0)
        assert f("", "") == pytest.approx(1.0) or f("", "") == 0.0
    assert lucene_levenshtein_distance("same", "same") == \
        pytest.approx(1.0)


def test_levenshtein_normalization():
    # 1 edit over max(5,4)=5
    assert levenshtein_distance("hello", "hell") == pytest.approx(0.8)
    assert levenshtein_distance("abc", "xyz") == pytest.approx(0.0)


def test_lucene_levenshtein_transposition_and_min_norm():
    # one transposition counts 1; normalized by MIN length (4): 0.75
    assert lucene_levenshtein_distance("spell", "speel") == \
        pytest.approx(1 - 1 / 5)
    assert lucene_levenshtein_distance("ab", "ba") == \
        pytest.approx(1 - 1 / 2)
    # min-length normalization quirk (the merge-compat behavior)
    assert lucene_levenshtein_distance("abcd", "ab") == \
        pytest.approx(0.0)  # distance 2 / min 2


def test_jaro_winkler_known_values():
    # classic published pairs (Winkler 1990)
    assert jaro_winkler_distance("MARTHA", "MARHTA") == \
        pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler_distance("DIXON", "DICKSONX") == \
        pytest.approx(0.8133, abs=1e-3)
    assert jaro_winkler_distance("abc", "xyz") == 0.0


def test_ngram_distance_behaviour():
    assert ngram_distance("hello", "hello") == pytest.approx(1.0)
    a = ngram_distance("hello", "hallo")
    b = ngram_distance("hello", "world")
    assert a > b
    # short-string path
    assert ngram_distance("a", "a") == pytest.approx(1.0)
    assert ngram_distance("a", "b") == 0.0


def test_spellcheck_ranked(tmp_path_factory, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.distances import spellcheck_ranked

    texts = ["spell checker"] * 5 + ["spill the beans"] * 2 \
        + ["spoke and wheel"]
    d = tmp_path_factory.mktemp("dist_src")
    tbl = pa.table({
        "repo": ["r"] * len(texts), "path": [str(i) for i in range(len(texts))],
        "commit": ["c"] * len(texts), "lang": ["t"] * len(texts),
        "content": texts,
    })
    pq.write_table(tbl, str(d / "a.parquet"))
    out = str(tmp_path_factory.mktemp("dist_idx"))
    build_index(str(d), out, rows_per_partition=50)
    t = spellcheck_ranked(IndexSearcher(out), "spel", n=3)
    assert t["term"][0].as_py() == "spell"
    scores = t["score"].to_pylist()
    assert scores == sorted(scores, reverse=True)
