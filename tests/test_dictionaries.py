"""Suggester dictionaries (spell/LuceneDictionary,
HighFrequencyDictionary, PlainTextDictionary): sources produce the
(keys, surfaces, weights) shape every suggester consumes."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.dictionaries import (
    high_frequency_dictionary,
    lucene_dictionary,
    plain_text_dictionary,
)
from lucene_solr_ray.search.suggester import AnalyzingSuggester


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    texts = ["common words appear"] * 8 + ["rare appearance"] * 1
    d = tmp_path_factory.mktemp("dict_src")
    tbl = pa.table({
        "repo": ["r"] * len(texts), "path": [str(i) for i in range(len(texts))],
        "commit": ["c"] * len(texts), "lang": ["t"] * len(texts),
        "content": texts,
    })
    pq.write_table(tbl, str(d / "a.parquet"))
    out = str(tmp_path_factory.mktemp("dict_idx"))
    build_index(str(d), out, rows_per_partition=50)
    return IndexSearcher(out)


def test_lucene_dictionary_weights_are_dfs(idx):
    terms, surfaces, dfs = lucene_dictionary(idx.reader)
    m = dict(zip(terms.tolist(), dfs.tolist()))
    assert m["common"] == 8 and m["rare"] == 1
    assert np.array_equal(terms, surfaces)


def test_high_frequency_threshold(idx):
    terms, _, dfs = high_frequency_dictionary(idx.reader, idx.max_doc,
                                              min_freq_ratio=0.5)
    assert set(terms.tolist()) == {"common", "words", "appear"}
    # threshold 0 keeps everything
    all_terms, _, _ = high_frequency_dictionary(idx.reader, idx.max_doc)
    assert all_terms.size == idx.reader.num_terms()


def test_plain_text_dictionary(tmp_path):
    p = tmp_path / "dict.txt"
    p.write_text("alpha\nbeta\n\n gamma \n")
    keys, surfaces, weights = plain_text_dictionary(str(p))
    assert keys.tolist() == ["alpha", "beta", "gamma"]
    assert weights.tolist() == [1, 1, 1]
    k2, _, _ = plain_text_dictionary(["x", " y "])
    assert k2.tolist() == ["x", "y"]


def test_dictionary_feeds_suggester(idx):
    keys, surfaces, dfs = high_frequency_dictionary(
        idx.reader, idx.max_doc, min_freq_ratio=0.5)
    sug = AnalyzingSuggester(keys, surfaces, dfs.astype(np.float64))
    t = sug.suggest("app", get_analyzer("simple"), n=3)
    assert "appear" in t["surface"].to_pylist()
