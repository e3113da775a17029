"""WordBreakSpellChecker (suggest/spell): break/combine suggestions
with frequency floors, suggest modes, and evaluation bounds."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.wordbreak import (
    NUM_CHANGES_THEN_SUMMED_FREQUENCY,
    SUGGEST_MORE_POPULAR,
    WordBreakSpellChecker,
)


@pytest.fixture(scope="module")
def wb(tmp_path_factory, ray_session):
    texts = (["hash join merge sort"] * 6
             + ["hash table lookup"] * 3
             + ["database index"] * 2
             + ["data base"] * 4)
    d = tmp_path_factory.mktemp("wb_src")
    tbl = pa.table({
        "repo": ["r"] * len(texts),
        "path": [f"f{i}" for i in range(len(texts))],
        "commit": ["c"] * len(texts),
        "lang": ["t"] * len(texts),
        "content": texts,
    })
    pq.write_table(tbl, str(d / "a.parquet"))
    out = str(tmp_path_factory.mktemp("wb_idx"))
    build_index(str(d), out, rows_per_partition=50)
    return WordBreakSpellChecker(IndexSearcher(out),
                                 min_break_word_length=2)


def test_break_compound(wb):
    sugg = wb.suggest_word_breaks("hashjoin")
    assert sugg and sugg[0].words == ("hash", "join")
    assert sugg[0].freqs == (9, 6) and sugg[0].changes == 1


def test_break_skips_indexed_terms(wb):
    assert wb.suggest_word_breaks("database") == []  # already a word
    assert wb.suggest_word_breaks("zzzqqq") == []    # no valid parts


def test_break_two_changes(wb):
    wb2 = WordBreakSpellChecker(wb.searcher, max_changes=2,
                                min_break_word_length=2)
    sugg = wb2.suggest_word_breaks("hashjoinmerge")
    assert ("hash", "join", "merge") in [s.words for s in sugg]
    # 1-change limit cannot reach the 3-part split
    assert all(len(s.words) == 2 for s in
               wb.suggest_word_breaks("hashjoinmerge")) or \
        wb.suggest_word_breaks("hashjoinmerge") == []


def test_sort_methods(wb):
    a = wb.suggest_word_breaks(
        "hashjoin", sort_method=NUM_CHANGES_THEN_SUMMED_FREQUENCY)
    assert a[0].words == ("hash", "join")


def test_combinations(wb):
    sugg = wb.suggest_word_combinations(["data", "base", "index"])
    assert sugg and sugg[0].word == "database"
    assert sugg[0].span == (0, 2) and sugg[0].freq == 2


def test_more_popular_mode(wb):
    # 'database' (df 2) must beat max(df(data)=4, df(base)=4) -> rejected
    assert wb.suggest_word_combinations(
        ["data", "base"], suggest_mode=SUGGEST_MORE_POPULAR) == []


def test_evaluation_bound(wb):
    tiny = WordBreakSpellChecker(wb.searcher, max_evaluations=1,
                                 min_break_word_length=2)
    # bound respected: at most one df probe pair -> at most one result
    assert len(tiny.suggest_word_breaks("hashjoin")) <= 1
