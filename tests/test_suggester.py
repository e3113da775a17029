"""AnalyzingSuggester: analyzed-key matching, weight ranking, Ray build."""

import pyarrow as pa
import ray.data as rd

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.search.suggester import (
    AnalyzingInfixSuggester,
    AnalyzingSuggester,
    FreeTextSuggester,
    FuzzySuggester,
)

PAIRS = [
    ("The Ghost Writer", 50.0),
    ("Ghostbusters", 100.0),
    ("ghost stories", 20.0),
    ("The Godfather", 80.0),
]


def test_analyzed_prefix_and_weights():
    ana = get_analyzer("standard")
    sug = AnalyzingSuggester.from_pairs(PAIRS, ana)
    # "The" is a stopword: "The Ghost Writer" keys as "ghost writer"
    t = sug.suggest("gho", ana)
    assert t["surface"].to_pylist() == [
        "Ghostbusters", "The Ghost Writer", "ghost stories"]
    assert t["weight"].to_pylist() == [100.0, 50.0, 20.0]
    # stopword dropped from the input: "the ghost" keys as "ghost"
    t2 = sug.suggest("the ghost", ana)
    assert t2["surface"].to_pylist() == [
        "Ghostbusters", "The Ghost Writer", "ghost stories"]
    # true multi-token analyzed prefix
    t3 = sug.suggest("ghost wr", ana)
    assert t3["surface"].to_pylist() == ["The Ghost Writer"]
    assert sug.suggest("zzz", ana).num_rows == 0


def test_infix_any_position():
    ana = get_analyzer("standard")
    sug = AnalyzingInfixSuggester.from_pairs(PAIRS, ana)
    # "wr" matches the SECOND token of "ghost writer"
    t = sug.suggest("wr", ana)
    assert t["surface"].to_pylist() == ["The Ghost Writer"]
    # first-token prefix still works, ranked by weight
    t2 = sug.suggest("gho", ana)
    assert t2["surface"].to_pylist() == [
        "Ghostbusters", "The Ghost Writer", "ghost stories"]
    # multi-token: earlier tokens exact, last is a prefix
    t3 = sug.suggest("stories gh", ana)
    assert t3["surface"].to_pylist() == ["ghost stories"]
    # exact-token requirement: "ghos" is not a full token of any key
    assert sug.suggest("ghos wr", ana).num_rows == 0
    assert sug.suggest("zzz", ana).num_rows == 0


def test_fuzzy_one_edit():
    ana = get_analyzer("standard")
    sug = FuzzySuggester.from_pairs(PAIRS, ana)
    # one deletion: "gost" ~ "ghost..."
    t = sug.suggest("gost", ana)
    assert t["surface"].to_pylist() == [
        "Ghostbusters", "The Ghost Writer", "ghost stories"]
    assert t["weight"].to_pylist() == [100.0, 50.0, 20.0]
    # one substitution at the tail
    assert sug.suggest("ghosr", ana)["surface"].to_pylist() == [
        "Ghostbusters", "The Ghost Writer", "ghost stories"]
    # two edits exceed maxEdits=1
    assert sug.suggest("gsot", ana).num_rows == 0
    # nonFuzzyPrefix=1: a wrong FIRST char never matches
    assert sug.suggest("xhost", ana).num_rows == 0


def test_fuzzy_short_input_is_exact_prefix():
    ana = get_analyzer("standard")
    sug = FuzzySuggester.from_pairs(PAIRS, ana)
    # below minFuzzyLength=3 -> falls back to exact-prefix semantics
    assert sug.suggest("go", ana)["surface"].to_pylist() == ["The Godfather"]
    assert sug.suggest("gx", ana).num_rows == 0


def test_fuzzy_matches_exact_superset():
    """Every exact-prefix hit is also a fuzzy hit (0 edits <= maxEdits)."""
    ana = get_analyzer("standard")
    exact = AnalyzingSuggester.from_pairs(PAIRS, ana)
    fuzzy = FuzzySuggester.from_pairs(PAIRS, ana)
    for q in ["ghost", "ghost wr", "godf", "ghostbusters"]:
        e = set(exact.suggest(q, ana)["surface"].to_pylist())
        f = set(fuzzy.suggest(q, ana, n=10)["surface"].to_pylist())
        assert e <= f, q


FT_CORPUS = [
    "big data engine", "big data table", "big data engine",
    "small data frame", "engine room",
]


def test_freetext_predict_next():
    ana = get_analyzer("standard_nostop")
    sug = FreeTextSuggester.from_texts(FT_CORPUS, ana, grams=2)
    # after "data": engine 2/4, table 1/4, frame 1/4
    t = sug.suggest("data ", ana)
    assert t["term"].to_pylist()[:1] == ["engine"]
    d = dict(zip(t["term"].to_pylist(), t["score"].to_pylist()))
    assert d["engine"] == 0.5 and d["table"] == 0.25


def test_freetext_prefix_completion():
    ana = get_analyzer("standard_nostop")
    sug = FreeTextSuggester.from_texts(FT_CORPUS, ana, grams=2)
    # complete "data e..." -> engine via the bigram
    t = sug.suggest("data e", ana)
    assert t["term"].to_pylist() == ["engine"]
    assert t["score"].to_pylist() == [0.5]


def test_freetext_stupid_backoff():
    ana = get_analyzer("standard_nostop")
    sug = FreeTextSuggester.from_texts(FT_CORPUS, ana, grams=2)
    # "room" has no following token: back off to unigrams * 0.4
    t = sug.suggest("room d", ana)
    got = dict(zip(t["term"].to_pylist(), t["score"].to_pylist()))
    # unigram counts: data 4 of 14 tokens -> 0.4 * 4/14
    assert abs(got["data"] - 0.4 * 4 / 14) < 1e-12
    # higher-order candidates are never overridden by backoff
    t2 = sug.suggest("data ", ana)
    d2 = dict(zip(t2["term"].to_pylist(), t2["score"].to_pylist()))
    assert d2["engine"] == 0.5  # not the unigram 0.4*3/14


def test_freetext_from_dataset(ray_session):
    ds = rd.from_items([{"t": s} for s in FT_CORPUS])
    sug = FreeTextSuggester.from_dataset(ds, "t", "standard_nostop")
    ana = get_analyzer("standard_nostop")
    ref = FreeTextSuggester.from_texts(FT_CORPUS, ana)
    assert sug.counts == ref.counts
    assert sug.suggest("big ", ana).to_pydict() == \
        ref.suggest("big ", ana).to_pydict()


def test_from_dataset(ray_session):
    ds = rd.from_items([
        {"s": surface, "w": w} for surface, w in PAIRS
    ])
    sug = AnalyzingSuggester.from_dataset(ds, "s", "w")
    ana = get_analyzer("standard")
    t = sug.suggest("go", ana)
    assert t["surface"].to_pylist() == ["The Godfather"]
