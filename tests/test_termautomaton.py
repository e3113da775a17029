"""TermAutomatonQuery (lucene/sandbox TermAutomatonQuery/
TokenStreamToTermAutomatonQuery/TermAutomatonScorer semantics):
builder surface, token-stream conversion (synonyms, holes, posLength),
matching DP vs a brute-force oracle, and the index-driven search.
"""

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.termautomaton import (
    TermAutomatonQuery,
    search_term_automaton,
    token_stream_to_query,
)


def _posmap(tokens):
    out = {}
    for i, t in enumerate(tokens):
        out.setdefault(t, []).append(i)
    return {t: np.asarray(v, np.int64) for t, v in out.items()}


def _phrase_alternation():
    # "hash (join|table)"
    q = TermAutomatonQuery()
    s0 = q.create_state()
    s1 = q.create_state()
    s2 = q.create_state()
    q.add_transition(s0, s1, "hash")
    q.add_transition(s1, s2, "join")
    q.add_transition(s1, s2, "table")
    q.set_accept(s2)
    q.finish()
    return q


def test_basic_alternation_match():
    q = _phrase_alternation()
    assert q.match_positions(_posmap("the hash join ran".split())) == 1
    assert q.match_positions(_posmap("hash table hash join x".split())) == 2
    assert q.match_positions(_posmap("hash hash join".split())) == 1
    assert q.match_positions(_posmap("join hash".split())) == 0
    assert q.match_positions({}) == 0


def test_requires_accept_state():
    q = TermAutomatonQuery()
    q.create_state()
    with pytest.raises(ValueError):
        q.finish()


def test_token_stream_synonym_stacking():
    # "hash (join|table)" as a token stream: join & table share position 1
    q = token_stream_to_query([("hash", 1), ("join", 1), ("table", 0)])
    assert sorted(q.terms) == ["hash", "join", "table"]
    assert q.match_positions(_posmap("a hash table b".split())) == 1
    assert q.match_positions(_posmap("a hash join b".split())) == 1
    assert q.match_positions(_posmap("hash b join".split())) == 0


def test_token_stream_multiword_synonym_poslength():
    # wtc ~ "world trade center": the graph MultiPhraseQuery can't express
    q = token_stream_to_query([
        ("wtc", 1, 3), ("world", 0, 1), ("trade", 1, 1), ("center", 1, 1),
    ])
    assert q.match_positions(_posmap("the world trade center fell".split())) == 1
    assert q.match_positions(_posmap("visit wtc today".split())) == 1
    assert q.match_positions(_posmap("world trade town".split())) == 0
    # one transition consumes one doc position: a term after the synonym
    q2 = token_stream_to_query([
        ("wtc", 1, 3), ("world", 0, 1), ("trade", 1, 1), ("center", 1, 1),
        ("visit", 1, 1),
    ])
    assert q2.match_positions(_posmap("wtc visit".split())) == 1
    assert q2.match_positions(_posmap("world trade center visit".split())) == 1


def test_token_stream_hole_becomes_any():
    # "big <stopword-hole> apple": posIncr 2 bridges with ANY
    q = token_stream_to_query([("big", 1), ("apple", 2)])
    assert q.match_positions(_posmap("big red apple".split())) == 1
    assert q.match_positions(_posmap("big apple".split())) == 0
    assert q.match_positions(_posmap("big very red apple".split())) == 0


def test_trailing_any_requires_doc_len():
    q = TermAutomatonQuery()
    s0, s1, s2 = (q.create_state() for _ in range(3))
    q.add_transition(s0, s1, "end")
    q.add_any_transition(s1, s2)
    q.set_accept(s2)
    q.finish()
    with pytest.raises(ValueError):
        q.match_positions(_posmap("the end is near".split()))
    assert q.match_positions(_posmap("the end is near".split()),
                             doc_len=4) == 1
    # "end" as the LAST token: no position left for ANY
    assert q.match_positions(_posmap("the end".split()), doc_len=2) == 0


def test_match_count_vs_bruteforce_random():
    import random

    rng = random.Random(5)
    vocab = list("abcde")
    q = _phrase_alternation_over(vocab)
    pat = re.compile(r"(?=\ba (b|c) d\b)")
    for _ in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randrange(1, 14))]
        text = " ".join(words)
        expect = len(pat.findall(text))
        got = q.match_positions(_posmap(words))
        assert got == expect, text


def _phrase_alternation_over(vocab):
    q = TermAutomatonQuery()
    s0, s1, s2, s3 = (q.create_state() for _ in range(4))
    q.add_transition(s0, s1, "a")
    q.add_transition(s1, s2, "b")
    q.add_transition(s1, s2, "c")
    q.add_transition(s2, s3, "d")
    q.set_accept(s3)
    q.finish()
    return q


# -- index-driven ------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_index(tmp_path_factory, ray_session):
    texts = [
        "alpha hash join beta",
        "hash table scan then hash join again",
        "no match here",
        "table hash",                      # wrong order
        "hash join hash table hash join",  # three matches
        "gamma hash vector",
    ]
    d = tmp_path_factory.mktemp("tacorpus")
    tbl = pa.table({
        "repo": ["r"] * len(texts),
        "path": [f"f{i}.txt" for i in range(len(texts))],
        "commit": ["c"] * len(texts),
        "lang": ["text"] * len(texts),
        "content": texts,
    })
    pq.write_table(tbl, str(d / "a.parquet"))
    out = str(tmp_path_factory.mktemp("taindex"))
    build_index(str(d), out, rows_per_partition=100, store_positions=True)
    return out, texts


def test_search_term_automaton_against_regex(tiny_index):
    index_dir, texts = tiny_index
    s = IndexSearcher(index_dir)
    q = _phrase_alternation()
    docs, freqs = search_term_automaton(s, q)
    pat = re.compile(r"(?=\bhash (join|table)\b)")
    expect = {i: len(pat.findall(t)) for i, t in enumerate(texts)
              if pat.search(t)}
    assert dict(zip(docs.tolist(), freqs.tolist())) == expect


def test_search_with_synonym_stream(tiny_index):
    index_dir, texts = tiny_index
    s = IndexSearcher(index_dir)
    q = token_stream_to_query([("hash", 1), ("join", 1), ("table", 0)])
    docs, freqs = search_term_automaton(s, q)
    pat = re.compile(r"(?=\bhash (join|table)\b)")
    expect = {i: len(pat.findall(t)) for i, t in enumerate(texts)
              if pat.search(t)}
    assert dict(zip(docs.tolist(), freqs.tolist())) == expect


def test_scored_linear_chain_equals_phrase(tiny_index):
    """TermAutomatonScorer == ExactPhraseScorer on a linear chain:
    same candidates, same freq, same idf-sum weight -> identical
    float32 scores."""
    from lucene_solr_ray.search.query import PhraseQuery
    from lucene_solr_ray.search.termautomaton import score_term_automaton

    index_dir, _ = tiny_index
    s = IndexSearcher(index_dir)
    q = token_stream_to_query([("hash", 1), ("join", 1)])
    docs_a, scores_a = score_term_automaton(s, q)
    docs_p, scores_p = s._score_phrase(PhraseQuery(("hash", "join")))
    order_p = np.argsort(docs_p)
    assert np.array_equal(docs_a, docs_p[order_p])
    assert np.array_equal(scores_a, scores_p[order_p])
    assert scores_a.dtype == np.float32


def test_search_respects_deletes(tiny_index):
    from lucene_solr_ray.index import delete_docs

    index_dir, texts = tiny_index
    import shutil, tempfile, os
    d2 = tempfile.mkdtemp(prefix="ta_del_")
    dst = os.path.join(d2, "idx")
    shutil.copytree(index_dir, dst)
    delete_docs(dst, np.array([4], np.int64))  # the three-match doc
    s = IndexSearcher(dst)
    q = _phrase_alternation()
    docs, _ = search_term_automaton(s, q)
    assert 4 not in docs.tolist()
