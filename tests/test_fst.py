"""FST term dictionary (util/fst parity): minimality, rank-identity
with the numpy dict, ordinal round-trips, duplicates, memory."""

import random
import string

import numpy as np
import pytest

from lucene_solr_ray.search.fst import FSTTerms
from lucene_solr_ray.search.termdict import NumpyTerms


def _rand_terms(n, seed, dups=True):
    rng = random.Random(seed)
    words = set()
    while len(words) < n:
        w = "".join(rng.choice(string.ascii_lowercase)
                    for _ in range(rng.randint(1, 10)))
        words.add(w)
    out = sorted(words)
    if dups:
        out = sorted(out + [rng.choice(out) for _ in range(n // 4)])
    return out


@pytest.fixture(scope="module")
def corpus():
    terms = _rand_terms(3000, seed=7)
    return terms, FSTTerms(terms), NumpyTerms(np.asarray(terms, object))


def test_len_getitem_roundtrip(corpus):
    terms, fst, ref = corpus
    assert len(fst) == len(terms)
    idx = list(range(0, len(terms), 37)) + [0, len(terms) - 1]
    for i in idx:
        assert fst[i] == terms[i]
    assert fst[-1] == terms[-1]


def test_searchsorted_rank_identity(corpus):
    terms, fst, ref = corpus
    rng = random.Random(11)
    probes = [rng.choice(terms) for _ in range(200)]
    probes += ["".join(rng.choice(string.ascii_lowercase)
                       for _ in range(rng.randint(1, 11)))
               for _ in range(400)]
    probes += ["", "zzzzzzzzzzzz", terms[0][:1], terms[-1] + "a"]
    for p in probes:
        for side in ("left", "right"):
            assert fst.searchsorted(p, side) == ref.searchsorted(p, side), \
                (p, side)


def test_iter_range_identity(corpus):
    terms, fst, ref = corpus
    n = len(terms)
    for lo, hi in ((0, n), (5, 6), (100, 400), (n - 3, n), (7, 7),
                   (n - 1, n + 10)):
        assert list(fst.iter_range(lo, hi)) == terms[lo:min(hi, n)]
    assert list(fst) == terms


def test_duplicates_ordinals():
    terms = ["ab", "ab", "ab", "abc", "b", "b"]
    fst = FSTTerms(terms)
    assert len(fst) == 6
    assert [fst[i] for i in range(6)] == terms
    assert fst.searchsorted("ab", "left") == 0
    assert fst.searchsorted("ab", "right") == 3
    assert fst.searchsorted("b", "right") == 6
    assert list(fst.iter_range(1, 5)) == ["ab", "ab", "abc", "b"]


def test_unicode_byte_order_equals_codepoint_order():
    # UTF-8 byte order == codepoint order; mixed-script dict round-trips
    terms = sorted(["z", "é", "ß", "中", "中文", "あ", "ab", "Ω", "😀"])
    fst = FSTTerms(terms)
    assert list(fst) == terms
    for i, t in enumerate(terms):
        assert fst.searchsorted(t) == i
        assert fst[i] == t
    assert fst.searchsorted("中文字") == fst.searchsorted("中文") + 1


def test_unsorted_input_rejected():
    with pytest.raises(ValueError):
        FSTTerms(["b", "a"])


def test_suffix_sharing_beats_frontcoding_on_suffix_heavy_vocab():
    # inflection-style vocabulary: many stems x few endings
    endings = ["", "s", "ed", "ing", "ement", "ation", "ations"]
    terms = sorted(f"{a}{b}stem{e}"
                   for a in string.ascii_lowercase
                   for b in string.ascii_lowercase
                   for e in endings)
    fst = FSTTerms(terms)
    from lucene_solr_ray.search.termdict import FrontCodedTerms
    fc = FrontCodedTerms(terms)
    assert list(fst.iter_range(0, 50)) == terms[:50]
    # the automaton shares the 'stem*' suffix subgraph across all 676
    # stems; front-coding re-stores it once per term
    assert fst.nbytes() < fc.nbytes()


def test_reader_fst_mode_rank_identity(tmp_path_factory, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.analysis import get_analyzer
    from lucene_solr_ray.index import build_index, merge_index
    from lucene_solr_ray.search import IndexSearcher, parse_query

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(500)] + ["shared"]
    docs = [" ".join(rng.choice(words, 30)) for _ in range(400)]
    d = tmp_path_factory.mktemp("fst_src")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "content": pa.array(docs),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("fst_idx") / "idx")
    build_index(str(d), out, text_field="content",
                rows_per_partition=100)
    merge_index(out)
    plain = IndexSearcher(out)
    fst = IndexSearcher(out, compact_terms="fst")
    assert fst.reader.terms is None  # really compact
    ana = get_analyzer("standard")
    for qs in ("w1", "w1 w2 w3", "w4*", "w1?", "shared", "nosuchterm"):
        q = parse_query(qs, ana)
        a = plain.search(q, k=20)
        b = fst.search(q, k=20)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), qs
        assert a["score"].to_pylist() == b["score"].to_pylist(), qs
    assert plain.reader.num_terms() == fst.reader.num_terms()
    assert list(plain.reader.terms_in_range("w1", "w2")) == \
        list(fst.reader.terms_in_range("w1", "w2"))


def test_empty_and_empty_string_terms():
    f = FSTTerms([])
    assert len(f) == 0
    assert f.searchsorted("x") == 0
    assert list(f.iter_range(0, 5)) == []
    g = FSTTerms(["", "", "a"])
    assert len(g) == 3
    assert [g[i] for i in range(3)] == ["", "", "a"]
    assert g.searchsorted("", "right") == 2
    assert g.searchsorted("a") == 2
    assert list(g) == ["", "", "a"]
