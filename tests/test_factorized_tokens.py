"""Factorized tokenization fast path (analysis/fast.py
ascii_tokenize_concat_factorized + StandardAnalyzer
.tokens_batch_factorized): the token stream as vocabulary codes must
reconstruct tokens_batch exactly, across ASCII, mixed, and fallback
batches — and _invert must produce identical postings either way."""
import numpy as np
import pytest

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.analysis.analyzers import StandardAnalyzer
from lucene_solr_ray.index.build import _invert

CASES = [
    ["The quick brown fox and the lazy dog", "hash join merge table scan"],
    ["a an and or not to be 123 foo_bar x y z " * 5, "", "single"],
    ["héllo wörld münich", "plain ascii", "ß sharp", "mixed END 42"],
    ["repeat repeat repeat token", "token repeat again token"],
    [],
    ["numbers 3.14 1,000 a:b c_d", "x" * 300 + " overlong filtered ok"],
]


@pytest.mark.parametrize("texts", CASES)
def test_factorized_reconstructs_tokens_batch(texts):
    ana = get_analyzer("standard")
    t1, d1, p1 = ana.tokens_batch(texts)
    res = ana.tokens_batch_factorized(texts)
    assert res is not None
    vocab, codes, d2, p2 = res
    assert [vocab[c] for c in codes] == t1
    assert list(np.asarray(d1)) == list(d2)
    assert list(np.asarray(p1)) == list(p2)
    assert len(set(vocab)) == len(vocab)  # vocabulary is deduplicated


def test_wide_token_falls_back_to_string_path():
    ana = get_analyzer("standard")
    # 70 chars: survives the 255 length filter but exceeds
    # MAX_FACTORIZE_WIDTH — the factorized path must decline, not blow
    # up the padded matrix
    assert ana.tokens_batch_factorized(["x" * 70 + " wide"]) is None


def test_invert_identical_with_and_without_fast_path():
    texts = [
        "alpha beta gamma alpha", "beta beta the of", "",
        "héllo wörld alpha", "zeta alpha 42 zeta",
    ]
    res_fast = _invert(texts, "standard", 0, want_positions=True)
    orig = StandardAnalyzer.tokens_batch_factorized
    StandardAnalyzer.tokens_batch_factorized = lambda self, t: None
    try:
        res_slow = _invert(texts, "standard", 0, want_positions=True)
    finally:
        StandardAnalyzer.tokens_batch_factorized = orig
    v_f, tid_f = res_fast[0], res_fast[1]
    v_s, tid_s = res_slow[0], res_slow[1]
    # vocab ORDER may differ (hash factorize vs first-occurrence);
    # resolved terms per posting and everything else must be equal
    assert [v_f[t] for t in tid_f] == [v_s[t] for t in tid_s]
    for i in (2, 3, 4, 5, 6, 7):  # doc, tf, doc_len, pos/off/pay flats
        assert np.array_equal(np.asarray(res_fast[i]),
                              np.asarray(res_slow[i])), i
