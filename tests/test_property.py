"""Property-based tests (hypothesis) — the RandomPostingsTester analogue
with generated rather than seeded inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.codec import (
    decode_postings,
    encode_postings,
    float_to_byte315,
)
from lucene_solr_ray.codec.postings import (
    decode_values,
    encode_values,
    first_doc,
)
from lucene_solr_ray.analysis import tokenize
from lucene_solr_ray.analysis.fast import ascii_tokenize_concat


@st.composite
def postings(draw):
    n = draw(st.integers(1, 400))
    gaps = draw(st.lists(st.integers(1, 1 << 20), min_size=n, max_size=n))
    docs = np.cumsum(np.asarray(gaps, np.int64)) - 1
    tfs = np.asarray(
        draw(st.lists(st.integers(1, 1 << 15), min_size=n, max_size=n)),
        np.int64,
    )
    return docs, tfs


@settings(max_examples=60, deadline=None)
@given(p=postings(), aligned=st.booleans())
def test_postings_roundtrip_property(p, aligned):
    docs, tfs = p
    payload, last, maxtf = encode_postings(docs, tfs, byte_aligned=aligned)
    d, f = decode_postings(payload)
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(f, tfs)
    assert first_doc(payload) == docs[0]
    assert last[-1] == docs[-1]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 1 << 30), min_size=0, max_size=500),
       st.booleans())
def test_values_stream_roundtrip(vals, aligned):
    arr = np.asarray(vals, np.uint32)
    np.testing.assert_array_equal(
        decode_values(encode_values(arr, aligned)), arr
    )


@settings(max_examples=40, deadline=None)
@given(st.floats(width=32, allow_nan=False))
def test_smallfloat_monotone(f):
    # encoding is monotone non-decreasing in f (order preservation is what
    # norm comparisons rely on)
    b1 = int(float_to_byte315(np.float32(f)))
    b2 = int(float_to_byte315(np.float32(f) * np.float32(2.0))) \
        if f == f and abs(f) < 1e30 else b1
    if f > 0:
        assert b2 >= b1


@settings(max_examples=80, deadline=None)
@given(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=160,
))
def test_fast_path_equals_regex_property(s):
    fast, _, _ = ascii_tokenize_concat([s])
    assert fast == tokenize(s)


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=120))
def test_tokenizer_never_crashes_and_tokens_nonempty(s):
    for t in tokenize(s):
        assert t and len(t) <= 255
