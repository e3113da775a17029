"""Bloom-filtered term lookups (lucene/codecs/bloom).

- MurmurHash2 parity: the vectorized numpy implementation must equal a
  direct transliteration of the Java reference algorithm
  (``bloom/MurmurHash2.java:41-78``) on arbitrary bytes, including the
  signed-byte tail mixing and int32 wraparound.
- FuzzySet semantics (``bloom/FuzzySet.java``): never a false negative,
  all-ones sizing, downsize-by-remasking keeps MAYBE for every recorded
  value, >90%-saturated sets are not persisted.
- Reader integration: a searcher with the bloom sidecar attached is
  rank/score-identical to one without, across hit and miss probes.
"""

import random
import string

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.codec.bloom import (
    FuzzySet,
    _USABLE_SIZES,
    build_bloom,
    ensure_bloom,
    murmur2_hash32,
    murmur2_hash32_batch,
    nearest_set_size,
    read_bloom,
    write_bloom,
)
from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher, TermQuery
from lucene_solr_ray.sources import generate_table


# -- MurmurHash2 -----------------------------------------------------------

def _java_murmur2(data: bytes, seed: int = 0x9747B28C) -> int:
    """Line-by-line transliteration of MurmurHash2.java:41-78 with
    explicit int32 wraparound — the test oracle."""
    M32 = 0xFFFFFFFF

    def i32(x):
        x &= M32
        return x - (1 << 32) if x & 0x80000000 else x

    m, r = 0x5BD1E995, 24
    n = len(data)
    h = i32(seed ^ n)
    sb = [b - 256 if b > 127 else b for b in data]
    for i in range(n >> 2):
        i4 = i << 2
        k = sb[i4 + 3]
        k = i32(k << 8) | (data[i4 + 2] & 0xFF)
        k = i32(i32(k << 8) | (data[i4 + 1] & 0xFF))
        k = i32(i32(k << 8) | (data[i4 + 0] & 0xFF))
        k = i32(k * m)
        k = i32(k ^ ((k & M32) >> r))
        k = i32(k * m)
        h = i32(h * m)
        h = i32(h ^ k)
    left = n & 3
    if left:
        if left >= 3:
            h = i32(h ^ i32(sb[n - 3] << 16))
        if left >= 2:
            h = i32(h ^ i32(sb[n - 2] << 8))
        h = i32(h ^ sb[n - 1])
        h = i32(h * m)
    h = i32(h ^ ((h & M32) >> 13))
    h = i32(h * m)
    h = i32(h ^ ((h & M32) >> 15))
    return h


def test_murmur2_matches_java_transliteration():
    rng = random.Random(7)
    samples = [b"", b"a", b"ab", b"abc", b"abcd", b"hello world",
               "héllo wörld".encode(), bytes(range(256))]
    samples += [bytes(rng.randrange(256) for _ in range(rng.randrange(64)))
                for _ in range(400)]
    for s in samples:
        assert murmur2_hash32(s) == _java_murmur2(s)
    batch = murmur2_hash32_batch(samples)
    assert [int(x) for x in batch] == [_java_murmur2(s) for s in samples]


def test_murmur2_batch_accepts_strings():
    words = ["table", "früh", "", "a" * 300]
    batch = murmur2_hash32_batch(words)
    for w, h in zip(words, batch):
        assert int(h) == murmur2_hash32(w.encode("utf-8"))


# -- FuzzySet --------------------------------------------------------------

def _vocab(n, seed=3):
    rng = random.Random(seed)
    out = set()
    while len(out) < n:
        out.add("".join(rng.choice(string.ascii_lowercase)
                        for _ in range(rng.randint(1, 12))))
    return sorted(out)


def test_sizes_are_all_ones():
    for s in _USABLE_SIZES:
        assert (s & (s + 1)) == 0
    assert _USABLE_SIZES[0] == 3
    # sizing picks a set whose 10%-saturation capacity covers the count
    size = nearest_set_size(20_000, 0.10)
    assert size >= 20_000


def test_no_false_negatives_and_bounded_fp():
    vocab = _vocab(20_000)
    fs = build_bloom(vocab)
    assert fs is not None
    assert fs.contains_batch(vocab).all()
    for t in vocab[:50]:
        assert fs.contains(t)
    absent = [f"zz{i}q" for i in range(5000)]
    absent = [t for t in absent if t not in set(vocab)]
    # single-hash bloom: fp rate ~= saturation; downsized target is 10%
    fp = fs.contains_batch(absent).mean()
    assert fp < 0.25
    assert fs.saturation() <= 0.15


def test_downsize_remasks_and_keeps_members():
    vocab = _vocab(500)
    fs = FuzzySet.create_based_on_quality(500_000, 0.10)  # oversized
    fs.add_values(vocab)
    small = fs.downsize(0.10)
    assert small is not None and small.bloom_size < fs.bloom_size
    assert small.contains_batch(vocab).all()
    # a saturated tiny set refuses to downsize (returns None)
    tiny = FuzzySet(_USABLE_SIZES[0])
    tiny.add_values(vocab)
    assert tiny.downsize(0.10) is None


def test_saturated_set_not_persisted():
    tiny_vocab = _vocab(4000)
    # lying about n_unique forces a tiny set; 4000 adds saturate it past
    # the 90% persist threshold -> the flush policy drops the filter
    fs = FuzzySet(63)
    fs.add_values(tiny_vocab)
    assert fs.saturation() > 0.9
    assert build_bloom(tiny_vocab, n_unique=4) is None


def test_serialize_roundtrip(tmp_path):
    vocab = _vocab(1000)
    fs = build_bloom(vocab)
    raw = fs.to_bytes()
    back = FuzzySet.from_bytes(raw)
    assert back.bloom_size == fs.bloom_size
    assert (back.words == fs.words).all()
    d = str(tmp_path)
    path = write_bloom(d, vocab)
    assert path is not None
    loaded = read_bloom(d)
    assert loaded.contains_batch(vocab).all()


# -- reader integration ----------------------------------------------------

@pytest.fixture(scope="module")
def bloom_index(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("bloomcorpus")
    pq.write_table(generate_table(400, seed=42), str(d / "a.parquet"))
    out = str(tmp_path_factory.mktemp("bloomindex"))
    build_index(str(d), out, rows_per_partition=100)
    return out


def test_searcher_rank_identity_with_bloom(bloom_index):
    plain = IndexSearcher(bloom_index)
    bloomed = IndexSearcher(bloom_index, bloom=True)
    assert bloomed.reader._bloom is not None
    assert read_bloom(bloom_index) is not None  # sidecar persisted
    vocab = plain.reader.unique_terms()
    probes = list(vocab[:40]) + ["zzz_not_a_term", "missing", "qqqq"]
    for t in probes:
        a = plain.search(TermQuery(t), k=10)
        b = bloomed.search(TermQuery(t), k=10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()
    # df fast path: bloom NO answers misses without a dict probe
    assert bloomed.reader.doc_freqs(["zzz_not_a_term"]) == \
        {"zzz_not_a_term": 0}


def test_ensure_bloom_reuses_sidecar(bloom_index):
    s = IndexSearcher(bloom_index)
    fs1 = ensure_bloom(bloom_index, s.reader)
    s2 = IndexSearcher(bloom_index)
    fs2 = ensure_bloom(bloom_index, s2.reader)
    assert fs1 is not None and fs2 is not None
    assert (fs1.words == fs2.words).all()
    # every indexed term answers MAYBE through the attached filter
    vocab = [t for t in s.reader.unique_terms()]
    assert fs2.contains_batch(vocab).all()


def test_sidecar_auto_attaches(bloom_index):
    # test_searcher_rank_identity_with_bloom persisted the sidecar;
    # a plain searcher now picks it up without the flag
    assert read_bloom(bloom_index) is not None
    s = IndexSearcher(bloom_index)
    assert s.reader._bloom is not None
    t = s.search(TermQuery("zz_not_a_term"), k=5)
    assert t.num_rows == 0


def test_stale_bloom_ignored_after_append(bloom_index, tmp_path_factory,
                                          ray_session):
    """A bloom trained before an append can answer false NEGATIVES for
    the new segments' terms — staleness must drop it."""
    import shutil

    from lucene_solr_ray.index import append_segment

    d2 = str(tmp_path_factory.mktemp("bloom_nrt") / "idx")
    shutil.copytree(bloom_index, d2)
    ensure_bloom(d2, IndexSearcher(d2).reader)
    assert read_bloom(d2) is not None
    append_segment(d2, generate_table(50, seed=78))
    assert read_bloom(d2) is None  # stale -> not attached
    s = IndexSearcher(d2)
    assert s.reader._bloom is None
