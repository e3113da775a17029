"""PII, decontamination, chunking, mixture-sampling stage unit tests."""

import hashlib

import numpy as np
import pyarrow as pa

from lucene_solr_ray.stages.chunking import chunk_tokens_batch
from lucene_solr_ray.stages.decontam import (
    ContaminationFlagger,
    _gram_hashes,
)
from lucene_solr_ray.stages.pii import pii_redact_batch, pii_scan_batch
from lucene_solr_ray.stages.sampling import mixture_sample_batch


def _tbl(**cols):
    return pa.table(cols)


def test_pii_scan_counts():
    t = _tbl(text=pa.array([
        "mail a@b.co and c.d-e@f.org now",
        "ssn 123-45-6789 phone 415-555-0042 ip 10.0.0.1",
        "clean text with no pii at all",
        "dots phone 415.555.0042",
    ]))
    out = pii_scan_batch(t)
    assert out["n_email"].to_pylist() == [2, 0, 0, 0]
    assert out["n_ssn"].to_pylist() == [0, 1, 0, 0]
    assert out["n_phone"].to_pylist() == [0, 1, 0, 1]
    assert out["n_ipv4"].to_pylist() == [0, 1, 0, 0]


def test_pii_no_cross_matches():
    """SSN never counts as phone and vice versa (3-2-4 vs 3-3-4)."""
    t = _tbl(text=pa.array(["123-45-6789", "415-555-0042"]))
    out = pii_scan_batch(t)
    assert out["n_ssn"].to_pylist() == [1, 0]
    assert out["n_phone"].to_pylist() == [0, 1]


def test_pii_redact_replaces_all():
    t = _tbl(text=pa.array(
        ["write a@b.co or a@b.co ssn 123-45-6789 ip 1.2.3.4"]))
    out = pii_redact_batch(t)
    assert out["text"].to_pylist() == [
        "write <email> or <email> ssn <ssn> ip <ipv4>"]
    # out_col keeps the original
    out2 = pii_redact_batch(t, out_col="clean")
    assert out2["text"].to_pylist()[0].startswith("write a@b.co")
    assert "<email>" in out2["clean"].to_pylist()[0]


def test_gram_hashes_no_cross_doc_windows():
    """5-grams never span document boundaries."""
    texts = ["a b c d e", "f g h i j"]
    rows, g = _gram_hashes(texts, 5)
    assert rows.tolist() == [0, 1]
    assert np.unique(g).size == 2
    # the cross-boundary window "b c d e f" must NOT be present
    _, g2 = _gram_hashes(["b c d e f"], 5)
    assert not np.isin(g2, g).any()


def test_gram_hashes_short_and_empty_docs():
    rows, g = _gram_hashes(["a b", "", "a b c d e f"], 5)
    assert rows.tolist() == [2, 2]  # only the 6-token doc has windows
    assert g.size == 2


def test_contamination_flagger():
    bench = _gram_hashes(["one two three four five six"], 5)[1]
    f = ContaminationFlagger(np.unique(bench), n=5)
    batch = _tbl(
        doc_id=pa.array([0, 1, 2], pa.int64()),
        text=pa.array([
            "zzz one two three four five zzz",   # shares a 5-gram
            "one two three junk four five six",  # broken window
            "totally different text here now",
        ]))
    out = f(batch)
    assert out["contaminated"].to_pylist() == [True, False, False]


def test_chunking_spans_and_md5():
    toks = [f"t{i}" for i in range(100)]
    t = _tbl(doc_id=pa.array([7], pa.int64()),
             text=pa.array([" ".join(toks)]))
    out = chunk_tokens_batch(t, size=64, overlap=16)
    assert out["chunk"].to_pylist() == [0, 1, 2]
    assert out["start_tok"].to_pylist() == [0, 48, 96]
    assert out["len_tok"].to_pylist() == [64, 52, 4]
    want = hashlib.md5(" ".join(toks[48:100]).encode()).hexdigest()
    assert out["chunk_md5"].to_pylist()[1] == want


def test_chunking_short_doc_single_window():
    t = _tbl(doc_id=pa.array([1], pa.int64()), text=pa.array(["a b c"]))
    out = chunk_tokens_batch(t, size=64, overlap=16)
    assert out["chunk"].to_pylist() == [0]
    assert out["len_tok"].to_pylist() == [3]


def test_mixture_sample_deterministic_and_rate():
    n = 4000
    t = _tbl(doc_id=pa.array(range(n), pa.int64()),
             source=pa.array(["web"] * n))
    out1 = mixture_sample_batch(t, {"web": 0.25})
    out2 = mixture_sample_batch(t, {"web": 0.25})
    assert out1["doc_id"].to_pylist() == out2["doc_id"].to_pylist()
    assert abs(out1.num_rows / n - 0.25) < 0.03
    # unknown source drops at default_rate=0
    t2 = _tbl(doc_id=pa.array([1, 2], pa.int64()),
              source=pa.array(["unknown", "unknown"]))
    assert mixture_sample_batch(t2, {"web": 1.0}).num_rows == 0
    # monotone: raising the rate only adds rows
    lo = set(mixture_sample_batch(t, {"web": 0.25})["doc_id"].to_pylist())
    hi = set(mixture_sample_batch(t, {"web": 0.5})["doc_id"].to_pylist())
    assert lo <= hi


def test_line_dedup_matches_pure_python(ray_session):
    """Corpus-level unit dedup == the straightforward two-pass reference
    implementation (count units across corpus, drop repeated ones)."""
    import collections

    import ray.data as rd

    from lucene_solr_ray.stages.linededup import (
        _split_units,
        line_dedup,
        repeated_unit_hashes,
    )

    texts = [
        "cookie banner accept all the quick brown fox jumps here",
        "cookie banner accept all another document body entirely now",
        "totally unique content in this one nothing repeats at all",
        "cookie banner accept all third page same boilerplate header",
        "",
    ]
    unit = "window:4"
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])

    # pure-python reference
    counts = collections.Counter(
        u for t in texts for u in _split_units(t, unit))
    dup = {u for u, c in counts.items() if c >= 2}
    want = {}
    for i, t in enumerate(texts):
        kept = [u for u in _split_units(t, unit) if u not in dup]
        want[i] = " ".join(kept)

    hashes = repeated_unit_hashes(ds, "text", unit=unit, min_repeat=2)
    assert len(hashes) == len(dup)
    out = line_dedup(ds, "text", "doc_id", unit=unit,
                     dup_hashes=hashes).to_pandas().set_index("doc_id")
    for i in range(len(texts)):
        assert out.loc[i, "text"] == want[i], i
    assert int(out["units_dropped"].sum()) == 3
    # unique doc untouched
    assert out.loc[2, "text"] == texts[2]


def test_dsir_selects_target_like_docs(ray_session):
    """DSIR-lite: docs resembling the target exemplars outrank
    off-domain docs; scores match a pure-python recomputation."""
    import ray.data as rd

    from lucene_solr_ray.stages.sampling import (
        dsir_log_ratio,
        dsir_select,
        hashed_ngram_counts,
    )

    target = ["table scan merge join query plan",
              "query optimizer join order statistics"]
    on_domain = [f"query plan with join order {i}" for i in range(10)]
    off_domain = [f"cat dog bird fish lizard {i}" for i in range(10)]
    docs = on_domain + off_domain
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)])

    out, thr = dsir_select(ds, "text", target, keep_frac=0.5)
    kept = out.to_pandas()
    kept_ids = set(kept["doc_id"].tolist())
    assert kept_ids and kept_ids <= set(range(10)), kept_ids

    # score parity with a driver-side recomputation
    raw = hashed_ngram_counts(docs)
    lr = dsir_log_ratio(hashed_ngram_counts(target), raw)
    import numpy as np

    for _, row in kept.iterrows():
        t = docs[int(row["doc_id"])]
        w = t.split()
        grams = w + [" ".join(w[j:j + 2]) for j in range(len(w) - 1)]
        import hashlib

        idx = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % len(lr)
               for g in grams]
        assert abs(float(np.mean(lr[idx])) - row["dsir_score"]) < 1e-12


def test_rolling_dedup_exact_substring(ray_session):
    """Rolling-window ExactSubstr dedup: a shared 12-token template
    embedded at DIFFERENT offsets in several docs is removed from all
    of them (overlapping windows catch unaligned repeats, which the
    non-overlapping line_dedup misses); unique text survives."""
    import ray.data as rd

    from lucene_solr_ray.stages.linededup import (
        rolling_dedup,
        rolling_dup_hashes,
    )

    template = "this license text is identical across many documents ok yes"
    assert len(template.split()) == 10
    docs = [
        f"intro words here {template} outro one",
        f"{template} completely different tail text",
        f"a b c d e f {template}",
        "entirely unique document with no shared content at all here",
    ]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    hashes = rolling_dup_hashes(ds, "text", k=10, stride=1, min_repeat=2)
    assert hashes.size >= 1
    out = rolling_dedup(ds, "text", "doc_id", k=10,
                        dup_hashes=hashes).to_pandas() \
        .set_index("doc_id")
    for i in range(3):
        assert template not in out.loc[i, "text"], i
        assert out.loc[i, "tokens_dropped"] >= 10
    assert out.loc[3, "text"] == docs[3]
    assert out.loc[3, "tokens_dropped"] == 0
    # non-template words survive
    assert "intro words here" in out.loc[0, "text"]
    assert "completely different tail text" in out.loc[1, "text"]


def test_rolling_dedup_randomized_vs_pure_python(ray_session):
    """Randomized corpora with planted shared spans: the distributed
    rolling dedup reproduces a from-scratch pure-python implementation
    exactly (token counts per doc)."""
    import numpy as np
    import ray.data as rd

    from lucene_solr_ray.stages.linededup import (
        rolling_dedup,
        rolling_dup_hashes,
    )

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(50)]
    shared = [f"s{i}" for i in range(8)]
    docs = []
    for i in range(40):
        words = rng.choice(vocab, size=int(rng.integers(5, 40))).tolist()
        if i % 4 == 0:  # plant the shared span at a random offset
            at = int(rng.integers(0, len(words)))
            words[at:at] = shared
        docs.append(" ".join(words))

    k = 8
    # pure-python reference
    from collections import Counter

    def windows(ws):
        return [" ".join(ws[j:j + k]) for j in range(len(ws) - k + 1)]

    counts = Counter(u for t in docs for u in windows(t.split()))
    dup = {u for u, c in counts.items() if c >= 2}
    want_drop = {}
    for i, t in enumerate(docs):
        ws = t.split()
        mark = np.zeros(len(ws), bool)
        for j, u in enumerate(windows(ws)):
            if u in dup:
                mark[j:j + k] = True
        want_drop[i] = int(mark.sum())

    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    hashes = rolling_dup_hashes(ds, "text", k=k, min_repeat=2)
    out = rolling_dedup(ds, "text", "doc_id", k=k,
                        dup_hashes=hashes).to_pandas() \
        .set_index("doc_id")
    for i in range(len(docs)):
        assert int(out.loc[i, "tokens_dropped"]) == want_drop[i], i
    # the planted docs actually dropped something
    assert sum(want_drop[i] > 0 for i in range(0, 40, 4)) >= 9


def test_pack_sequences_ffd(ray_session):
    """Sequence packing: every pack respects the budget (except flagged
    oversize singletons), all items packed exactly once, and FFD beats
    naive one-per-pack fill."""
    import numpy as np
    import ray.data as rd

    from lucene_solr_ray.stages.chunking import pack_sequences

    rng = np.random.default_rng(17)
    lens = rng.integers(50, 900, 300).tolist() + [3000]  # one oversize
    # realistic block sizes (packs never span blocks by design, so a
    # corpus of 1-row blocks would pack nothing)
    ds = rd.from_items(
        [{"doc_id": i, "n_tok": int(x)} for i, x in enumerate(lens)]
    ).repartition(4)
    out = pack_sequences(ds, "n_tok", budget=1024).to_pandas()
    assert len(out) == len(lens)
    assert set(out["doc_id"]) == set(range(len(lens)))
    # per-pack sums within budget, except the flagged oversize
    sums = out[~out["truncate"]].groupby("pack_id")["item_len"].sum()
    assert (sums <= 1024).all()
    over = out[out["truncate"]]
    assert len(over) == 1 and int(over["item_len"].iloc[0]) == 3000
    # oversize sits alone in its pack
    over_pack = over["pack_id"].iloc[0]
    assert (out["pack_id"] == over_pack).sum() == 1
    # packing actually consolidates: fewer packs than items
    assert out["pack_id"].nunique() < len(lens) * 0.7
    # fill is healthy for FFD at this distribution
    assert out["pack_fill"].mean() > 0.7


def test_bloom_dedup_capped_driver_state(ray_session):
    """The bloom scale path: (a) bloom-mode line_dedup matches the
    exact mode at test scale; (b) the driver-held / broadcast structure
    is EXACTLY m_bits/8 bytes for corpora of different sizes — capped
    independent of corpus size (the exact set grows with the corpus)."""
    import numpy as np
    import ray.data as rd

    from lucene_solr_ray.stages.linededup import (
        Bloom,
        line_dedup,
        repeated_unit_hashes,
        rolling_dup_hashes,
    )

    boiler = "click here to accept cookies and continue to site"
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(400)]

    def corpus(n):
        return [
            {"doc_id": i,
             "text": " ".join(rng.choice(vocab, 25)) + " " + boiler
             if i % 2 == 0 else " ".join(rng.choice(vocab, 30))}
            for i in range(n)
        ]

    small = rd.from_items(corpus(40)).repartition(4)
    large = rd.from_items(corpus(400)).repartition(8)

    m_bits = 1 << 16
    bl_small = repeated_unit_hashes(
        small, "text", unit="window:9", method="bloom", m_bits=m_bits)
    bl_large = repeated_unit_hashes(
        large, "text", unit="window:9", method="bloom", m_bits=m_bits)
    assert isinstance(bl_small, Bloom) and isinstance(bl_large, Bloom)
    assert len(bl_small.to_bytes()) == m_bits // 8
    assert len(bl_large.to_bytes()) == m_bits // 8  # capped, not growing

    exact = line_dedup(small, "text", "doc_id",
                       unit="window:9").to_pandas().sort_values("doc_id")
    bloom = line_dedup(small, "text", "doc_id", unit="window:9",
                       method="bloom", m_bits=m_bits
                       ).to_pandas().sort_values("doc_id")
    assert exact["text"].tolist() == bloom["text"].tolist()
    assert exact["units_dropped"].tolist() == \
        bloom["units_dropped"].tolist()

    rb = rolling_dup_hashes(small, "text", k=5, method="bloom",
                            m_bits=m_bits)
    assert len(rb.to_bytes()) == m_bits // 8


def test_bloom_membership_semantics():
    """Bloom invariants: no false negatives ever; false-positive rate
    stays near the theoretical bound at the designed load."""
    import numpy as np

    from lucene_solr_ray.stages.linededup import Bloom

    rng = np.random.default_rng(11)
    added = rng.integers(-2**62, 2**62, 5000, np.int64)
    probes = rng.integers(-2**62, 2**62, 20000, np.int64)
    f = Bloom(m_bits=1 << 17, k=4)
    f.add(added)
    assert f.contains(added).all()  # no false negatives
    fresh = np.setdiff1d(probes, added)
    fp = f.contains(fresh).mean()
    # n/m = 5000/131072 -> (1-e^(-kn/m))^k ~ 4.5e-4; allow 10x slack
    assert fp < 5e-3
    g = Bloom.from_bytes(f.to_bytes(), k=4)
    assert g.contains(added).all()
    h = Bloom(m_bits=1 << 17, k=4)
    h.add(added[:2500])
    h2 = Bloom(m_bits=1 << 17, k=4)
    h2.add(added[2500:])
    assert h.merge(h2).contains(added).all()  # OR-merge is lossless


def test_lm_model_capped_driver_state(ray_session):
    """train_bigram_lm with min_count / max_entries bounds the
    driver-held model inside the distributed plan: the collected model
    size obeys the cap independent of corpus size, and n_tokens stays
    the full pre-pruning token count."""
    import ray
    import ray.data as rd

    from lucene_solr_ray.stages.lmfilter import (
        PerplexityScorer,
        train_bigram_lm,
    )

    import numpy as np
    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(300)]

    def corpus(n):
        return rd.from_items([
            {"doc_id": i, "text": " ".join(rng.choice(vocab, 40))}
            for i in range(n)]).repartition(4)

    small, large = corpus(50), corpus(500)
    cap = 64
    ref_s, n_s = train_bigram_lm(small, max_entries=cap)
    ref_l, n_l = train_bigram_lm(large, max_entries=cap)
    m_s, m_l = ray.get(ref_s), ray.get(ref_l)
    for m in (m_s, m_l):
        assert len(m["uni_terms"]) + len(m["big_keys"]) <= cap
    assert n_s == 50 * 40 and n_l == 500 * 40  # full denominators

    # min_count pruning: every surviving n-gram count >= threshold
    ref_p, _ = train_bigram_lm(large, min_count=3)
    m_p = ray.get(ref_p)
    assert (m_p["uni_cnt"] >= 3).all() and (m_p["big_cnt"] >= 3).all()

    # a capped model still scores every doc (backoff covers misses)
    scored = small.map_batches(
        PerplexityScorer, fn_constructor_args=(ref_s,),
        batch_format="pyarrow", concurrency=2).to_pandas()
    assert scored["ppl"].notna().all()
