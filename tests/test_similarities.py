"""ClassicSimilarity (TF-IDF) golden scores: hand-computed from the
published formulas (TFIDFSimilarity.java docs) on a tiny controlled
corpus — proves the Similarity extension point carries a non-BM25
implementation end-to-end."""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.codec import NORM_TABLE, encode_norm
from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher, TermQuery
from lucene_solr_ray.search.query import BooleanQuery
from lucene_solr_ray.search.similarities import ClassicSimilarity

DOCS = [
    "apple banana apple",          # len 3, tf(apple)=2
    "apple cherry",                # len 2
    "banana cherry cherry date",   # len 4
    "date elderberry",             # len 2
]


@pytest.fixture(scope="module")
def cidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("cls_corpus")
    pq.write_table(pa.table({"content": pa.array(DOCS)}),
                   str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("cls_index"))
    build_index(str(d), out, rows_per_partition=10)
    return out


def _expected_term(term, tf_by_doc, n_docs=4):
    """queryNorm * coord(=1) * tf(f)*idf^2*lengthNorm, single term."""
    df = len(tf_by_doc)
    idf = math.log(n_docs / (df + 1)) + 1.0
    qnorm = 1.0 / idf
    out = {}
    for doc, (tf, length) in tf_by_doc.items():
        # quantized length via the shared norm byte (what the index stores)
        qlen = float(NORM_TABLE[encode_norm(np.array([length]))[0]])
        out[doc] = qnorm * math.sqrt(tf) * idf * idf / math.sqrt(qlen)
    return out


def test_classic_term_scores(cidx):
    s = IndexSearcher(cidx, similarity=ClassicSimilarity())
    t = s.search(TermQuery("apple"), k=10)
    got = dict(zip(t["doc_id"].to_pylist(),
                   [float(x) for x in t["score"].to_pylist()]))
    want = _expected_term("apple", {0: (2, 3), 1: (1, 2)})
    assert set(got) == set(want)
    for doc in want:
        assert got[doc] == pytest.approx(want[doc], rel=1e-6), doc
    # tf(2) > tf(1) but doc1 is shorter: check actual order holds both ways
    assert t.num_rows == 2


def test_classic_or_coord_and_querynorm(cidx):
    s = IndexSearcher(cidx, similarity=ClassicSimilarity())
    t = s.search(BooleanQuery.build(
        should=[TermQuery("banana"), TermQuery("date")]), k=10)
    n = 4
    idf_b = math.log(n / (2 + 1)) + 1.0
    idf_d = math.log(n / (2 + 1)) + 1.0
    qnorm = 1.0 / math.sqrt(idf_b ** 2 + idf_d ** 2)

    def ln(length):
        return 1.0 / math.sqrt(
            float(NORM_TABLE[encode_norm(np.array([length]))[0]]))

    want = {
        0: qnorm * (idf_b ** 2) * ln(3) * (1 / 2),          # banana only
        2: qnorm * ((idf_b ** 2) + (idf_d ** 2)) * ln(4),   # both, coord 1
        3: qnorm * (idf_d ** 2) * ln(2) * (1 / 2),          # date only
    }
    got = dict(zip(t["doc_id"].to_pylist(),
                   [float(x) for x in t["score"].to_pylist()]))
    assert set(got) == set(want)
    for doc in want:
        assert got[doc] == pytest.approx(want[doc], rel=1e-6), doc


def test_classic_rejects_unsupported_shapes(cidx):
    s = IndexSearcher(cidx, similarity=ClassicSimilarity())
    from lucene_solr_ray.search.query import PrefixQuery

    with pytest.raises(NotImplementedError):
        s.search(PrefixQuery("app"), k=5)


def test_bm25_default_unchanged(cidx):
    a = IndexSearcher(cidx).search(TermQuery("apple"), k=10)
    b = IndexSearcher(cidx, similarity=None).search(TermQuery("apple"), k=10)
    assert a.to_pydict() == b.to_pydict()


def test_lmdirichlet_golden(cidx):
    from lucene_solr_ray.search.similarities import LMDirichletSimilarity

    s = IndexSearcher(cidx, similarity=LMDirichletSimilarity(mu=100.0))
    t = s.search(TermQuery("apple"), k=10)
    got = dict(zip(t["doc_id"].to_pylist(),
                   [float(x) for x in t["score"].to_pylist()]))
    # collection: 11 tokens total; ttf(apple)=3
    p_c = 3 / 11
    mu = 100.0
    want = {
        0: max(0.0, math.log(1 + 2 / (mu * p_c)) + math.log(mu / (3 + mu))),
        1: max(0.0, math.log(1 + 1 / (mu * p_c)) + math.log(mu / (2 + mu))),
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-6), d


def test_bm25_k1_b_tuning(cidx):
    # defaults: bit-identical to the constant path
    a = IndexSearcher(cidx).search(TermQuery("apple"), k=10)
    d = IndexSearcher(cidx, k1=1.2, b=0.75).search(TermQuery("apple"), k=10)
    assert a.to_pydict() == d.to_pydict()
    # b=0 removes length normalization: equal-tf docs score equally
    s0 = IndexSearcher(cidx, b=0.0)
    t = s0.search(TermQuery("date"), k=10)  # tf=1 in docs 2 and 3
    scores = t["score"].to_pylist()
    assert len(scores) == 2 and scores[0] == scores[1]
    # k1=0 makes tf saturating immediately: tf=2 scores like tf=1
    sk = IndexSearcher(cidx, k1=0.0)
    t2 = sk.search(TermQuery("apple"), k=10)
    sc = t2["score"].to_pylist()
    assert sc[0] == pytest.approx(sc[1], rel=1e-6)
    # custom k1/b also flows through the pruned path identically
    full = IndexSearcher(cidx, k1=2.0, b=0.3)
    pr = full.search(TermQuery("apple"), k=10, prune=True)
    ex = full.search(TermQuery("apple"), k=10, prune=False)
    assert pr.to_pydict() == ex.to_pydict()


def test_lmjelinekmercer_golden(cidx):
    from lucene_solr_ray.search.similarities import (
        LMJelinekMercerSimilarity,
    )

    lam = 0.3
    s = IndexSearcher(cidx, similarity=LMJelinekMercerSimilarity(lam))
    t = s.search(TermQuery("apple"), k=10)
    got = dict(zip(t["doc_id"].to_pylist(),
                   [float(x) for x in t["score"].to_pylist()]))
    p_c = 3 / 11  # ttf(apple)=3, collection 11 tokens
    want = {
        0: math.log(1 + ((1 - lam) * 2 / 3) / (lam * p_c)),
        1: math.log(1 + ((1 - lam) * 1 / 2) / (lam * p_c)),
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-6), d
    with pytest.raises(ValueError):
        LMJelinekMercerSimilarity(1.5)


def test_dfr_inl2_golden(cidx):
    from lucene_solr_ray.search.similarities import DFRSimilarity

    s = IndexSearcher(cidx, similarity=DFRSimilarity("in", "l", "h2"))
    t = s.search(TermQuery("apple"), k=10)
    got = dict(zip(t["doc_id"].to_pylist(),
                   [float(x) for x in t["score"].to_pylist()]))
    n, df, avgdl = 4.0, 2.0, 11 / 4
    want = {}
    for doc, (tf, dl) in {0: (2, 3), 1: (1, 2)}.items():
        tfn = tf * math.log2(1 + avgdl / dl)
        want[doc] = (1 / (tfn + 1)) * tfn * math.log2((n + 1) / (df + 0.5))
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-6), d


def test_dfr_gb_h1_variants(cidx):
    from lucene_solr_ray.search.similarities import DFRSimilarity

    # the G/B/H1 pieces: scores positive and rank doc0 (tf 2) first
    s = IndexSearcher(cidx, similarity=DFRSimilarity("g", "b", "h1"))
    t = s.search(TermQuery("apple"), k=10)
    assert t["doc_id"].to_pylist()[0] == 0
    assert all(x > 0 for x in t["score"].to_pylist())


def test_lm_or_query_sums(cidx):
    from lucene_solr_ray.search.similarities import (
        LMJelinekMercerSimilarity,
    )

    s = IndexSearcher(cidx, similarity=LMJelinekMercerSimilarity(0.3))
    q = BooleanQuery.build(should=[TermQuery("apple"),
                                   TermQuery("cherry")])
    t = s.search(q, k=10)
    a = s.search(TermQuery("apple"), k=10)
    c = s.search(TermQuery("cherry"), k=10)
    am = dict(zip(a["doc_id"].to_pylist(), a["score"].to_pylist()))
    cm = dict(zip(c["doc_id"].to_pylist(), c["score"].to_pylist()))
    for d, sc in zip(t["doc_id"].to_pylist(), t["score"].to_pylist()):
        assert float(sc) == pytest.approx(
            am.get(d, 0.0) + cm.get(d, 0.0), rel=1e-6)


def test_ib_ll_golden(cidx):
    from lucene_solr_ray.search.similarities import IBSimilarity

    s = IndexSearcher(cidx, similarity=IBSimilarity("ll", "df", "h2"))
    t = s.search(TermQuery("apple"), k=10)
    got = dict(zip(t["doc_id"].to_pylist(),
                   [float(x) for x in t["score"].to_pylist()]))
    n, df, avgdl = 4.0, 2.0, 11 / 4
    lam = (df + 1) / (n + 1)
    want = {}
    for doc, (tf, dl) in {0: (2, 3), 1: (1, 2)}.items():
        tfn = tf * math.log2(1 + avgdl / dl)
        want[doc] = -math.log(lam / (tfn + lam))
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-6), d


def test_ib_spl_ttf_positive_and_ranked(cidx):
    from lucene_solr_ray.search.similarities import IBSimilarity

    s = IndexSearcher(cidx, similarity=IBSimilarity("spl", "ttf", "h1"))
    t = s.search(TermQuery("apple"), k=10)
    assert t["doc_id"].to_pylist()[0] == 0
    assert all(x > 0 for x in t["score"].to_pylist())


def test_dfr_extra_basic_models_golden(cidx):
    from lucene_solr_ray.search.similarities import DFRSimilarity

    n, df, ttf, avgdl = 4.0, 2.0, 3.0, 11 / 4
    cases = {
        "if": lambda tfn: tfn * math.log2(1 + (n + 1) / (ttf + 0.5)),
        "ine": lambda tfn: tfn * math.log2(
            (n + 1) / (n * (1 - ((n - 1) / n) ** ttf) + 0.5)),
        "p": lambda tfn: (
            tfn * math.log2(tfn / ((ttf + 1) / (n + 1)))
            + ((ttf + 1) / (n + 1) + 1 / (12 * tfn) - tfn)
            * math.log2(math.e)
            + 0.5 * math.log2(2 * math.pi * tfn)),
    }
    for model, f in cases.items():
        s = IndexSearcher(cidx, similarity=DFRSimilarity(model, "l", "h2"))
        t = s.search(TermQuery("apple"), k=10)
        got = dict(zip(t["doc_id"].to_pylist(),
                       [float(x) for x in t["score"].to_pylist()]))
        for doc, (tf, dl) in {0: (2, 3), 1: (1, 2)}.items():
            tfn = tf * math.log2(1 + avgdl / dl)
            want = (1 / (tfn + 1)) * f(tfn)
            assert got[doc] == pytest.approx(want, rel=1e-6), (model, doc)


def test_dfr_h3_z_normalizations_golden(cidx):
    from lucene_solr_ray.search.similarities import DFRSimilarity

    n, df, ttf, sumttf, avgdl = 4.0, 2.0, 3.0, 11.0, 11 / 4
    mu, z = 800.0, 0.30

    def info_in(tfn):
        return (1 / (tfn + 1)) * tfn * math.log2((n + 1) / (df + 0.5))

    for norm, tfn_fn in (
        ("h3", lambda tf, dl: (tf + mu * ((ttf + 1) / (sumttf + 1)))
         / (dl + mu) * mu),
        ("z", lambda tf, dl: tf * (avgdl / dl) ** z),
    ):
        s = IndexSearcher(cidx, similarity=DFRSimilarity("in", "l", norm))
        t = s.search(TermQuery("apple"), k=10)
        got = dict(zip(t["doc_id"].to_pylist(),
                       [float(x) for x in t["score"].to_pylist()]))
        for doc, (tf, dl) in {0: (2, 3), 1: (1, 2)}.items():
            assert got[doc] == pytest.approx(
                info_in(tfn_fn(tf, dl)), rel=1e-6), (norm, doc)


def test_multi_similarity_sums(cidx):
    from lucene_solr_ray.search.similarities import (
        ClassicSimilarity,
        LMJelinekMercerSimilarity,
        MultiSimilarity,
    )

    subs = [ClassicSimilarity(), LMJelinekMercerSimilarity(0.3)]
    s = IndexSearcher(cidx, similarity=MultiSimilarity(subs))
    t = s.search(TermQuery("apple"), k=10)
    parts = [IndexSearcher(cidx, similarity=x).search(TermQuery("apple"),
                                                      k=10) for x in subs]
    maps = [dict(zip(p["doc_id"].to_pylist(), p["score"].to_pylist()))
            for p in parts]
    for d, sc in zip(t["doc_id"].to_pylist(), t["score"].to_pylist()):
        assert float(sc) == pytest.approx(
            sum(float(m.get(d, 0.0)) for m in maps), rel=1e-5)
