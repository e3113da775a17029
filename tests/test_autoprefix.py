"""Auto-prefix terms sidecar (lucene/codecs/autoprefix): planning honors
the min-items contract, the stored doc unions equal term-by-term
expansion, and the searcher fast path is result-identical."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_autoprefix, build_index, has_autoprefix
from lucene_solr_ray.index.autoprefix import AutoPrefixReader, _plan
from lucene_solr_ray.search import IndexSearcher, PrefixQuery
from lucene_solr_ray.sources import generate_table


def test_plan_min_items_and_contiguity():
    terms = np.asarray(sorted(
        [f"val{i}" for i in range(30)] + [f"var{i}" for i in range(5)]
        + ["zz", "zzz"]
    ), dtype=object)
    plan = dict(_plan(terms, min_terms=5, max_len=3))
    assert plan["v"] == 35 and plan["va"] == 35 and plan["val"] == 30
    assert plan["var"] == 5           # var0..var4 = 5 terms, exactly min
    assert dict(_plan(terms, min_terms=6, max_len=3)).get("var") is None
    assert "z" not in plan            # 2 terms < 5
    # prefixes equal to a shorter term are not double-planned at depth
    assert all(len(p) <= 3 for p in plan)


@pytest.fixture(scope="module")
def ap_index(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("ap_src")
    pq.write_table(generate_table(500, seed=13), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("ap_idx") / "idx")
    build_index(str(d), out, rows_per_partition=100)
    n = build_autoprefix(out, min_terms=5, max_len=3, concurrency=2)
    assert n > 0 and has_autoprefix(out)
    return out


def test_stored_unions_equal_expansion(ap_index):
    s = IndexSearcher(ap_index)
    ap = AutoPrefixReader(ap_index)
    assert len(ap) > 0
    checked = 0
    for p in ap._prefixes[:25].tolist():
        docs = ap.docs_for(p)
        terms = s.reader.terms_in_range(p, p + "\U0010FFFF", True, True)
        want = np.unique(np.concatenate(
            [s.reader.postings(t)[0] for t in terms]))
        assert np.array_equal(docs, want), p
        assert ap.doc_count(p) == want.size
        checked += 1
    assert checked > 0
    assert ap.docs_for("zz_not_a_prefix") is None


def test_searcher_fast_path_identity(ap_index):
    fast = IndexSearcher(ap_index)
    ap = fast._autoprefix()
    assert ap is not None and len(ap) > 0
    # a searcher that never sees the sidecar = the expansion control
    slow = IndexSearcher(ap_index)
    slow._autoprefix_reader = None
    probes = [str(p) for p in ap._prefixes[:10]] + ["val", "q", "zzqx"]
    for p in probes:
        a = fast.search(PrefixQuery(p), k=20)
        b = slow.search(PrefixQuery(p), k=20)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), p
        assert a["score"].to_pylist() == b["score"].to_pylist(), p


def test_empty_plan_writes_empty_sidecar(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("ap_src2")
    pq.write_table(generate_table(60, seed=3), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("ap_idx2") / "idx")
    build_index(str(d), out, rows_per_partition=60)
    n = build_autoprefix(out, min_terms=10 ** 6, max_len=2)
    assert n == 0 and has_autoprefix(out)
    s = IndexSearcher(out)
    assert s._autoprefix() is not None
    t = s.search(PrefixQuery("val"), k=5)  # falls back to expansion
    assert t.num_rows >= 0


def test_range_cover_identity(ap_index):
    """Sidecar-covered TermRangeQuery == full expansion on random and
    edge ranges (open bounds, inclusive/exclusive, empty)."""
    import random

    from lucene_solr_ray.index.autoprefix import range_docs
    from lucene_solr_ray.search import TermRangeQuery

    s = IndexSearcher(ap_index)
    ap = s._autoprefix()
    u = s.reader.unique_terms()
    rng = random.Random(17)
    cases = [(None, None, True, True), (None, str(u[5]), True, False),
             (str(u[-3]), None, True, True),
             ("zzz", "zzzz", True, True)]
    for _ in range(30):
        a, b = sorted(rng.sample(range(u.size), 2))
        cases.append((str(u[a]), str(u[b]),
                      rng.random() < 0.5, rng.random() < 0.5))
    for lower, upper, il, iu in cases:
        got = range_docs(ap, s.reader, lower, upper, il, iu)
        terms = s.reader.terms_in_range(lower, upper, il, iu)
        if terms:
            want = np.unique(np.concatenate(
                [s.reader.postings(t)[0] for t in terms]))
        else:
            want = np.empty(0, np.int64)
        assert np.array_equal(got, want), (lower, upper, il, iu)
        # and through the searcher (fast path) vs the expansion control
        slow = IndexSearcher(ap_index)
        slow._autoprefix_reader = None
        q = TermRangeQuery(lower, upper, il, iu)
        fa = s.search(q, k=15)
        sl = slow.search(q, k=15)
        assert fa["doc_id"].to_pylist() == sl["doc_id"].to_pylist()


def test_stale_sidecar_ignored_after_append(ap_index, tmp_path_factory,
                                            ray_session):
    """NRT append grows the index; the prefix unions trained before it
    would MISS the new docs — the searcher must ignore the sidecar."""
    import shutil

    from lucene_solr_ray.index import append_segment
    from lucene_solr_ray.index.autoprefix import is_stale

    d2 = str(tmp_path_factory.mktemp("ap_nrt") / "idx")
    shutil.copytree(ap_index, d2)
    assert not is_stale(d2)
    append_segment(d2, generate_table(50, seed=77))
    assert is_stale(d2)
    s = IndexSearcher(d2)
    assert s._autoprefix() is None  # falls back to expansion
    # and the expansion sees appended docs
    u = s.reader.unique_terms()
    assert s.max_doc > IndexSearcher(ap_index).max_doc


def test_sidecar_fuzz_rank_identity(ap_index):
    """Seeded fuzz: 120 random term/prefix/range/wildcard/bool queries
    must rank identically with and without the bloom + autoprefix fast
    paths (both sidecars attached vs neither)."""
    import random

    from lucene_solr_ray.codec.bloom import ensure_bloom
    from lucene_solr_ray.search import (
        BooleanQuery,
        TermQuery,
        TermRangeQuery,
        WildcardQuery,
    )

    fast = IndexSearcher(ap_index)
    ensure_bloom(ap_index, fast.reader)
    assert fast._autoprefix() is not None and fast.reader._bloom is not None
    slow = IndexSearcher(ap_index)
    slow._autoprefix_reader = None
    slow.reader.attach_bloom(None)
    u = [str(t) for t in fast.reader.unique_terms()]
    rng = random.Random(23)

    def rand_term():
        t = rng.choice(u)
        return t if rng.random() < 0.8 else t + "zz"

    def rand_query():
        r = rng.random()
        if r < 0.25:
            return TermQuery(rand_term())
        if r < 0.45:
            return PrefixQuery(rand_term()[: rng.randint(1, 3)])
        if r < 0.65:
            a, b = sorted((rand_term(), rand_term()))
            return TermRangeQuery(a, b, rng.random() < 0.5,
                                  rng.random() < 0.5)
        if r < 0.8:
            return WildcardQuery(rand_term()[:2] + "*")
        return BooleanQuery.build(
            should=[TermQuery(rand_term()), PrefixQuery(rand_term()[:2])],
            must_not=[TermQuery(rand_term())] if rng.random() < 0.3
            else [],
        )

    for i in range(120):
        q = rand_query()
        a = fast.search(q, k=12)
        b = slow.search(q, k=12)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), (i, q)
        assert a["score"].to_pylist() == b["score"].to_pylist(), (i, q)
