"""CollectorManager (search/CollectorManager.java analogue):
per-shard collectors + driver reduce must equal the single-process
collector over the same index — the control-vs-sharded strategy."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import BooleanQuery, IndexSearcher, TermQuery
from lucene_solr_ray.search.collectors import (
    ScoreHistogram,
    ScoreHistogramManager,
    TopN,
    TopNManager,
    TotalHitCount,
    TotalHitCountManager,
)
from lucene_solr_ray.search.distributed import collect_sharded
from lucene_solr_ray.sources import generate_table


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("cm_src")
    pq.write_table(generate_table(400, seed=7), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("cm_idx") / "idx")
    build_index(str(d), out, rows_per_partition=50)
    return out


@pytest.fixture(scope="module")
def query():
    return BooleanQuery.build(
        should=[TermQuery("return"), TermQuery("value")])


def test_total_hit_count_manager(idx, query):
    control = IndexSearcher(idx).collect(query, TotalHitCount())
    got = collect_sharded(idx, query, TotalHitCountManager(),
                          num_shards=4)
    assert got == control > 0


def test_topn_manager_rank_identical(idx, query):
    control = IndexSearcher(idx).collect(query, TopN(10))
    got = collect_sharded(idx, query, TopNManager(10), num_shards=4)
    assert [d for d, _ in got] == [d for d, _ in control]
    np.testing.assert_allclose([s for _, s in got],
                               [s for _, s in control], rtol=1e-6)


def test_histogram_manager_merges(idx, query):
    rng = (0.0, 30.0)
    control = IndexSearcher(idx).collect(
        query, ScoreHistogram(12, range=rng))
    got = collect_sharded(idx, query, ScoreHistogramManager(12, rng),
                          num_shards=4)
    assert np.asarray(got).sum() == np.asarray(control).sum() > 0
    np.testing.assert_array_equal(got, control)


def test_two_parallelism_levels_agree(idx, query):
    a = collect_sharded(idx, query, TopNManager(5), num_shards=2)
    b = collect_sharded(idx, query, TopNManager(5), num_shards=8)
    assert [d for d, _ in a] == [d for d, _ in b]


def test_diversified_semantics_unit():
    from lucene_solr_ray.search.collectors import DiversifiedTopN

    # keys per doc 0..7; scores force known order
    keys = np.array(["a", "a", "a", "b", "b", "c", "a", "c"])
    docs = np.arange(8)
    scores = np.array([9.0, 8.0, 7.0, 6.5, 6.0, 5.5, 5.0, 4.5],
                      np.float32)
    got = DiversifiedTopN(5, 2, keys)(docs, scores)
    # a: docs 0,1 (doc 2 and 6 capped); b: 3,4; c: 5 fills slot 5
    assert [d for d, _ in got] == [0, 1, 3, 4, 5]
    # cap=1 keeps only the best per key
    got1 = DiversifiedTopN(5, 1, keys)(docs, scores)
    assert [d for d, _ in got1] == [0, 3, 5]
    # tie scores break by doc asc
    tied = np.full(8, 1.0, np.float32)
    gott = DiversifiedTopN(4, 1, keys)(docs, tied)
    assert [d for d, _ in gott] == [0, 3, 5]


def test_diversified_equals_groupcap_oracle(idx, query):
    """Collector == 'rank per key, cap, global top-n' on real scores."""
    from lucene_solr_ray.search.collectors import DiversifiedTopN

    s = IndexSearcher(idx)
    docs, scores = s._score(query)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 5, s.max_doc).astype(str)
    got = s.collect(query, DiversifiedTopN(10, 2, keys))
    # brute force
    order = sorted(range(docs.size), key=lambda i: (-scores[i], docs[i]))
    seen: dict[str, int] = {}
    want = []
    for i in order:
        k = keys[docs[i]]
        if seen.get(k, 0) < 2:
            seen[k] = seen.get(k, 0) + 1
            want.append(int(docs[i]))
        if len(want) == 10:
            break
    assert [d for d, _ in got] == want


def test_diversified_manager_shard_invariant(idx, query):
    from lucene_solr_ray.search.collectors import (
        DiversifiedTopN,
        DiversifiedTopNManager,
    )

    s = IndexSearcher(idx)
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 4, s.max_doc).astype(str)
    control = s.collect(query, DiversifiedTopN(8, 2, keys))
    for shards in (2, 5):
        got = collect_sharded(idx, query,
                              DiversifiedTopNManager(8, 2, keys),
                              num_shards=shards)
        assert got == control


def test_time_limiting_collector(idx, query):
    from lucene_solr_ray.search.collectors import TopN
    from lucene_solr_ray.search.searcher import (
        TimeExceededException,
        TimeLimitingCollector,
    )

    s = IndexSearcher(idx)
    # fake clock: first call 0 (construction), then jumps past budget
    ticks = iter([0.0, 1000.0, 2000.0, 3000.0])
    tlc = TimeLimitingCollector(TopN(5), 100.0, greedy=True,
                                _clock=lambda: next(ticks))
    with pytest.raises(TimeExceededException) as ei:
        s.collect(query, tlc)
    assert ei.value.partial is not None  # greedy: partial rides along
    assert len(ei.value.partial) > 0
    # a generous budget completes normally
    ok = TimeLimitingCollector(TopN(5), 1e9)
    got = s.collect(query, ok)
    assert got == s.collect(query, TopN(5))


def test_searcher_lifetime_manager(idx):
    from lucene_solr_ray.search.searcher import SearcherLifetimeManager

    mgr = SearcherLifetimeManager()
    s1 = IndexSearcher(idx)
    tok = mgr.record(s1)
    assert mgr.acquire(tok) is s1
    assert mgr.record(s1) == tok  # idempotent
    assert mgr.acquire("nope") is None
    assert mgr.prune(max_age_sec=-1.0) == 1
    assert mgr.acquire(tok) is None
