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
