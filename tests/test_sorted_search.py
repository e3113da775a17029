"""TopFieldCollector analogue: sort-by-field on query hits, single vs
sharded rank identity, and a brute-force check."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher, TermQuery
from lucene_solr_ray.search.distributed import search_by_field_sharded


@pytest.fixture(scope="module")
def sidx(tmp_path_factory, ray_session, sf_dir):
    out = str(tmp_path_factory.mktemp("sortidx"))
    build_index(os.path.join(sf_dir, "documents.parquet"), out,
                text_field="text", analyzer="simple",
                rows_per_partition=100)
    return out


def test_search_by_field_brute_force(sidx, sf_dir):
    s = IndexSearcher(sidx)
    q = TermQuery("table")
    t = s.search_by_field(q, 10, "n_chars")
    docs = s._docs_only(q)
    vals = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["n_chars"])["n_chars"].to_numpy()
    order = np.lexsort((docs, -vals[docs]))[:10]
    assert t["doc_id"].to_pylist() == docs[order].tolist()
    assert t["n_chars"].to_pylist() == vals[docs][order].tolist()


def test_search_by_field_ascending(sidx):
    s = IndexSearcher(sidx)
    t = s.search_by_field(TermQuery("table"), 5, "n_chars",
                          descending=False)
    v = t["n_chars"].to_pylist()
    assert v == sorted(v)


def test_sharded_rank_identity(sidx, ray_session):
    s = IndexSearcher(sidx)
    q = TermQuery("table")
    want = s.search_by_field(q, 15, "n_chars").to_pydict()
    for n in (2, 4):
        got = search_by_field_sharded(sidx, q, 15, "n_chars",
                                      num_shards=n).to_pydict()
        assert got == want, n


def test_serving_pool_matches_single(sidx, ray_session):
    from lucene_solr_ray.search.distributed import ServingPool

    pool = ServingPool(sidx, k=5, prune=False, num_actors=2)
    t = pool.search_many(["table", "value scan", "zzzmissing"])
    s = IndexSearcher(sidx)
    from lucene_solr_ray.analysis import get_analyzer
    from lucene_solr_ray.search.query import parse_query

    ana = get_analyzer("simple")
    for qid, qtext in enumerate(["table", "value scan", "zzzmissing"]):
        want = s.search(parse_query(qtext, ana), k=5)
        m = [i for i, q in enumerate(t["query_id"].to_pylist()) if q == qid]
        assert [t["doc_id"][i].as_py() for i in m] == \
            want["doc_id"].to_pylist(), qtext


def test_sharded_serving_pool_rank_identity(sidx, ray_session):
    from lucene_solr_ray.search.distributed import ShardedServingPool
    from lucene_solr_ray.search.query import BooleanQuery

    pool = ShardedServingPool(sidx, num_shards=3)
    s = IndexSearcher(sidx)
    queries = [
        TermQuery("table"),
        BooleanQuery.build(should=[TermQuery("table"),
                                   TermQuery("vector")]),
        BooleanQuery.build(must=[TermQuery("table")],
                           must_not=[TermQuery("vector")]),
        TermQuery("zzznothere"),
    ]
    for q in queries:
        want = s.search(q, k=12).to_pydict()
        got = pool.search(q, k=12).to_pydict()
        assert got["doc_id"] == want["doc_id"], q
        assert got["score"] == want["score"], q


def test_search_by_field_cursor_paging(sidx):
    s = IndexSearcher(sidx)
    q = TermQuery("table")
    full = s.search_by_field(q, 30, "n_chars")
    # page through 3 pages of 10 and reassemble
    pages = []
    after = None
    for _ in range(3):
        p = s.search_by_field(q, 10, "n_chars", after=after)
        if p.num_rows == 0:
            break
        pages.append(p)
        after = (p["n_chars"][p.num_rows - 1].as_py(),
                 p["doc_id"][p.num_rows - 1].as_py())
    got_docs = [d for p in pages for d in p["doc_id"].to_pylist()]
    assert got_docs == full["doc_id"].to_pylist()


def test_docvalues_sidecar(tmp_path_factory, ray_session):
    """DocValues writers (Lucene50DocValuesFormat .dvd analogue):
    build_index(docvalues_fields=[...]) writes per-segment column
    sidecars under the index dir; field sorts read the index-resident
    store and match the source-parquet path exactly."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher, TermQuery

    rng = np.random.default_rng(6)
    n = 200
    d = tmp_path_factory.mktemp("dv_src")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "content": pa.array(["common w%d" % (i % 7) for i in range(n)]),
        "price": pa.array(rng.integers(0, 10_000, n)),
    }), str(d / "docs.parquet"), row_group_size=50)
    out = str(tmp_path_factory.mktemp("dv_idx") / "idx")
    build_index(str(d), out, text_field="content",
                docvalues_fields=["price"], rows_per_partition=50)
    assert os.path.isdir(os.path.join(out, "docvalues"))
    assert len(os.listdir(os.path.join(out, "docvalues"))) == 4
    s = IndexSearcher(out)
    src = pq.read_table(str(d / "docs.parquet"))["price"].to_numpy()
    assert np.array_equal(s.docvalues("price"), src)  # sidecar == source
    t = s.search_by_field(TermQuery("common"), k=5, field="price")
    want = np.argsort(-src, kind="stable")[:5]
    # tie-break: doc asc — stable argsort on negated values matches
    assert t["doc_id"].to_pylist() == want.tolist()
