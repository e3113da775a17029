"""JoinUtil query-time join with ScoreMode.{None,Avg,Max,Total}."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher, TermQuery
from lucene_solr_ray.search.joinutil import join_query


@pytest.fixture(scope="module")
def ju_idx(tmp_path_factory, ray_session):
    # docs: product reviews (from side) and products (to side) in ONE
    # doc space: product_id is the join value
    rows = [
        # reviews: content mentions "great"; product_id links
        (0, 10, "great product truly great"),
        (1, 10, "great value"),
        (2, 20, "great once"),
        (3, 30, "terrible thing"),
        # products: content is the catalog entry; id == own product_id
        (4, 10, "product ten catalog"),
        (5, 20, "product twenty catalog"),
        (6, 30, "product thirty catalog"),
        (7, 40, "product forty catalog"),
    ]
    d = tmp_path_factory.mktemp("ju_src")
    pq.write_table(pa.table({
        "doc_key": pa.array([r[0] for r in rows], pa.int64()),
        "product_id": pa.array([r[1] for r in rows], pa.int64()),
        "content": pa.array([r[2] for r in rows]),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("ju_idx") / "idx")
    build_index(str(d), out, text_field="content", rows_per_partition=10)
    return out


def test_join_score_modes(ju_idx):
    s = IndexSearcher(ju_idx)
    q = TermQuery("great")
    from_docs, from_scores = s._score(q)
    assert set(from_docs.tolist()) == {0, 1, 2}

    # none: membership only, score 1
    docs, scores = join_query(s, "product_id", q, "product_id",
                              score_mode="none")
    # joined docs = every doc whose product_id in {10, 20} (including
    # the from docs themselves — JoinUtil semantics are value-based)
    want = {0, 1, 2, 4, 5}
    assert set(docs.tolist()) == want
    assert set(np.round(scores, 6).tolist()) == {1.0}

    # aggregate parity per mode, vs a dict-built reference
    pid = {0: 10, 1: 10, 2: 20}
    fsc = {int(d_): float(x) for d_, x in zip(from_docs, from_scores)}
    by_val = {}
    for d_, v in pid.items():
        by_val.setdefault(v, []).append(fsc[d_])
    for mode, fn in [("total", sum), ("max", max),
                     ("avg", lambda xs: sum(xs) / len(xs))]:
        docs, scores = join_query(s, "product_id", q, "product_id",
                                  score_mode=mode)
        got = {int(d_): float(x) for d_, x in zip(docs, scores)}
        for d_, v in ((4, 10), (5, 20)):
            assert abs(got[d_] - fn(by_val[v])) < 1e-6, (mode, d_)

    # no match for unseen values
    assert 7 not in set(docs.tolist())
