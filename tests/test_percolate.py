"""Distributed percolation (stages/percolate.py): saved searches over a
document stream vs an inverted-index ground truth."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def test_percolate_matches_forward_search(tmp_path_factory, ray_session):
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher, TermQuery
    from lucene_solr_ray.search.query import BooleanQuery, PhraseQuery
    from lucene_solr_ray.stages.percolate import percolate

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [" ".join(rng.choice(words, 12)) for _ in range(300)]
    docs[5] = "alpha beta " + docs[5]
    d = tmp_path_factory.mktemp("perc_src")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    }), str(d / "documents.parquet"))

    queries = {
        "t_alpha": TermQuery("alpha"),
        "b_and": BooleanQuery.build(must=[TermQuery("beta"),
                                          TermQuery("gamma")]),
        "b_not": BooleanQuery.build(must=[TermQuery("delta")],
                                    must_not=[TermQuery("zeta")]),
        "p_ab": PhraseQuery(("alpha", "beta")),
    }
    ds = rd.read_parquet(str(d / "documents.parquet")).repartition(4)
    got = percolate(ds, queries).to_pandas()
    by_q = {q: sorted(g["doc_id"]) for q, g in got.groupby("query")}

    # ground truth: forward search on a real positional index
    out = str(tmp_path_factory.mktemp("perc_idx") / "idx")
    build_index(str(d), out, text_field="text", store_positions=True,
                rows_per_partition=100)
    s = IndexSearcher(out)
    for name, q in queries.items():
        want = sorted(
            int(x) for x in s.search(q, k=1000)["doc_id"].to_numpy())
        assert by_q.get(name, []) == want, name
