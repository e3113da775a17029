"""Search-results clustering (ClusteringComponent results mode)."""

import pyarrow as pa




def test_cluster_search_results(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.query import MatchAllDocsQuery
    from lucene_solr_ray.stages.clustering import cluster_search_results

    spark = ["spark executor shuffle spark", "spark stage spark task",
             "executor spark shuffle partition"]
    hive = ["hive metastore warehouse hive", "hive table warehouse",
            "metastore hive warehouse query"]
    docs = spark + hive
    d = tmp_path_factory.mktemp("clucorpus")
    tbl = pa.table({
        "repo": pa.array(["r"] * len(docs)),
        "path": pa.array([f"p{i}" for i in range(len(docs))]),
        "commit": pa.array(["c"] * len(docs)),
        "lang": pa.array(["txt"] * len(docs)),
        "content": pa.array(docs),
    })
    pq.write_table(tbl, str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("cluindex"))
    build_index(str(d), out, rows_per_partition=10)
    s = IndexSearcher(out)

    clusters = cluster_search_results(
        s, MatchAllDocsQuery(), docs, k=10, n_clusters=2, label_terms=2)
    assert len(clusters) == 2
    sets = [set(m) for _l, m in clusters]
    assert {0, 1, 2} in sets and {3, 4, 5} in sets
    by_members = {frozenset(m): l for l, m in clusters}
    assert "spark" in by_members[frozenset({0, 1, 2})]
    assert "hive" in by_members[frozenset({3, 4, 5})]
