"""Replication (ReplicationHandler/SnapPuller analogue) + corpus loaders."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index, merge_index
from lucene_solr_ray.search import IndexSearcher, TermQuery
from lucene_solr_ray.search.searcher import SearcherManager
from lucene_solr_ray.sources import generate_table
from lucene_solr_ray.state.replication import index_generation, replicate


@pytest.fixture()
def master(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("rep_corpus")
    pq.write_table(generate_table(300, seed=21), str(d / "c.parquet"),
                   row_group_size=100)
    out = str(tmp_path_factory.mktemp("rep_master"))
    build_index(str(d), out, rows_per_partition=100)
    merge_index(out)
    return out


def test_replicate_then_identical_results(master, tmp_path_factory):
    replica = str(tmp_path_factory.mktemp("rep_replica"))
    r1 = replicate(master, replica)
    assert not r1["up_to_date"] and r1["copied"] > 0
    a = IndexSearcher(master).search(TermQuery("return"), k=10)
    b = IndexSearcher(replica).search(TermQuery("return"), k=10)
    assert a.to_pydict() == b.to_pydict()
    # second pass is a no-op
    r2 = replicate(master, replica)
    assert r2["up_to_date"] and r2["copied"] == 0


def test_replica_follows_master_updates(master, tmp_path_factory):
    replica = str(tmp_path_factory.mktemp("rep_replica2"))
    replicate(master, replica)
    mgr = SearcherManager(replica)

    from lucene_solr_ray.index.updates import update_documents

    changed = pa.table({
        "repo": pa.array(["r"]), "path": pa.array(["p"]),
        "commit": pa.array(["c"]), "lang": pa.array(["py"]),
        "content": pa.array(["replicated freshword content"]),
    })
    # master gains a delta segment (append; no matching key col -> use
    # append via update on a non-existent key set is fine: delete 0)
    from lucene_solr_ray.index.updates import append_segment

    append_segment(master, changed)
    r = replicate(master, replica)
    assert not r["up_to_date"]
    assert mgr.maybe_refresh()  # generation change seen
    s = mgr.acquire()
    assert s.count(TermQuery("freshword")) == 1


def test_loaders_csv_json(tmp_path_factory, ray_session):
    from lucene_solr_ray.sources.loaders import ingest_to_index, load_corpus

    d = tmp_path_factory.mktemp("loader_src")
    csv = d / "docs.csv"
    csv.write_text("id,body\n1,alpha beta\n2,beta gamma\n")
    jl = d / "docs.json"
    jl.write_text('{"id": 3, "body": "gamma delta"}\n'
                  '{"id": 4, "body": "delta epsilon"}\n')

    ds = load_corpus(str(csv), rename={"body": "content"})
    assert set(ds.schema().names) == {"id", "content"}
    assert ds.count() == 2

    out = str(tmp_path_factory.mktemp("loader_idx"))
    ingest_to_index(str(jl), out, fmt="json",
                    rename={"body": "content"}, rows_per_partition=10)
    s = IndexSearcher(out)
    assert s.count(TermQuery("delta")) == 2

    # Solr update-XML now loads natively; Tika binary extraction stays
    # out of scope (no JVM in this sandbox)
    with pytest.raises(NotImplementedError):
        load_corpus("x.pdf", fmt="tika")


def test_backup_restore_roundtrip(tmp_path_factory, ray_session):
    """Snapshot backup + restore (SnapShooter/RestoreCore): the restored
    index answers queries identically; snapshots survive source deletes
    made AFTER the snapshot (point-in-time semantics)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index, delete_docs
    from lucene_solr_ray.search import IndexSearcher, TermQuery
    from lucene_solr_ray.state.replication import (
        backup_index,
        restore_index,
    )

    d = tmp_path_factory.mktemp("bk_corpus")
    pq.write_table(pa.table({
        "doc_key": pa.array(range(20), pa.int64()),
        "content": pa.array([f"common word{i % 3} t{i}"
                             for i in range(20)]),
    }), str(d / "docs.parquet"))
    src = str(tmp_path_factory.mktemp("bk_src") / "idx")
    build_index(str(d), src, text_field="content", rows_per_partition=10)

    want = {int(x) for x in
            IndexSearcher(src)._docs_only(TermQuery("common"))}
    root = str(tmp_path_factory.mktemp("bk_snaps"))
    snap = backup_index(src, root)
    assert backup_index(src, root) == snap  # idempotent per generation

    # post-snapshot source mutation must NOT leak into the snapshot
    delete_docs(src, np.asarray([0, 1], np.int64))
    assert len(IndexSearcher(src)._docs_only(TermQuery("common"))) \
        == len(want) - 2

    restored = str(tmp_path_factory.mktemp("bk_restored") / "idx")
    restore_index(snap, restored)
    got = {int(x) for x in
           IndexSearcher(restored)._docs_only(TermQuery("common"))}
    assert got == want


def test_replication_carries_docvalues_sidecars(tmp_path_factory,
                                                ray_session):
    """Regression: docvalues sidecars and DV update generations must
    replicate and back up (they were missing from the sync dir list);
    a replica sorts by the DV field identically to the master."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.index.updates import update_numeric_docvalues
    from lucene_solr_ray.search import IndexSearcher, TermQuery
    from lucene_solr_ray.state.replication import (
        backup_index,
        replicate,
        restore_index,
    )

    d = tmp_path_factory.mktemp("dvrep_src")
    pq.write_table(pa.table({
        "doc_key": pa.array(range(12), pa.int64()),
        "rank": pa.array([i * 2 for i in range(12)], pa.int64()),
        "content": pa.array([f"common t{i}" for i in range(12)]),
    }), str(d / "docs.parquet"))
    src = str(tmp_path_factory.mktemp("dvrep_idx") / "idx")
    build_index(str(d), src, text_field="content",
                docvalues_fields=["rank"], rows_per_partition=6)
    # a DV update generation on top of the sidecar
    update_numeric_docvalues(
        src, "doc_key", "rank",
        pa.table({"doc_key": pa.array([3], pa.int64()),
                  "rank": pa.array([999], pa.int64())}))

    q = TermQuery("common")
    want = IndexSearcher(src).search_by_field(q, 3, "rank") \
        ["doc_id"].to_pylist()
    assert want[0] == 3  # the updated doc leads

    rep = str(tmp_path_factory.mktemp("dvrep_replica") / "rep")
    replicate(src, rep)
    got = IndexSearcher(rep).search_by_field(q, 3, "rank") \
        ["doc_id"].to_pylist()
    assert got == want

    snaps = str(tmp_path_factory.mktemp("dvrep_snaps"))
    snap = backup_index(src, snaps)
    restored = str(tmp_path_factory.mktemp("dvrep_restored") / "idx")
    restore_index(snap, restored)
    got2 = IndexSearcher(restored).search_by_field(q, 3, "rank") \
        ["doc_id"].to_pylist()
    assert got2 == want


def test_replication_carries_analyzer_and_external_files(
        tmp_path_factory, ray_session):
    """analyzer.pkl (@pickled chains) and external_* value files are
    commit companions — a replica resolves the analyzer and serves the
    same function-query values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.analysis.analyzers import WhitespaceAnalyzer
    from lucene_solr_ray.index import IndexManifest, build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.state.replication import replicate

    d = tmp_path_factory.mktemp("axrep_src")
    pq.write_table(pa.table({
        "doc_key": pa.array([0, 1], pa.int64()),
        "content": pa.array(["Alpha beta", "Gamma delta"]),
    }), str(d / "docs.parquet"))
    src = str(tmp_path_factory.mktemp("axrep_idx") / "idx")
    build_index(str(d), src, text_field="content",
                analyzer=WhitespaceAnalyzer(), rows_per_partition=10)
    import os

    with open(os.path.join(src, "external_boost"), "w") as f:
        f.write("0=7.5\n1=2.5\n")

    rep = str(tmp_path_factory.mktemp("axrep_replica") / "rep")
    replicate(src, rep)
    man = IndexManifest.load(rep)
    assert type(man.resolve_analyzer()).__name__ == "WhitespaceAnalyzer"
    assert IndexSearcher(rep).docvalues("external_boost").tolist() \
        == [7.5, 2.5]

    # backup + restore of an analyzer.pkl index (regression: the extras
    # copy used to SameFileError on the already-hardlinked pickle)
    from lucene_solr_ray.state.replication import (
        backup_index,
        restore_index,
    )

    snaps = str(tmp_path_factory.mktemp("axrep_snaps"))
    snap = backup_index(src, snaps)
    restored = str(tmp_path_factory.mktemp("axrep_restored") / "idx")
    restore_index(snap, restored)
    rman = IndexManifest.load(restored)
    assert type(rman.resolve_analyzer()).__name__ == "WhitespaceAnalyzer"
    assert IndexSearcher(restored).docvalues("external_boost").tolist() \
        == [7.5, 2.5]
