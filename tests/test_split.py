"""SPLITSHARD (SolrIndexSplitter): children share immutable segments,
complementary live-docs masks, results disjoint and union-exact."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index, merge_index
from lucene_solr_ray.index.split import default_assign, split_index
from lucene_solr_ray.search import IndexSearcher, TermQuery, parse_query


@pytest.fixture(scope="module")
def parent_idx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("split_corpus")
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "common", "rare"]
    texts = [" ".join(rng.choice(vocab, size=12).tolist())
             for _ in range(400)]
    texts[7] = "rare singleton marker"
    pq.write_table(pa.table({
        "doc_key": pa.array(range(len(texts)), pa.int64()),
        "content": pa.array(texts),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("split_parent") / "idx")
    build_index(str(d), out, text_field="content", rows_per_partition=100)
    merge_index(out)
    return out


def test_split_disjoint_union(parent_idx, tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("split_children")
    children = [str(base / f"c{i}") for i in range(3)]
    stats = split_index(parent_idx, children)
    assert sum(stats["docs_per_child"]) == stats["max_doc"]
    assert min(stats["docs_per_child"]) > 0

    s_parent = IndexSearcher(parent_idx)
    s_kids = [IndexSearcher(c) for c in children]
    from lucene_solr_ray.analysis import get_analyzer

    ana = get_analyzer("standard")
    for qtext in ["common", "alpha beta", "+gamma -delta", "rare",
                  "marker"]:
        q = parse_query(qtext, ana)
        want = {int(x) for x in s_parent._docs_only(q)}
        parts = [{int(x) for x in s._docs_only(q)} for s in s_kids]
        got = set().union(*parts)
        assert got == want, qtext
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                assert not (parts[i] & parts[j]), (qtext, i, j)


def test_split_inherits_parent_deletes(parent_idx, tmp_path_factory,
                                       ray_session):
    import shutil

    from lucene_solr_ray.index import delete_docs as del_docs

    # copy parent so the module-scoped fixture stays pristine
    pcopy = str(tmp_path_factory.mktemp("split_delparent") / "idx")
    shutil.copytree(parent_idx, pcopy)
    del_docs(pcopy, np.asarray([7], np.int64))  # kill the marker doc
    base = tmp_path_factory.mktemp("split_del_children")
    children = [str(base / f"c{i}") for i in range(2)]
    split_index(pcopy, children)
    from lucene_solr_ray.analysis import get_analyzer

    q = parse_query("marker", get_analyzer("standard"))
    for c in children:
        assert IndexSearcher(c)._docs_only(q).size == 0


def test_default_assign_balanced():
    a = default_assign(np.arange(100_000, dtype=np.int64), 4)
    counts = np.bincount(a, minlength=4)
    assert counts.min() > 0.22 * 100_000
    # contiguous ranges don't all land in one child
    head = default_assign(np.arange(16, dtype=np.int64), 4)
    assert len(set(head.tolist())) > 1


def test_split_shares_payload_inodes(parent_idx, tmp_path_factory,
                                     ray_session):
    """Children hardlink the parent's immutable .bin payloads — a split
    is metadata-sized, not corpus-sized."""
    import os

    base = tmp_path_factory.mktemp("split_link_children")
    children = [str(base / f"c{i}") for i in range(2)]
    split_index(parent_idx, children)
    for root, _, files in os.walk(parent_idx):
        for f in files:
            if not f.endswith(".bin"):
                continue
            rel = os.path.relpath(os.path.join(root, f), parent_idx)
            src = os.stat(os.path.join(parent_idx, rel))
            for c in children:
                dst = os.stat(os.path.join(c, rel))
                assert dst.st_ino == src.st_ino


def test_child_mutations_do_not_leak(parent_idx, tmp_path_factory,
                                     ray_session):
    """Children share immutable payload inodes, so every mutation path
    (delete generations, appends) must create NEW files: deleting in
    one child affects neither its sibling nor the parent."""
    from lucene_solr_ray.index import delete_docs as del_docs
    from lucene_solr_ray.search import parse_query
    from lucene_solr_ray.analysis import get_analyzer

    base = tmp_path_factory.mktemp("split_mut_children")
    children = [str(base / f"c{i}") for i in range(2)]
    split_index(parent_idx, children)

    q = parse_query("common", get_analyzer("standard"))
    before_parent = set(IndexSearcher(parent_idx)._docs_only(q).tolist())
    c0 = set(IndexSearcher(children[0])._docs_only(q).tolist())
    c1 = set(IndexSearcher(children[1])._docs_only(q).tolist())
    victim = sorted(c0)[0]
    del_docs(children[0], np.asarray([victim], np.int64))

    after_c0 = set(IndexSearcher(children[0])._docs_only(q).tolist())
    assert after_c0 == c0 - {victim}
    # sibling and parent unchanged
    assert set(IndexSearcher(children[1])._docs_only(q).tolist()) == c1
    assert set(IndexSearcher(parent_idx)._docs_only(q).tolist()) \
        == before_parent
