"""gatherNodes / shortestPath graph streams (pipelines/graph.py) against
brute-force traversal on a small synthetic edge relation."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.pipelines.graph import (Hop, gather_nodes, graph_walk,
                                             shortest_path)


@pytest.fixture(scope="module")
def edges(ray_session):
    import ray.data as rd

    # 0->1,2  1->3  2->3,4  3->5  4->5  5->6 ; node 3 has in-degree 2
    src = np.array([0, 0, 1, 2, 2, 3, 4, 5], np.int64)
    dst = np.array([1, 2, 3, 3, 4, 5, 5, 6], np.int64)
    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def test_gather_one_hop(edges):
    out = gather_nodes(edges, np.array([0]), "src", "dst")
    assert out.tolist() == [1, 2]


def test_gather_max_doc_freq_prunes_hubs(edges):
    # from {1,2}: targets {3,4}; node 3 global in-degree 2 > 1 -> pruned
    out = gather_nodes(edges, np.array([1, 2]), "src", "dst",
                       max_doc_freq=1)
    assert out.tolist() == [4]


def test_walk_tracks_visited(edges):
    t = graph_walk(np.array([0]), "node",
                   [Hop(edges, "src", "dst", namespace="node")] * 3)
    got = {(r["node"], r["level"]) for r in t.to_pylist()}
    # level1 {1,2}, level2 {3,4}, level3 {5} (3,4 already seen are gone)
    assert got == {(1, 1), (2, 1), (3, 2), (4, 2), (5, 3)}


def test_walk_without_tracking_revisits(edges):
    t = graph_walk(np.array([0]), "node",
                   [Hop(edges, "src", "dst", namespace="node")] * 2,
                   track_traversal=False)
    lv2 = sorted(r["node"] for r in t.to_pylist() if r["level"] == 2)
    assert lv2 == [3, 4]  # same here, but nothing excluded by policy
    assert sorted(r["node"] for r in t.to_pylist()
                  if r["level"] == 1) == [1, 2]


def test_shortest_path_depths(edges):
    step = [Hop(edges, "src", "dst")]
    assert shortest_path(np.array([0]), np.array([0]), step)[0] == 0
    d, reached = shortest_path(np.array([0]), np.array([5]), step)
    assert (d, reached.tolist()) == (3, [5])
    d, _ = shortest_path(np.array([0]), np.array([6]), step)
    assert d == 4
    d, r = shortest_path(np.array([6]), np.array([0]), step, max_depth=3)
    assert d == -1 and r.size == 0


def test_shortest_path_composite_step(edges):
    # one BFS step = two hops => distances halve (rounding up)
    step2 = [Hop(edges, "src", "dst"), Hop(edges, "src", "dst")]
    d, reached = shortest_path(np.array([0]), np.array([6]), step2)
    assert (d, reached.tolist()) == (2, [6])
