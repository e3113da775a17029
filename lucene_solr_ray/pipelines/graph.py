"""Graph streaming expressions: gatherNodes / shortestPath over Datasets.

Restates Solr's graph traversal streams
(``solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/
GatherNodesStream.java`` and ``ShortestPathStream.java``): a breadth-first
walk where each hop joins the current frontier against an edge relation
(``from_field`` -> ``to_field``) and gathers the distinct target nodes.

Ray-Data shape (the 100 TB design):
- The EDGE TABLE is the big thing; it streams through ``map_batches`` once
  per hop with the frontier broadcast via ``ray.put`` (one object-store
  copy, zero-copy read per task). Nothing edge-scale ever materializes.
- The FRONTIER is driver-held, like the reference: GatherNodesStream keeps
  the gathered node set in memory on the worker that runs the expression,
  so "frontier fits in one process" is the reference's own contract.
- ``max_doc_freq`` is the reference's maxDocFreq hub-pruning knob: targets
  whose GLOBAL in-edge count exceeds it are dropped. That global count is
  a second streamed pass restricted to the candidate set (broadcast), so
  its driver-side partial merge is bounded by candidates, never by the
  edge table.
- ``track_traversal`` (reference: trackTraversal) keeps a per-field
  visited set so a node is emitted at its FIRST reach level only.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa


@dataclass
class Hop:
    """One traversal step over an edge relation.

    ``edges`` is a ``ray.data.Dataset`` (re-executable; each hop streams
    it). ``max_doc_freq``: drop gathered targets whose total in-edge count
    over the WHOLE relation exceeds this (hub pruning).
    """

    edges: object
    from_field: str
    to_field: str
    max_doc_freq: Optional[int] = None
    namespace: Optional[str] = None  # visited-set key; default to_field
                                     # (set it when two hops' differently
                                     # named fields hold the SAME id space,
                                     # e.g. o_orderkey / l_orderkey)


def _sorted_ref(values: np.ndarray):
    import ray

    return ray.put(np.sort(np.asarray(values)))


def _member_mask(keys: np.ndarray, sorted_vals: np.ndarray) -> np.ndarray:
    if sorted_vals.size == 0 or keys.size == 0:
        return np.zeros(keys.size, bool)
    pos = np.searchsorted(sorted_vals, keys)
    return (pos < sorted_vals.size) & (
        sorted_vals[np.minimum(pos, sorted_vals.size - 1)] == keys)


def _merge_count_parts(parts: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-batch (node, cnt) partial rows on the driver (bounded by
    the number of distinct gathered nodes per batch, not by edges)."""
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    nodes = np.asarray([p["node"] for p in parts])
    cnts = np.asarray([p["cnt"] for p in parts], np.int64)
    uniq, inv = np.unique(nodes, return_inverse=True)
    tot = np.zeros(uniq.size, np.int64)
    np.add.at(tot, inv, cnts)
    return uniq, tot


def gather_nodes(edges, frontier: np.ndarray, from_field: str,
                 to_field: str, *,
                 max_doc_freq: Optional[int] = None) -> np.ndarray:
    """One gatherNodes hop: distinct ``to_field`` values over edges whose
    ``from_field`` is in ``frontier``, optionally hub-pruned.

    Returns the gathered node ids (sorted, distinct).
    """
    import ray

    frontier = np.asarray(frontier)
    if frontier.size == 0:
        return frontier[:0]
    f_ref = _sorted_ref(frontier)

    def expand(b: pa.Table) -> pa.Table:
        fr = ray.get(f_ref)
        k = b[from_field].to_numpy(zero_copy_only=False)
        hit = _member_mask(k, fr)
        tgt = b[to_field].to_numpy(zero_copy_only=False)[hit]
        vals, counts = np.unique(tgt, return_counts=True)
        return pa.table({"node": pa.array(vals),
                         "cnt": pa.array(counts.astype(np.int64))})

    parts = (edges.map_batches(expand, batch_format="pyarrow")
             .take_all())
    nodes, _ = _merge_count_parts(parts)
    if max_doc_freq is None or nodes.size == 0:
        return nodes

    # Second pass: GLOBAL in-degree of the candidates (reference maxDocFreq
    # is the term's index docFreq, not the within-frontier count).
    c_ref = _sorted_ref(nodes)

    def global_count(b: pa.Table) -> pa.Table:
        cand = ray.get(c_ref)
        tgt = b[to_field].to_numpy(zero_copy_only=False)
        tgt = tgt[_member_mask(tgt, cand)]
        vals, counts = np.unique(tgt, return_counts=True)
        return pa.table({"node": pa.array(vals),
                         "cnt": pa.array(counts.astype(np.int64))})

    parts = (edges.map_batches(global_count, batch_format="pyarrow")
             .take_all())
    g_nodes, g_cnt = _merge_count_parts(parts)
    return g_nodes[g_cnt <= max_doc_freq]


def graph_walk(seeds: np.ndarray, seed_field: str, hops: list[Hop], *,
               track_traversal: bool = True) -> pa.Table:
    """Multi-hop gatherNodes walk. Each hop may traverse a DIFFERENT edge
    relation (the reference composes nested gatherNodes expressions the
    same way). Returns (node, field, level) for every node first reached
    at each level, level 1..len(hops), sorted by (level, node).

    ``track_traversal``: per-field visited sets — a node already reached
    under the same field (including the seeds under ``seed_field``) is not
    re-emitted.
    """
    visited: dict[str, np.ndarray] = {
        seed_field: np.unique(np.asarray(seeds))}
    frontier = visited[seed_field]
    out_nodes: list[np.ndarray] = []
    out_levels: list[int] = []
    out_fields: list[str] = []
    for level, hop in enumerate(hops, start=1):
        ns = hop.namespace or hop.to_field
        gathered = gather_nodes(hop.edges, frontier, hop.from_field,
                                hop.to_field,
                                max_doc_freq=hop.max_doc_freq)
        if track_traversal:
            seen = visited.get(ns)
            if seen is not None and seen.size:
                gathered = gathered[~_member_mask(gathered, seen)]
            visited[ns] = (
                np.union1d(seen, gathered) if seen is not None
                else gathered)
        out_nodes.append(gathered)
        out_levels.append(level)
        out_fields.append(ns)
        frontier = gathered
        if frontier.size == 0:
            break
    nodes = (np.concatenate(out_nodes) if out_nodes
             else np.empty(0, np.int64))
    levels = np.concatenate([
        np.full(n.size, lv, np.int64)
        for n, lv in zip(out_nodes, out_levels)]) if out_nodes else (
            np.empty(0, np.int64))
    fields = sum(([f] * n.size for n, f in zip(out_nodes, out_fields)), [])
    return pa.table({
        "node": pa.array(nodes.astype(np.int64), pa.int64()),
        "field": pa.array(fields, pa.string()),
        "level": pa.array(levels, pa.int64()),
    })


def shortest_path(seeds: np.ndarray, targets: np.ndarray,
                  step_hops: list[Hop], *, max_depth: int = 6
                  ) -> tuple[int, np.ndarray]:
    """ShortestPathStream: BFS from ``seeds`` until any of ``targets`` is
    reached. One BFS STEP may be a composite of several hops (e.g. the
    customer->order->part->order->customer co-purchase step), mirroring
    how the reference chains gatherNodes inside shortestPath.

    Returns ``(depth, reached)``: the number of composite steps to the
    first target reach and the target node ids reached at that depth
    (sorted). ``(-1, empty)`` if unreachable within ``max_depth``.

    Node ids at the STEP boundary (the composite's final ``to_field``)
    share one namespace, so visited tracking uses a single set there;
    intermediate hop fields are not tracked (each step re-derives them).
    """
    targets = np.sort(np.asarray(targets))
    frontier = np.unique(np.asarray(seeds))
    visited = frontier.copy()
    hit0 = frontier[_member_mask(frontier, targets)]
    if hit0.size:
        return 0, hit0
    for depth in range(1, max_depth + 1):
        cur = frontier
        for hop in step_hops:
            cur = gather_nodes(hop.edges, cur, hop.from_field,
                               hop.to_field,
                               max_doc_freq=hop.max_doc_freq)
            if cur.size == 0:
                break
        cur = cur[~_member_mask(cur, visited)]
        if cur.size == 0:
            return -1, cur
        reached = cur[_member_mask(cur, targets)]
        if reached.size:
            return depth, reached
        visited = np.union1d(visited, cur)
        frontier = cur
    return -1, frontier[:0]
