"""Minimal acyclic FST term dictionary (``lucene/core/.../util/fst/``).

The reference's BlockTree terms dictionary keys its blocks with an FST
(``util/fst/Builder.java``: incremental construction over sorted input
with a suffix-sharing node registry; ``FSTEnum`` walks it by ordinal /
by term). This module restates that structure as a minimal acyclic
finite-state automaton over UTF-8 bytes built with the Daciuk et al.
(2000) incremental algorithm, plus per-arc subtree counts — the classic
"perfect hashing" FSA trick (also how morfologik stores its lexicon):

- shared prefixes are stored once on the path in (a trie would too);
- shared SUFFIXES are stored once because nodes are registered by
  (final_count, arcs) signature — the part a front-coded block dict
  cannot share;
- every term maps to its sorted ORDINAL and back without storing
  ordinals: descending an arc adds the subtree counts of the arcs to
  its left (plus the node's own final count), so term -> ordinal is
  ``searchsorted`` and ordinal -> term is a counted descent. Outputs
  never need minimization-breaking per-arc values (Lucene pushes
  ordinal outputs toward the root for the same reason).

Duplicate rows (the posting reader keeps one row per (term, chunk))
are carried as a per-node ``final_count`` multiplicity, so this is a
drop-in for :class:`..search.termdict.FrontCodedTerms` /
:class:`NumpyTerms` behind the same API; ``tests/test_fst.py`` asserts
rank-identity and that UTF-8 byte order equals codepoint order (which
Python string comparison uses).

Memory: four flat numpy arrays (arc label u8, arc target i64, arc
left-count prefix i64, node arc-offset i64) + a final-count i64 per
node — typically well under the front-coded blob for suffix-heavy
vocabularies, and O(1) Python objects regardless of term count.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np


class _Node:
    __slots__ = ("arcs", "final_count")

    def __init__(self) -> None:
        self.arcs: list[list] = []  # [label:int, child:_Node|int] appended
        self.final_count = 0        # in label order (input is sorted)


class FSTTerms:
    """Sorted term store over a minimal acyclic automaton."""

    def __init__(self, terms) -> None:
        # ---- Daciuk incremental construction over sorted input ----
        register: dict[tuple, int] = {}
        # frozen-node storage (parallel lists during build)
        f_final: list[int] = []
        f_count: list[int] = []
        f_arcs: list[list[tuple[int, int]]] = []

        def freeze(node: _Node) -> int:
            # children are already frozen ids
            arcs = tuple((lb, ch) for lb, ch in node.arcs)
            sig = (node.final_count, arcs)
            nid = register.get(sig)
            if nid is not None:
                return nid
            nid = len(f_final)
            register[sig] = nid
            f_final.append(node.final_count)
            f_count.append(node.final_count
                           + sum(f_count[ch] for _, ch in arcs))
            f_arcs.append(list(arcs))
            return nid

        root = _Node()
        path: list[_Node] = [root]   # unfrozen spine of the previous word
        prev = b""
        n_terms = 0
        for t in terms:
            tb = t.encode("utf-8") if isinstance(t, str) else bytes(t)
            if n_terms and tb < prev:
                raise ValueError("terms must be sorted")
            n_terms += 1
            if tb == prev:
                path[-1].final_count += 1
                continue
            # common prefix with the previous word
            cpl = 0
            m = min(len(tb), len(prev))
            while cpl < m and tb[cpl] == prev[cpl]:
                cpl += 1
            # freeze the previous word's tail below the common prefix
            for i in range(len(prev), cpl, -1):
                fid = freeze(path[i])
                path[i - 1].arcs[-1][1] = fid
                path.pop()
            # extend with fresh nodes for the new suffix
            for b in tb[cpl:]:
                child = _Node()
                path[-1].arcs.append([b, child])
                path.append(child)
            path[-1].final_count = 1
            prev = tb
        for i in range(len(prev), 0, -1):
            fid = freeze(path[i])
            path[i - 1].arcs[-1][1] = fid
            path.pop()
        root_id = freeze(root)

        # ---- flatten to numpy ----
        n_nodes = len(f_final)
        arc_off = np.zeros(n_nodes + 1, np.int64)
        for i, arcs in enumerate(f_arcs):
            arc_off[i + 1] = arc_off[i] + len(arcs)
        n_arcs = int(arc_off[-1])
        labels = np.zeros(n_arcs, np.uint8)
        targets = np.zeros(n_arcs, np.int64)
        # left[j] for arc j within its node = node.final_count + total
        # subtree counts of this node's arcs left of j (ordinal offset
        # added when descending arc j)
        left = np.zeros(n_arcs, np.int64)
        for i, arcs in enumerate(f_arcs):
            base = arc_off[i]
            acc = f_final[i]
            for k, (lb, ch) in enumerate(arcs):
                labels[base + k] = lb
                targets[base + k] = ch
                left[base + k] = acc
                acc += f_count[ch]
        self._labels = labels
        self._targets = targets
        self._left = left
        self._arc_off = arc_off
        self._final = np.asarray(f_final, np.int64)
        self._count = np.asarray(f_count, np.int64)
        self._root = root_id
        self._n = n_terms

    # ---- helpers ----

    def _node_arcs(self, node: int):
        lo, hi = self._arc_off[node], self._arc_off[node + 1]
        return lo, hi

    def __len__(self) -> int:
        return self._n

    def searchsorted(self, term: str, side: str = "left") -> int:
        tb = term.encode("utf-8")
        node = self._root
        acc = 0
        for b in tb:
            lo, hi = self._node_arcs(node)
            lbls = self._labels[lo:hi]
            j = int(np.searchsorted(lbls, b))
            if j < hi - lo and lbls[j] == b:
                acc += int(self._left[lo + j])
                node = int(self._targets[lo + j])
            else:
                # no arc for this byte: everything smaller in this
                # subtree = node final + full subtrees left of the
                # insertion point
                if j < hi - lo:
                    return acc + int(self._left[lo + j])
                return acc + int(self._count[node])
        if side == "left":
            return acc
        return acc + int(self._final[node])

    def __getitem__(self, i: int) -> str:
        if i < 0:
            i += self._n
        if not 0 <= i < self._n:
            raise IndexError(i)
        node = self._root
        rem = i
        out = bytearray()
        while True:
            f = int(self._final[node])
            if rem < f:
                return out.decode("utf-8")
            lo, hi = self._node_arcs(node)
            lefts = self._left[lo:hi]
            # last arc j with left[j] <= rem (left is strictly
            # increasing within a node: every subtree holds >= 1 term)
            j = int(np.searchsorted(lefts, rem, side="right")) - 1
            out.append(int(self._labels[lo + j]))
            rem -= int(lefts[j])
            node = int(self._targets[lo + j])

    def iter_range(self, lo: int, hi: int):
        """In-order walk from ordinal ``lo`` to ``hi`` (amortized
        O(bytes emitted), not O(depth) per term)."""
        if lo >= hi or lo >= self._n:
            return
        hi = min(hi, self._n)
        # stack of (node, next_arc_index_within_node); seed by counted
        # descent to ordinal lo
        stack: list[list[int]] = []
        out = bytearray()
        node = self._root
        rem = lo
        emit_first_at = []  # final repeats to emit at the seed node
        while True:
            f = int(self._final[node])
            if rem < f:
                emit_first_at = [f - rem]
                stack.append([node, 0])
                break
            rem -= f
            alo, ahi = self._node_arcs(node)
            lefts = self._left[alo:ahi] - f
            j = int(np.searchsorted(lefts, rem, side="right")) - 1
            stack.append([node, j + 1])
            out.append(int(self._labels[alo + j]))
            rem -= int(lefts[j])
            node = int(self._targets[alo + j])
        emitted = 0
        want = hi - lo
        # emit the seed term (and duplicate rows at its node)
        if emit_first_at:
            term = out.decode("utf-8")
            for _ in range(min(emit_first_at[0], want)):
                yield term
                emitted += 1
        while emitted < want and stack:
            node, j = stack[-1]
            alo, ahi = self._node_arcs(node)
            if j >= ahi - alo:
                stack.pop()
                if out:
                    out.pop()
                continue
            stack[-1][1] = j + 1
            out.append(int(self._labels[alo + j]))
            child = int(self._targets[alo + j])
            f = int(self._final[child])
            if f:
                term = out.decode("utf-8")
                for _ in range(min(f, want - emitted)):
                    yield term
                    emitted += 1
            stack.append([child, 0])

    def __iter__(self):
        return self.iter_range(0, self._n)

    def nbytes(self) -> int:
        return int(self._labels.nbytes + self._targets.nbytes
                   + self._left.nbytes + self._arc_off.nbytes
                   + self._final.nbytes + self._count.nbytes)
