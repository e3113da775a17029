"""Regexp automaton — sublinear regexp-term expansion.

The reference compiles ``RegexpQuery`` patterns to an automaton
(``lucene/core/.../util/automaton/RegExp.java`` → ``CompiledAutomaton``)
and intersects it with the terms dictionary via ``IntersectTermsEnum``,
so a regexp query visits O(matches + automaton boundary crossings)
dictionary entries instead of scanning the vocabulary.

This module does the same for the common anchored-regex subset this
engine's regexp surface uses (Python ``re.match(pat + r"\\Z")``
semantics): literals, escapes, ``.``, ``\\d \\w \\s`` (+negations),
``[...]`` classes with ranges/negation, ``* + ?``, ``|`` and groups —
via the textbook Thompson NFA + on-the-fly subset (DFA) construction.
Unsupported constructs ({m,n}, backrefs, lookaround, anchors) raise
:class:`UnsupportedRegex`; the caller falls back to the pruned scan.

State = frozenset of NFA states (epsilon-closed). A Thompson NFA has no
dead states (every state lies on a path to accept), so liveness is just
non-emptiness. ``_next_edge`` enumerates only the candidate characters
where the transition-interval structure can change: the lower bound
itself plus each interval start above it — between consecutive interval
starts the matched-interval set can only SHRINK (at interval ends), and
a subset of a dead move-set is dead, so starts are the only places a
dead region can come back alive.
"""

from __future__ import annotations

from .levenshtein import OrderedDFA, intersect_sorted

_MAX_CP = 0x10FFFF


class UnsupportedRegex(ValueError):
    """Pattern uses a construct outside the compiled subset."""


# an interval set is a tuple of (lo, hi) inclusive codepoint pairs
_DOT = ((0, _MAX_CP),)
_CLASS_D = ((48, 57),)
_CLASS_W = ((48, 57), (65, 90), (95, 95), (97, 122))
_CLASS_S = tuple(sorted((ord(c), ord(c)) for c in " \t\n\r\f\v"))


def _negate(ivs):
    out = []
    prev = 0
    for lo, hi in sorted(ivs):
        if lo > prev:
            out.append((prev, lo - 1))
        prev = max(prev, hi + 1)
    if prev <= _MAX_CP:
        out.append((prev, _MAX_CP))
    return tuple(out)


class _NFA:
    """Thompson fragments over integer states."""

    def __init__(self):
        self.eps: list[list[int]] = []     # state -> epsilon targets
        self.edges: list[list[tuple]] = [] # state -> [(intervals, tgt)]

    def new_state(self) -> int:
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1


class _Parser:
    """Recursive-descent: alt := cat ('|' cat)*; cat := rep*;
    rep := atom ('*'|'+'|'?')*; atom := literal | class | '(' alt ')'."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.nfa = _NFA()
        self.unbounded = False  # saw * or + (language may be infinite)

    def parse(self) -> tuple[int, int]:
        frag = self._alt()
        if self.i != len(self.p):
            raise UnsupportedRegex(f"unbalanced at {self.i}: {self.p!r}")
        return frag

    def _peek(self):
        return self.p[self.i] if self.i < len(self.p) else None

    def _alt(self):
        frags = [self._cat()]
        while self._peek() == "|":
            self.i += 1
            frags.append(self._cat())
        if len(frags) == 1:
            return frags[0]
        n = self.nfa
        s, e = n.new_state(), n.new_state()
        for fs, fe in frags:
            n.eps[s].append(fs)
            n.eps[fe].append(e)
        return s, e

    def _cat(self):
        frags = []
        while self._peek() is not None and self._peek() not in "|)":
            frags.append(self._rep())
        n = self.nfa
        if not frags:
            s = n.new_state()
            return s, s  # empty string fragment
        for (s1, e1), (s2, e2) in zip(frags, frags[1:]):
            n.eps[e1].append(s2)
        return frags[0][0], frags[-1][1]

    def _rep(self):
        frag = self._atom()
        n = self.nfa
        while self._peek() in ("*", "+", "?"):
            op = self.p[self.i]
            self.i += 1
            fs, fe = frag
            s, e = n.new_state(), n.new_state()
            n.eps[s].append(fs)
            if op in ("*", "?"):
                n.eps[s].append(e)
            n.eps[fe].append(e)
            if op in ("*", "+"):
                n.eps[fe].append(fs)
                self.unbounded = True
            frag = (s, e)
        if self._peek() == "{":
            raise UnsupportedRegex("{m,n} not compiled")
        return frag

    def _char_frag(self, ivs):
        n = self.nfa
        s, e = n.new_state(), n.new_state()
        n.edges[s].append((tuple(ivs), e))
        return s, e

    def _atom(self):
        c = self._peek()
        if c is None:
            raise UnsupportedRegex("dangling operator")
        if c == "(":
            self.i += 1
            if self._peek() == "?":
                raise UnsupportedRegex("(?...) groups not compiled")
            frag = self._alt()
            if self._peek() != ")":
                raise UnsupportedRegex("unclosed group")
            self.i += 1
            return frag
        if c == ".":
            self.i += 1
            return self._char_frag(_DOT)
        if c == "[":
            return self._char_frag(self._cls())
        if c == "\\":
            self.i += 1
            return self._char_frag(self._escape())
        if c in "*+?{})]^$":
            raise UnsupportedRegex(f"unexpected {c!r}")
        self.i += 1
        o = ord(c)
        return self._char_frag(((o, o),))

    def _escape(self):
        if self.i >= len(self.p):
            raise UnsupportedRegex("dangling backslash")
        c = self.p[self.i]
        self.i += 1
        table = {"d": _CLASS_D, "w": _CLASS_W, "s": _CLASS_S,
                 "D": _negate(_CLASS_D), "W": _negate(_CLASS_W),
                 "S": _negate(_CLASS_S),
                 "n": ((10, 10),), "t": ((9, 9),), "r": ((13, 13),)}
        if c in table:
            return table[c]
        if c.isalnum():
            raise UnsupportedRegex(f"escape \\{c} not compiled")
        return ((ord(c), ord(c)),)

    def _cls(self):
        # self.p[self.i] == '['
        self.i += 1
        neg = False
        if self._peek() == "^":
            neg = True
            self.i += 1
        ivs = []
        first = True
        while True:
            c = self._peek()
            if c is None:
                raise UnsupportedRegex("unclosed class")
            if c == "]" and not first:
                self.i += 1
                break
            first = False
            if c == "\\":
                self.i += 1
                sub = self._escape()
                if len(sub) > 1 or sub[0][0] != sub[0][1]:
                    ivs.extend(sub)  # \d/\w/\s inside a class
                    continue
                lo = sub[0][0]
            else:
                self.i += 1
                lo = ord(c)
            if self._peek() == "-" and self.i + 1 < len(self.p) \
                    and self.p[self.i + 1] != "]":
                self.i += 1
                hc = self.p[self.i]
                self.i += 1
                if hc == "\\":
                    raise UnsupportedRegex("escape as range end")
                ivs.append((lo, ord(hc)))
            else:
                ivs.append((lo, lo))
        ivs = tuple(sorted(ivs))
        return _negate(ivs) if neg else ivs


class RegexDFA(OrderedDFA):
    """Anchored-regex DFA via on-the-fly subset construction over the
    Thompson NFA (``re.match(pattern + r"\\Z")`` semantics)."""

    def __init__(self, pattern: str, max_len: int | None = None):
        self.pattern = pattern
        # bound the leapfrog traversal by the dictionary's longest term:
        # star/plus make the language infinite, which has no
        # lexicographic minimum (OrderedDFA.max_path_len)
        self.max_path_len = max_len
        parser = _Parser(pattern)
        self._s0, self._acc = parser.parse()
        if parser.unbounded and max_len is None:
            # infinite language + no cap = next_valid would descend
            # forever ('a*b' accepts ab > aab > ...: no lexicographic
            # minimum above a prefix). Every real call site passes the
            # dictionary's max term length; fail loudly on misuse.
            raise ValueError(
                f"pattern {pattern!r} has unbounded repetition; pass "
                "max_len (the term store's longest term)")
        self._nfa = parser.nfa
        # interval starts across the whole NFA: the only chars where a
        # dead region can turn live (see module docstring)
        starts = set()
        for lst in self._nfa.edges:
            for ivs, _ in lst:
                for lo, _hi in ivs:
                    starts.add(lo)
        self._starts = sorted(starts)
        self._trans: dict[tuple, dict[str, tuple]] = {}
        # per-NFA-state min #chars to reach accept (reverse 0-1 BFS:
        # epsilon edges cost 0, char edges cost 1) — powers budget-aware
        # liveness (OrderedDFA.min_dist), which keeps the leapfrog DFS
        # from entering subtrees that can only fail by max_path_len
        # truncation (the alphabet-rescan hang)
        self._dist = self._dists_to_accept()
        self._mind: dict[frozenset, int] = {}

    def _dists_to_accept(self) -> list[int]:
        from collections import deque

        n = len(self._nfa.eps)
        INF = n + 1  # real distances never exceed #states
        rev_eps: list[list[int]] = [[] for _ in range(n)]
        rev_chr: list[list[int]] = [[] for _ in range(n)]
        for s, tgts in enumerate(self._nfa.eps):
            for t in tgts:
                rev_eps[t].append(s)
        for s, lst in enumerate(self._nfa.edges):
            for _ivs, t in lst:
                rev_chr[t].append(s)
        dist = [INF] * n
        dist[self._acc] = 0
        dq = deque([self._acc])
        while dq:
            u = dq.popleft()
            du = dist[u]
            for v in rev_eps[u]:
                if du < dist[v]:
                    dist[v] = du
                    dq.appendleft(v)
            for v in rev_chr[u]:
                if du + 1 < dist[v]:
                    dist[v] = du + 1
                    dq.append(v)
        return dist

    def min_dist(self, state: frozenset) -> int:
        r = self._mind.get(state)
        if r is None:
            dist = self._dist
            r = min((dist[s] for s in state), default=1 << 30)
            self._mind[state] = r
        return r

    def _closure(self, states: set[int]) -> frozenset:
        stack = list(states)
        seen = set(states)
        eps = self._nfa.eps
        while stack:
            s = stack.pop()
            for t in eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    def start(self) -> frozenset:
        return self._closure({self._s0})

    def step(self, state: frozenset, c: str) -> frozenset:
        d = self._trans.get(state)
        if d is None:
            d = self._trans[state] = {}
        r = d.get(c)
        if r is not None:
            return r
        o = ord(c)
        nxt = set()
        edges = self._nfa.edges
        for s in state:
            for ivs, tgt in edges[s]:
                for lo, hi in ivs:
                    if lo <= o <= hi:
                        nxt.add(tgt)
                        break
        r = d[c] = self._closure(nxt) if nxt else frozenset()
        return r

    def is_accept(self, state: frozenset) -> bool:
        return self._acc in state

    def is_live(self, state: frozenset) -> bool:
        # Thompson NFAs have no dead states: every state reaches accept
        return bool(state)

    def _next_edge(self, state: frozenset, after: str | None,
                   remaining: int | None = None) -> str | None:
        # budget-aware: an edge is viable only if its target can still
        # reach accept within ``remaining`` more chars. Within a region
        # between interval starts the move-set only SHRINKS, so
        # min_dist (a min over the set) only GROWS — boundary starts
        # remain the only places a non-viable region can turn viable,
        # exactly as for plain liveness.
        lo = 0 if after is None else ord(after) + 1
        if lo > _MAX_CP:
            return None
        cands = [lo]
        from bisect import bisect_right
        for s in self._starts[bisect_right(self._starts, lo):]:
            cands.append(s)
        for o in cands:
            c = chr(o)
            if self._edge_ok(self.step(state, c), remaining):
                return c
        return None


def regexp_candidates(terms, pattern: str,
                      max_len: int | None = None) -> tuple[list[str], int]:
    """Expand ``pattern`` (anchored) against a sorted term store via
    DFA∩dict leapfrog. ``max_len`` = the store's longest term (REQUIRED
    for patterns with ``*``/``+`` — see :class:`RegexDFA`); inferred for
    fixed-width numpy arrays. Raises :class:`UnsupportedRegex` when the
    pattern is outside the compiled subset (caller falls back to
    scanning)."""
    import numpy as np

    if max_len is None and isinstance(terms, np.ndarray) \
            and terms.dtype.kind == "U":
        max_len = terms.dtype.itemsize // 4
    if max_len is None:
        max_len = max((len(t) for t in terms), default=0)
    return intersect_sorted(RegexDFA(pattern, max_len=max_len), terms)
