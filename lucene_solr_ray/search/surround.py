"""Surround query language: proximity-operator queries over spans.

Re-expresses the reference surround parser
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/``):
the grammar of ``parser/QueryParser.jj`` and the rewrite semantics of
``query/*.java``, mapped onto this engine's Query / SpanQuery algebra.

Semantics implemented (file references are the reference contracts):

- infix operators, loosest- to tightest-binding: ``OR``, ``AND``,
  ``NOT``, ``N``, ``W`` (QueryParser.jj production order OrQuery ->
  AndQuery -> NotQuery -> NQuery -> WQuery -> Primary); every operator
  also has a prefix (functional) form ``OP(a, b, ...)`` except NOT,
  which is infix-only.
- distance operators carry an optional integer prefix: ``W`` == ``1W``
  (adjacent, ordered), ``3N(a, b)`` == within 3, any order.
  ``DistanceQuery.getSpanNearQuery`` builds
  ``SpanNearQuery(slop = opDistance - 1, inOrder = W)``.
- inside a distance operator only terms, ``OR`` and nested distance
  operators are legal (the ``DistanceSubQuery`` contract —
  ``AndQuery``/``NotQuery`` do not implement it); violations raise.
- term truncation: trailing ``*`` is a prefix query
  (``SrndPrefixQuery``), embedded ``*``/``?`` a truncated query
  (``SrndTruncQuery``); both rewrite by dictionary expansion capped at
  ``max_basic_queries`` (``BasicQueryFactory`` /
  ``TooManyBasicQueries``).
- ``^f`` weights on any primary become BoostQuery
  (``SrndQuery.weight``); weighted subqueries inside a distance
  operator are rejected (span positions carry no per-clause boost
  here — documented divergence, the reference folds them into the
  span weight).
- terms are NOT analyzed (the surround parser queries the index
  vocabulary directly); ``term_norm`` (default lower-casing, matching
  the reference's ``SrndQuery`` tests against lowercase indexes)
  normalizes them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .query import (
    BooleanQuery,
    BoostQuery,
    PrefixQuery,
    Query,
    TermQuery,
    WildcardQuery,
)
from .spans import SpanNearQuery, SpanOrQuery, SpanQuery, SpanTermQuery

__all__ = [
    "SurroundSyntaxError",
    "TooManyBasicQueries",
    "parse_surround",
    "surround_query",
    "surround_search",
]


class SurroundSyntaxError(ValueError):
    """Raised for text the surround grammar rejects."""


class TooManyBasicQueries(ValueError):
    """Truncation expanded past ``max_basic_queries``
    (query/TooManyBasicQueries.java)."""


# --------------------------------------------------------------------------
# AST

@dataclass(frozen=True)
class SrndTerm:
    text: str
    quoted: bool = False
    weight: float = 1.0

    @property
    def truncated(self) -> bool:
        return not self.quoted and ("*" in self.text or "?" in self.text)


@dataclass(frozen=True)
class SrndOp:
    op: str                 # "or" | "and" | "not" | "w" | "n"
    children: tuple = field(default=())
    dist: int = 1           # distance operators only
    weight: float = 1.0


_TOKEN = re.compile(r"""
    \s*(?:
        (?P<open>\() | (?P<close>\)) | (?P<comma>,)
      | (?P<quoted>"(?:[^"\\]|\\.)*")
      | (?P<word>[^\s(),^]+)
      | (?P<boost>\^(?P<bval>[0-9]+(?:\.[0-9]+)?))
    )""", re.X)

_DIST = re.compile(r"(\d*)([wn])\Z", re.I)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m or m.end() == i:
            if text[i:].strip():
                raise SurroundSyntaxError(
                    f"unexpected character at {i}: {text[i:i+10]!r}")
            break
        i = m.end()
        for kind in ("open", "close", "comma", "quoted", "word"):
            if m.group(kind):
                out.append((kind, m.group(kind)))
                break
        else:
            out.append(("boost", m.group("bval")))
    return out


class _Parser:
    """Recursive descent over the token list (QueryParser.jj
    production for production)."""

    MAX_DEPTH = 48   # grammar-ladder frames per level × this stays
                     # well under Python's recursion limit

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        self.depth = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, "")

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    # -- infix ladder ------------------------------------------------------
    def parse(self) -> SrndTerm | SrndOp:
        q = self.or_query()
        if self.peek()[0] is not None:
            raise SurroundSyntaxError(
                f"trailing input at token {self.i}: {self.peek()[1]!r}")
        return q

    def _infix(self, sub, match_op):
        # same-operator runs collect into ONE SrndOp (built once, so an
        # N-term chain costs O(N) instead of O(N^2) tuple rebuilds)
        left = sub()
        cur: tuple | None = None
        kids: list | None = None
        while True:
            kind, val = self.peek()
            op = match_op(val) if kind == "word" else None
            if op is None:
                break
            self.take()
            right = sub()
            if kids is not None and op == cur:
                kids.append(right)
            else:
                if kids is not None:
                    left = SrndOp(cur[0], tuple(kids), cur[1])
                cur = op
                kids = [left, right]
        if kids is not None:
            left = SrndOp(cur[0], tuple(kids), cur[1])
        return left

    def or_query(self):
        return self._infix(
            self.and_query,
            lambda v: ("or", 1) if v.lower() == "or" else None)

    def and_query(self):
        return self._infix(
            self.not_query,
            lambda v: ("and", 1) if v.lower() == "and" else None)

    def not_query(self):
        return self._infix(
            self.n_query,
            lambda v: ("not", 1) if v.lower() == "not" else None)

    @staticmethod
    def _dist(v: str, letter: str):
        m = _DIST.match(v)
        if m and m.group(2).lower() == letter:
            d = int(m.group(1)) if m.group(1) else 1
            if d < 1:
                raise SurroundSyntaxError(f"distance must be >= 1: {v!r}")
            return (letter, d)
        return None

    def n_query(self):
        return self._infix(self.w_query, lambda v: self._dist(v, "n"))

    def w_query(self):
        return self._infix(self.primary, lambda v: self._dist(v, "w"))

    # -- primaries ---------------------------------------------------------
    def primary(self):
        kind, val = self.peek()
        if kind == "open":
            self.take()
            self.depth += 1
            if self.depth > self.MAX_DEPTH:
                raise SurroundSyntaxError(
                    f"query nested deeper than {self.MAX_DEPTH}")
            q = self.or_query()
            self.depth -= 1
            if self.take()[0] != "close":
                raise SurroundSyntaxError("expected ')'")
            return self._weighted(q)
        if kind == "quoted":
            self.take()
            body = re.sub(r"\\(.)", r"\1", val[1:-1])
            return self._weighted(SrndTerm(body, quoted=True))
        if kind == "word":
            low = val.lower()
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) \
                else (None, "")
            is_op = (low in ("or", "and")
                     or self._dist(val, "w") or self._dist(val, "n"))
            if is_op and nxt[0] == "open":
                return self._weighted(self.prefix_op(low))
            if low == "not":
                raise SurroundSyntaxError("NOT is infix-only")
            self.take()
            return self._weighted(SrndTerm(val))
        raise SurroundSyntaxError(f"expected a term, got {val!r}")

    def prefix_op(self, opword: str) -> SrndOp:
        self.take()                      # the operator word
        self.take()                      # '('
        self.depth += 1
        if self.depth > self.MAX_DEPTH:
            raise SurroundSyntaxError(
                f"query nested deeper than {self.MAX_DEPTH}")
        kids = [self.or_query()]
        while self.peek()[0] == "comma":
            self.take()
            kids.append(self.or_query())
        if self.take()[0] != "close":
            raise SurroundSyntaxError("expected ')' closing prefix op")
        self.depth -= 1
        if opword in ("or", "and"):
            if len(kids) < 2:
                raise SurroundSyntaxError(
                    f"{opword.upper()}() needs >= 2 operands")
            return SrndOp(opword, tuple(kids))
        letter, d = self._dist(opword, opword.rstrip("0123456789")[-1])
        if len(kids) < 2:
            raise SurroundSyntaxError("distance op needs >= 2 operands")
        return SrndOp(letter, tuple(kids), d)

    def _weighted(self, q):
        kind, val = self.peek()
        if kind == "boost":
            self.take()
            w = float(val)
            if isinstance(q, SrndTerm):
                return SrndTerm(q.text, q.quoted, q.weight * w)
            return SrndOp(q.op, q.children, q.dist, q.weight * w)
        return q


def parse_surround(text: str) -> SrndTerm | SrndOp:
    """Parse surround syntax into its AST (terms + operator nodes)."""
    toks = _tokenize(text)
    if not toks:
        raise SurroundSyntaxError("empty query")
    return _Parser(toks).parse()


# --------------------------------------------------------------------------
# rewrite onto the engine's Query / SpanQuery algebra

def _expand(term: SrndTerm, searcher, budget: list, norm) -> list[str]:
    """Dictionary expansion for truncated terms, charged against the
    shared ``budget`` (BasicQueryFactory.checkMax)."""
    t = norm(term.text)
    if "*" in t[:-1] or "?" in t:
        q: Query = WildcardQuery(t)
    else:
        q = PrefixQuery(t[:-1])
    terms = searcher._rewrite_terms(q)
    budget[0] -= len(terms)
    if budget[0] < 0:
        raise TooManyBasicQueries(
            f"truncation {term.text!r} expanded past max_basic_queries")
    return terms


def _rw(node, searcher, budget, norm, in_span: bool):
    if isinstance(node, SrndTerm):
        if node.truncated:
            if searcher is None:
                raise SurroundSyntaxError(
                    "truncated terms need a searcher to expand against")
            terms = _expand(node, searcher, budget, norm)
            if in_span:
                q: Query = SpanOrQuery(
                    tuple(SpanTermQuery(t) for t in terms))
            elif not terms:
                q = BooleanQuery.build()
            else:
                q = BooleanQuery.build(
                    should=[TermQuery(t) for t in terms])
        else:
            budget[0] -= 1
            if budget[0] < 0:
                raise TooManyBasicQueries("too many basic queries")
            q = (SpanTermQuery(norm(node.text)) if in_span
                 else TermQuery(norm(node.text)))
        if node.weight != 1.0:
            if in_span:
                raise SurroundSyntaxError(
                    "weights inside distance operators are unsupported")
            q = BoostQuery(q, node.weight)
        return q

    kids = node.children
    if node.op in ("w", "n"):
        sub = tuple(_rw(k, searcher, budget, norm, True) for k in kids)
        q = SpanNearQuery(sub, slop=node.dist - 1,
                          in_order=(node.op == "w"))
    elif node.op == "or":
        sub = tuple(_rw(k, searcher, budget, norm, in_span) for k in kids)
        if in_span:
            flat = []
            for s in sub:     # merge nested SpanOr (expanded truncations)
                flat.extend(s.clauses if isinstance(s, SpanOrQuery) else [s])
            q = SpanOrQuery(tuple(flat))
        else:
            q = BooleanQuery.build(should=sub)
    elif node.op == "and":
        if in_span:
            raise SurroundSyntaxError(
                "AND is not allowed inside a distance operator")
        sub = tuple(_rw(k, searcher, budget, norm, False) for k in kids)
        q = BooleanQuery.build(must=sub)
    elif node.op == "not":
        if in_span:
            raise SurroundSyntaxError(
                "NOT is not allowed inside a distance operator")
        first = _rw(kids[0], searcher, budget, norm, False)
        rest = [_rw(k, searcher, budget, norm, False) for k in kids[1:]]
        q = BooleanQuery.build(must=[first], must_not=rest)
    else:  # pragma: no cover - parser emits only the ops above
        raise SurroundSyntaxError(f"unknown operator {node.op!r}")
    if node.weight != 1.0:
        if in_span:
            raise SurroundSyntaxError(
                "weights inside distance operators are unsupported")
        q = BoostQuery(q, node.weight)
    return q


def surround_query(text: str, searcher=None, *,
                   max_basic_queries: int = 1024,
                   term_norm=str.lower) -> Query | SpanQuery:
    """Parse + rewrite surround ``text`` into an engine query.

    ``searcher`` is only needed when the text contains truncated terms
    (dictionary expansion). ``max_basic_queries`` caps the total leaf
    count exactly like ``BasicQueryFactory(maxBasicQueries)``."""
    budget = [max_basic_queries]
    return _rw(parse_surround(text), searcher, budget, term_norm, False)


def surround_search(searcher, text: str, k: int = 10, *,
                    max_basic_queries: int = 1024):
    """Convenience: rewrite and run, returning the searcher's top-k."""
    q = surround_query(text, searcher, max_basic_queries=max_basic_queries)
    return searcher.search(q, k)
