"""Simple query parser: the error-tolerant end-user grammar.

Re-expresses ``lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java``: a char-walk state machine that NEVER
throws on malformed input — any construct that cannot parse degrades to
literal text, making it safe to feed raw user queries.

Grammar (each feature gated by a flag, all on by default):

- ``+`` AND, ``|`` OR — left-associative, NO precedence between them
  (the reference combines strictly in reading order)
- ``-tok`` / ``-(group)`` — negation of the next clause
- ``"fenced phrase"`` with optional ``~N`` slop suffix (NEAR)
- ``tok*`` — prefix query (PREFIX)
- ``tok~N`` — fuzzy query with N edits (FUZZY)
- ``( ... )`` — grouping (PRECEDENCE)
- ``\\x`` — escape any special (ESCAPE)
- whitespace joins clauses with ``default_op`` (WHITESPACE; with the
  flag off, whitespace is literal token text)

Tolerance semantics mirrored from the reference: a stray ``)`` is
ignored, an unterminated ``"`` treats the rest of the input as the
phrase body, an unterminated ``(`` closes at end of input, trailing or
doubled operators collapse, and a fully-empty parse returns
MatchAllDocsQuery (the reference returns null and callers substitute
MatchAllDocs).

Terms are analyzed (multi-token analysis becomes a phrase, the
QueryBuilder default); prefix and fuzzy terms are lowercased but not
analyzed, like the classic parser's expanded-term handling.
"""

from __future__ import annotations

from .query import (
    MUST_NOT,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PrefixQuery,
    Query,
)
from .queryparser import _analyzed_to_query

__all__ = ["ALL_FLAGS", "simple_parse"]

ALL_FLAGS = frozenset({
    "AND", "OR", "NOT", "PHRASE", "PRECEDENCE", "PREFIX",
    "WHITESPACE", "FUZZY", "NEAR", "ESCAPE",
})

_SPECIAL = set('+|-"()\\*~ \t\n\r')

# nesting cap: beyond this, '(' is ignored (never-raise tolerance —
# without it pathological inputs hit Python's recursion limit)
_MAX_DEPTH = 64


def _read_int(text: str, i: int) -> tuple[int | None, int]:
    j = i
    while j < len(text) and text[j].isdigit():
        j += 1
    return (int(text[i:j]) if j > i else None), j


class _Walk:
    def __init__(self, text: str, analyzer, default_op: str, flags):
        self.text = text
        self.i = 0
        self.analyzer = analyzer
        self.default_op = default_op
        self.flags = flags

    def on(self, f: str) -> bool:
        return f in self.flags

    # ---- clause accumulation (reading-order combination) -------------
    def parse_group(self, depth: int) -> Query | None:
        items: list[tuple[str, bool, Query]] = []   # (op, negated, q)
        pending_op: str | None = None
        pending_neg = False
        t = self.text
        while self.i < len(t):
            c = t[self.i]
            if c in " \t\n\r" and self.on("WHITESPACE"):
                self.i += 1
                continue
            if c == "+" and self.on("AND"):
                self.i += 1
                pending_op = "and"
                continue
            if c == "|" and self.on("OR"):
                self.i += 1
                pending_op = "or"
                continue
            if c == "-" and self.on("NOT"):
                self.i += 1
                pending_neg = not pending_neg
                continue
            if c == "(" and self.on("PRECEDENCE"):
                self.i += 1
                if depth >= _MAX_DEPTH:
                    # tolerance promise: hostile nesting degrades to an
                    # ignored paren instead of a RecursionError
                    continue
                sub = self.parse_group(depth + 1)
                if sub is not None:
                    items.append((pending_op or self.default_op,
                                  pending_neg, sub))
                pending_op, pending_neg = None, False
                continue
            if c == ")" and self.on("PRECEDENCE"):
                self.i += 1
                if depth > 0:
                    break           # close this group
                continue            # stray ')' at top level: ignored
            if c == '"' and self.on("PHRASE"):
                q = self.read_phrase()
                if q is not None:
                    items.append((pending_op or self.default_op,
                                  pending_neg, q))
                pending_op, pending_neg = None, False
                continue
            q = self.read_term()
            if q is not None:
                items.append((pending_op or self.default_op,
                              pending_neg, q))
            pending_op, pending_neg = None, False
        return _reduce(items)

    # ---- leaves -------------------------------------------------------
    def read_phrase(self) -> Query | None:
        t = self.text
        self.i += 1                         # opening quote
        buf = []
        while self.i < len(t) and t[self.i] != '"':
            if (t[self.i] == "\\" and self.on("ESCAPE")
                    and self.i + 1 < len(t)):
                self.i += 1
            buf.append(t[self.i])
            self.i += 1
        if self.i < len(t):
            self.i += 1                     # closing quote
        slop = 0
        if (self.i < len(t) and t[self.i] == "~" and self.on("NEAR")):
            n, j = _read_int(t, self.i + 1)
            if n is not None:
                slop, self.i = n, j
        return _analyzed_to_query(self.analyzer, "".join(buf), slop)

    def read_term(self) -> Query | None:
        t = self.text
        buf = []
        live = set()
        for f, chars in (("AND", "+"), ("OR", "|"), ("NOT", "-"),
                         ("PHRASE", '"'), ("PRECEDENCE", "()"),
                         ("WHITESPACE", " \t\n\r"),
                         ("PREFIX", "*"), ("FUZZY", "~"), ("NEAR", "~")):
            if self.on(f):
                live.update(chars)
        while self.i < len(t):
            c = t[self.i]
            if c == "\\" and self.on("ESCAPE") and self.i + 1 < len(t):
                buf.append(t[self.i + 1])
                self.i += 2
                continue
            if c == "*" and "*" in live:
                # prefix operator only at token END (reference checks
                # the char after '*' delimits); mid-token '*' is literal
                nxt = t[self.i + 1] if self.i + 1 < len(t) else " "
                if nxt in live or nxt in " \t\n\r":
                    break
                buf.append(c)
                self.i += 1
                continue
            if c in live and c in _SPECIAL:
                break
            buf.append(c)
            self.i += 1
        word = "".join(buf)
        if not word:
            if self.i < len(t) and t[self.i] in _SPECIAL:
                self.i += 1                 # skip an inert special char
            return None
        if self.i < len(t):
            c = t[self.i]
            if c == "*" and self.on("PREFIX"):
                self.i += 1
                return PrefixQuery(word.lower())
            if c == "~" and self.on("FUZZY"):
                n, j = _read_int(t, self.i + 1)
                if n is not None:
                    self.i = j
                    return FuzzyQuery(word.lower(),
                                      max_edits=min(int(n), 2))
                self.i += 1
                return FuzzyQuery(word.lower())
        return _analyzed_to_query(self.analyzer, word)


def _reduce(items: list[tuple[str, bool, Query]]) -> Query | None:
    """Reading-order combination with same-operator flattening — the
    reference's incremental BooleanQuery building. Consecutive items
    with the same operator fold into ONE BooleanQuery built once, so
    a q of N terms costs O(N), not O(N^2) rebuilds."""
    def _neg(q: Query) -> Query:
        # the reference's literal wrap: (MUST_NOT q, SHOULD *:*) —
        # self-contained, so it works at any nesting depth
        return BooleanQuery.build(must_not=[q],
                                  should=[MatchAllDocsQuery()])

    if not items:
        return None
    _op0, neg0, q0 = items[0]
    acc: Query = _neg(q0) if neg0 else q0
    acc_lead_neg = neg0            # pure-negative head: fold into AND
    i, n = 1, len(items)
    while i < n:
        op = items[i][0]
        j = i
        while j < n and items[j][0] == op:
            j += 1
        run = items[i:j]
        i = j
        if op == "and":
            must: list = []
            mnot: list = []
            if acc_lead_neg:
                mnot.extend(s for o, s in acc.clauses if o == MUST_NOT)
            else:
                must.append(acc)
            for _o, neg, q in run:
                (mnot if neg else must).append(q)
            if not must:
                # all-negative conjunction: keep the reference's
                # MatchAll leg so the boolean stays self-contained
                must.append(MatchAllDocsQuery())
            acc = BooleanQuery.build(must=must, must_not=mnot)
        else:
            should = [acc]
            should.extend(_neg(q) if neg else q for _o, neg, q in run)
            acc = BooleanQuery.build(should=should)
        acc_lead_neg = False
    return acc


def simple_parse(text: str, analyzer, *, default_op: str = "OR",
                 flags=ALL_FLAGS) -> Query:
    """Parse ``text`` with the simple grammar; never raises on syntax."""
    if default_op not in ("OR", "AND", "or", "and"):
        raise ValueError(f"default_op must be AND or OR: {default_op!r}")
    w = _Walk(text, analyzer, default_op.lower(), frozenset(flags))
    q = w.parse_group(0)
    return q if q is not None else MatchAllDocsQuery()
