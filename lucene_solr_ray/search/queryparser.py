"""Classic QueryParser: the full Lucene query syntax.

A recursive-descent restatement of the classic grammar
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/
QueryParser.jj`` (314 lines) + ``QueryParserBase.java`` ``addClause``
semantics):

- ``a b`` / ``+a -b`` / ``NOT a`` — modifiers
- ``a AND b``, ``a OR b``, ``a && b``, ``a || b`` — conjunctions with the
  classic retroactive-occur behavior (``AND`` promotes the previous clause
  to MUST; with a default-AND parser, ``OR`` demotes it to SHOULD)
- ``(a OR b) AND c`` — grouping, arbitrarily nested
- ``term^2`` / ``(...)^3`` / ``"phrase"^0.5`` — boosts (BoostQuery)
- ``term~`` / ``term~1`` — fuzzy (FuzzyQuery, max 2 edits)
- ``"a b c"`` / ``"a b"~2`` — phrase with optional slop
- ``[a TO b]`` / ``{a TO b}`` — term range, inclusive/exclusive, ``*`` as
  an open end (TermRangeQuery)
- ``pre*`` / ``w?ld*card`` — prefix/wildcard (never analyzed, lowercased —
  ``lowercase_expanded_terms``)
- ``/regex/`` — RegexpQuery
- ``field:term`` / ``field:(...)`` — field routing (FieldedQuery) when the
  parser was given a field set; with no field set the prefix is dropped
  (single-field index: everything is the default field)
- ``\\`` escapes any special character
- clauses whose analysis yields no tokens (stopword-only) vanish
  (StopFilter semantics)

Multi-token analysis of a single bare clause produces a PhraseQuery, the
classic parser's default graph behavior for non-quoted multi-token text.
"""

from __future__ import annotations

import re

from .query import (
    SHOULD, MUST, MUST_NOT,
    BooleanQuery,
    BoostQuery,
    FieldedQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


def _analyzed_to_query(analyzer, text: str, slop: int = 0) -> Query | None:
    """Analyzed text -> Term/Phrase/MultiPhrase, honoring positions: tokens
    sharing a position (synonym expansions, WDF parts) become slot
    ALTERNATIVES, not consecutive phrase terms — the classic parser's
    graph-query behavior (QueryBuilder.analyzeGraphPhrase)."""
    toks, pos = analyzer.tokens_with_positions(text)
    if not toks:
        return None
    if len(toks) == 1:
        return TermQuery(toks[0])
    slots: list[list[str]] = []
    last_pos = None
    for t, p in zip(toks, pos):
        if last_pos is not None and p == last_pos:
            slots[-1].append(t)
        else:
            slots.append([t])
            last_pos = p
    if len(slots) == 1:
        # one position, several alternatives: OR of terms
        if len(slots[0]) == 1:
            return TermQuery(slots[0][0])
        return BooleanQuery(tuple(
            (SHOULD, TermQuery(t)) for t in slots[0]))
    if all(len(s) == 1 for s in slots):
        return PhraseQuery(tuple(s[0] for s in slots), slop=slop)
    return MultiPhraseQuery(tuple(tuple(s) for s in slots))

_NUM = r"\d+(?:\.\d+)?"
_PHRASE = re.compile(r'"((?:[^"\\]|\\.)*)"(?:~(\d+))?(?:\^(' + _NUM + r"))?")
_RANGE = re.compile(
    r"([\[{])\s*([^\s\]}]+)\s+TO\s+([^\s\]}]+)\s*([\]}])"
    r"(?:\^(" + _NUM + r"))?",
    re.IGNORECASE,
)
_FIELD = re.compile(r"((?:[^\s:\\()\[\]{}\"]|\\.)+):")
_ATOM = re.compile(r"((?:[^\s\\()\[\]{}\"^~]|\\.)+)")
_BOOST = re.compile(r"\^(" + _NUM + r")")
_FUZZY = re.compile(r"~(" + _NUM + r")?")


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def expand_multifield(q: Query, fields: list[str],
                      boosts: dict[str, float] | None = None,
                      tie_breaker: float = 0.0) -> Query:
    """MultiFieldQueryParser's clause expansion
    (``queryparser/.../classic/MultiFieldQueryParser.java``): every LEAF
    query is replaced by a DisMax over the fields (with optional
    per-field boosts), preserving the boolean structure — ``a b`` becomes
    ``(f1:a | f2:a) (f1:b | f2:b)``, not ``(f1:a f1:b) | (f2:a f2:b)``."""
    from .query import (
        BooleanQuery as BQ,
        BoostQuery as Boost,
        ConstantScoreQuery as CSQ,
        DisjunctionMaxQuery as DMQ,
        FieldedQuery as FQ,
    )

    boosts = boosts or {}
    if isinstance(q, BQ):
        return BQ(tuple(
            (occ, expand_multifield(sub, fields, boosts, tie_breaker))
            for occ, sub in q.clauses
        ), q.min_should_match)
    if isinstance(q, Boost):
        return Boost(expand_multifield(q.query, fields, boosts,
                                       tie_breaker), q.boost)
    if isinstance(q, CSQ):
        return CSQ(expand_multifield(q.query, fields, boosts,
                                     tie_breaker), q.score)
    if isinstance(q, FQ):
        return q  # already explicitly routed
    subs = []
    for f in fields:
        sub: Query = FQ(f, q)
        b = boosts.get(f)
        if b is not None and b != 1.0:
            sub = Boost(sub, b)
        subs.append(sub)
    return DMQ(tuple(subs), tie_breaker)


def parse_multifield_query(text: str, analyzer, fields: list[str], *,
                           boosts: dict[str, float] | None = None,
                           tie_breaker: float = 0.0,
                           default_op: str = "OR") -> Query:
    """Parse ``text`` and search it across ``fields``
    (MultiFieldQueryParser): explicit ``field:`` prefixes still route
    directly; everything else expands per-clause."""
    q = ClassicQueryParser(
        analyzer, default_op=default_op, fields=set(fields)
    ).parse(text)
    return expand_multifield(q, fields, boosts, tie_breaker)


class ClassicQueryParser:
    """``ClassicQueryParser(analyzer).parse("(a OR b) AND -c^2")``."""

    def __init__(self, analyzer, *, default_op: str = "OR",
                 fields: set | None = None):
        self.analyzer = analyzer
        self.default_op = default_op.upper()
        self.fields = fields

    # ---- lexer ----
    def _lex(self, text: str) -> list[tuple]:
        toks: list[tuple] = []
        i, n = 0, len(text)
        while i < n:
            c = text[i]
            if c.isspace():
                i += 1
                continue
            if c == "(":
                toks.append(("LPAREN",))
                i += 1
                continue
            if c == ")":
                toks.append(("RPAREN",))
                i += 1
                m = _BOOST.match(text, i)
                if m:
                    toks.append(("BOOST", float(m.group(1))))
                    i = m.end()
                continue
            if c == '"':
                m = _PHRASE.match(text, i)
                if not m:
                    raise ValueError(f"unterminated phrase at {i}: {text!r}")
                toks.append(("PHRASE", _unescape(m.group(1)),
                             int(m.group(2)) if m.group(2) else 0,
                             float(m.group(3)) if m.group(3) else None))
                i = m.end()
                continue
            if c in "[{":
                m = _RANGE.match(text, i)
                if not m:
                    raise ValueError(f"bad range at {i}: {text!r}")
                toks.append(("RANGE", m.group(2), m.group(3),
                             m.group(1) == "[", m.group(4) == "]",
                             float(m.group(5)) if m.group(5) else None))
                i = m.end()
                continue
            if c == "+" or c == "-":
                toks.append(("MOD", c))
                i += 1
                continue
            m = _FIELD.match(text, i)
            if m:
                toks.append(("FIELD", _unescape(m.group(1))))
                i = m.end()
                continue
            m = _ATOM.match(text, i)
            if m:
                word = m.group(1)
                i = m.end()
                if word in ("AND", "&&"):
                    toks.append(("CONJ", "AND"))
                    continue
                if word in ("OR", "||"):
                    toks.append(("CONJ", "OR"))
                    continue
                if word == "NOT" or word == "!":
                    toks.append(("MOD", "-"))
                    continue
                fuzzy = None
                boost = None
                while i < n and text[i] in "~^":
                    if text[i] == "~":
                        fm = _FUZZY.match(text, i)
                        fuzzy = fm.group(1) if fm.group(1) else ""
                        i = fm.end()
                    else:
                        bm = _BOOST.match(text, i)
                        if not bm:
                            break
                        boost = float(bm.group(1))
                        i = bm.end()
                toks.append(("TERM", word, fuzzy, boost))
                continue
            raise ValueError(f"unexpected character {c!r} at {i}: {text!r}")
        return toks

    # ---- parser ----
    def parse(self, text: str) -> Query:
        self._toks = self._lex(text)
        self._i = 0
        q = self._query()
        if self._peek() is not None:
            raise ValueError(f"unbalanced ')' in {text!r}")
        if q is None:
            return BooleanQuery((), 0)
        # Solr's pure-negative fix (QueryUtils.fixNegativeQuery): a
        # TOP-LEVEL boolean with only MUST_NOT clauses matches
        # everything-except (Lucene's raw semantics would match nothing)
        if isinstance(q, BooleanQuery) and q.clauses and all(
                occ == "MUST_NOT" for occ, _ in q.clauses):
            from .query import MatchAllDocsQuery

            q = BooleanQuery(
                (("MUST", MatchAllDocsQuery()),) + q.clauses, 0)
        return q

    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else None

    def _next(self):
        t = self._peek()
        self._i += 1
        return t

    def _query(self) -> Query | None:
        # QueryParserBase.addClause occur resolution
        clauses: list[list] = []  # [occur, query]
        conj = None
        mod = None
        while True:
            t = self._peek()
            if t is None or t[0] == "RPAREN":
                break
            if t[0] == "CONJ":
                conj = t[1]
                self._next()
                continue
            if t[0] == "MOD":
                mod = t[1]
                self._next()
                continue
            q = self._clause()
            if q is not None:
                if clauses:
                    # retroactive occur on the PREVIOUS clause
                    if conj == "AND" and clauses[-1][0] == SHOULD:
                        clauses[-1][0] = MUST
                    if (self.default_op == "AND" and conj == "OR"
                            and clauses[-1][0] == MUST):
                        clauses[-1][0] = SHOULD
                required = (mod == "+") or (
                    mod is None
                    and (conj == "AND"
                         or (self.default_op == "AND" and conj != "OR"))
                )
                occur = (MUST_NOT if mod == "-"
                         else MUST if required else SHOULD)
                clauses.append([occur, q])
            conj = None
            mod = None
        if not clauses:
            return None
        if len(clauses) == 1 and clauses[0][0] == SHOULD:
            return clauses[0][1]
        return BooleanQuery(tuple((o, q) for o, q in clauses), 0)

    def _clause(self) -> Query | None:
        field = None
        t = self._peek()
        if t[0] == "FIELD":
            field = t[1]
            self._next()
            t = self._peek()
            if t is None:
                raise ValueError("dangling field prefix")
        q: Query | None
        boost = None
        if t[0] == "LPAREN":
            self._next()
            q = self._query()
            t2 = self._next()
            if t2 is None or t2[0] != "RPAREN":
                raise ValueError("missing ')'")
            nxt = self._peek()
            if nxt is not None and nxt[0] == "BOOST":
                boost = nxt[1]
                self._next()
        elif t[0] == "PHRASE":
            self._next()
            q = _analyzed_to_query(self.analyzer, t[1], slop=t[2])
            boost = t[3]
        elif t[0] == "RANGE":
            self._next()
            lo = None if t[1] == "*" else _unescape(t[1]).lower()
            hi = None if t[2] == "*" else _unescape(t[2]).lower()
            q = TermRangeQuery(lo, hi, t[3], t[4])
            boost = t[5]
        elif t[0] == "TERM":
            self._next()
            if field == "*" and t[1] == "*":
                # '*:*' is MatchAllDocsQuery (QueryParserBase maps the
                # all-fields wildcard term to MatchAllDocs), composable
                # inside boolean trees: '*:* AND lang:en'
                from .query import MatchAllDocsQuery

                return MatchAllDocsQuery()
            q = self._term_query(t[1], t[2])
            boost = t[3]
        else:
            raise ValueError(f"unexpected token {t}")
        if q is None:
            return None
        if boost is not None:
            q = BoostQuery(q, boost)
        if field is not None and self.fields is not None:
            q = FieldedQuery(field, q)
        return q

    def _term_query(self, word: str, fuzzy: str | None) -> Query | None:
        if len(word) > 2 and word.startswith("/") and word.endswith("/"):
            return RegexpQuery(word[1:-1])
        if fuzzy is not None:
            edits = 2
            if fuzzy:
                f = float(fuzzy)
                # old-style float similarity maps to max edits; ints pass
                edits = int(f) if f >= 1 else 2
            return FuzzyQuery(_unescape(word).lower(), min(edits, 2))
        if "*" in word or "?" in word:
            pat = word.lower()
            if (pat.endswith("*") and "?" not in pat
                    and "*" not in pat[:-1]):
                return PrefixQuery(_unescape(pat[:-1]))
            return WildcardQuery(pat)  # escapes kept: analyzed per-char
        return _analyzed_to_query(self.analyzer, _unescape(word))


def parse_min_should_match(spec: str, clause_count: int) -> int:
    """Solr's mm spec grammar (``solr/core/.../util/SolrPluginUtils.java
    calculateMinShouldMatch``): the computed minimum-should-match for
    ``clause_count`` optional clauses.

    - ``"3"``      -> 3
    - ``"-2"``     -> clause_count - 2
    - ``"75%"``    -> floor(0.75 * clause_count)
    - ``"-25%"``   -> clause_count - floor(0.25 * clause_count)
    - conditionals ``"2<-25% 9<-3"``: each ``n<spec`` applies when
      clause_count > n; the one with the LARGEST matching n wins;
      if none match (clause_count <= smallest n) mm = clause_count.
    Result clamps to [0, clause_count] (the reference's behavior of
    never requiring more clauses than exist)."""
    spec = spec.strip()
    if not spec:
        return 0

    def simple(s: str, n: int) -> int:
        s = s.strip()
        if s.endswith("%"):
            pct = int(s[:-1])
            part = abs(pct) * n // 100
            return n - part if pct < 0 else part
        v = int(s)
        return n + v if v < 0 else v

    if "<" in spec:
        mm = clause_count
        best_n = -1
        for part in spec.split():
            cond, _, rhs = part.partition("<")
            n = int(cond)
            if clause_count > n and n > best_n:
                best_n = n
                mm = simple(rhs, clause_count)
        return max(0, min(mm, clause_count))
    return max(0, min(simple(spec, clause_count), clause_count))


def edismax_query(text: str, analyzer, fields: list[str], *,
                  boosts: dict[str, float] | None = None,
                  tie_breaker: float = 0.0,
                  pf_fields: list[str] | None = None,
                  ps: int = 0, mm: str | None = None,
                  default_op: str = "OR"):
    """The edismax composition (``solr/core/.../search/
    ExtendedDismaxQParser.java``): the user query expands per-clause
    into a DisMax across ``fields`` (qf), an implicit PHRASE of the
    whole query boosts docs where all terms appear adjacent in a
    ``pf_fields`` field (pf/ps), and ``mm`` (the Solr grammar —
    :func:`parse_min_should_match`) applies to the top-level optional
    clauses. Returns a composed Query for IndexSearcher/
    MultiFieldSearcher."""
    from .query import (
        SHOULD,
        BooleanQuery,
        BoostQuery,
        DisjunctionMaxQuery,
        FieldedQuery,
        PhraseQuery,
    )

    base = parse_multifield_query(text, analyzer, fields,
                                  boosts=boosts,
                                  tie_breaker=tie_breaker,
                                  default_op=default_op)
    if mm is not None and isinstance(base, BooleanQuery):
        n_should = sum(1 for occ, _ in base.clauses if occ == SHOULD)
        base = BooleanQuery(
            base.clauses,
            min_should_match=parse_min_should_match(mm, n_should))
    toks = analyzer.tokens(text.replace('"', " "))
    if pf_fields and len(toks) > 1:
        phrase = PhraseQuery(tuple(toks), slop=ps)
        pf_clauses = [
            FieldedQuery(f, BoostQuery(phrase, (boosts or {}).get(f, 1.0)))
            for f in pf_fields
        ]
        pf_q = pf_clauses[0] if len(pf_clauses) == 1 else \
            DisjunctionMaxQuery(tuple(pf_clauses), tie_breaker)
        return BooleanQuery.build(must=[base], should=[pf_q])
    return base
