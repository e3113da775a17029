"""Query model — the relational algebra of search (SURVEY.md §2.5).

Maps the reference Query classes (``lucene/core/src/java/org/apache/lucene/
search/``) onto plain dataclasses consumed by the scorer:

- :class:`TermQuery` (TermQuery.java:41-95)
- :class:`BooleanQuery` with SHOULD/MUST/MUST_NOT/FILTER occurs and
  minimumNumberShouldMatch (BooleanQuery.java; coord() disabled for BM25,
  BooleanWeight.java:97-109)
- :class:`PhraseQuery` (PhraseQuery.java — needs positions, index option)
- :class:`MatchAllDocsQuery`, :class:`ConstantScoreQuery`
- multi-term queries rewritten against the term dictionary
  (MultiTermQuery.java:66-76): :class:`PrefixQuery`, :class:`WildcardQuery`,
  :class:`RegexpQuery`, :class:`FuzzyQuery`, :class:`TermRangeQuery`

plus :func:`parse_query`, a QueryParser-lite for ``a b``, ``+a -b``,
``"a b"`` and ``field-free`` syntax (classic QueryParser grammar subset,
``queryparser/.../classic/QueryParser.jj``).
"""

from __future__ import annotations

from dataclasses import dataclass

SHOULD, MUST, MUST_NOT, FILTER = "SHOULD", "MUST", "MUST_NOT", "FILTER"


class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    term: str


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple  # of (occur, Query)
    min_should_match: int = 0

    def __post_init__(self):
        if not isinstance(self.clauses, tuple) or any(
                not isinstance(c, tuple) for c in self.clauses):
            object.__setattr__(
                self, "clauses", tuple(tuple(c) for c in self.clauses))

    @staticmethod
    def build(should=(), must=(), must_not=(), filter=(), msm: int = 0):
        cl = (
            tuple((MUST, q) for q in must)
            + tuple((SHOULD, q) for q in should)
            + tuple((MUST_NOT, q) for q in must_not)
            + tuple((FILTER, q) for q in filter)
        )
        return BooleanQuery(cl, msm)


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: tuple
    slop: int = 0

    def __post_init__(self):
        # normalize list input so the query stays hashable — an
        # unhashable query silently defeats the queryResultCache
        if not isinstance(self.terms, tuple):
            object.__setattr__(self, "terms", tuple(self.terms))


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase whose slots each admit several terms (``search/
    MultiPhraseQuery.java`` — the synonym/prefix-expanded phrase):
    ``(("fast", "quick"), ("fox",))`` matches "fast fox" and "quick
    fox"."""

    slots: tuple  # of tuples of terms

    def __post_init__(self):
        if not isinstance(self.slots, tuple) or any(
                not isinstance(x, tuple) for x in self.slots):
            object.__setattr__(
                self, "slots", tuple(tuple(x) for x in self.slots))


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """score = max(sub) + tie_breaker * (sum(sub) - max(sub))
    (search/DisjunctionMaxScorer.java)."""

    queries: tuple
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class FieldedQuery(Query):
    """Route a sub-query to a named field of a multi-field index (the
    ``field:term`` syntax of the classic QueryParser)."""

    field: str
    query: "Query"


@dataclass(frozen=True)
class BoostQuery(Query):
    """Query-time boost: sub-scores multiplied by ``boost`` (the
    topLevelBoost fold-in of Weight.normalize)."""

    query: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class BoostingQuery(Query):
    """Context demotion (``lucene/queries/.../BoostingQuery.java``):
    matches exactly what ``match`` matches, but a doc ALSO matching
    ``context`` has its score multiplied by ``boost`` (typically < 1) —
    "demote docs about X" without excluding them. The context query
    contributes no scores and no new matches."""

    match: "Query"
    context: "Query"
    boost: float = 0.5


@dataclass(frozen=True)
class DocValuesTermsQuery(Query):
    """Set-membership filter over a docvalues column
    (``lucene/sandbox/.../DocValuesTermsQuery.java``): matches docs
    whose DV value is in ``values``, constant score — the postings are
    never touched, so it filters on fields that aren't inverted."""

    field: str
    values: tuple


@dataclass(frozen=True)
class DocValuesRangeQuery(Query):
    """Range filter over a docvalues column
    (``lucene/sandbox/.../DocValuesRangeQuery.java``): None bounds are
    open; constant score, no postings access."""

    field: str
    lower: object = None
    upper: object = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    score: float = 1.0


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # '*' and '?' wildcards (WildcardQuery.java)


@dataclass(frozen=True)
class RegexpQuery(Query):
    pattern: str


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2  # LevenshteinAutomata supports <=2 (FuzzyQuery.java)
    # the reference defaults transpositions=true (FuzzyQuery.java); this
    # engine's historical semantics (and its SQL oracles) are plain
    # Levenshtein, so OSA is opt-in here — documented difference
    transpositions: bool = False


def parse_query(text: str, analyzer, default_op: str = "OR",
                fields: set | None = None) -> Query:
    """Parse the full classic QueryParser grammar (parens, AND/OR/NOT,
    boosts, fuzzy, ranges, wildcards, phrase slop, field routing) — see
    :mod:`.queryparser`."""
    from .queryparser import ClassicQueryParser

    return ClassicQueryParser(
        analyzer, default_op=default_op, fields=fields
    ).parse(text)
