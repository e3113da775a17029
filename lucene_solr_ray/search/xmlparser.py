"""XML query parser: build queries from an XML element tree.

Re-expresses ``lucene/queryparser/src/java/org/apache/lucene/
queryparser/xml/CoreParser.java`` and its ``builders/`` registry: each
XML element name maps to a query builder, elements nest the way the
queries nest, and any element may carry a ``boost`` attribute
(CoreParser registers every core builder; boost handling follows
``DOMUtils.getAttribute(e, "boost", 1.0f)`` applied by each builder).

Supported elements (builder parity, reference file in parens):

- ``<TermQuery fieldName="f">text</TermQuery>`` — raw, unanalyzed term
  (TermQueryBuilder.java)
- ``<TermsQuery>free text</TermsQuery>`` — analyzed into a SHOULD
  boolean (TermsQueryBuilder.java)
- ``<BooleanQuery>`` with ``<Clause occurs="must|should|mustNot|
  filter">`` children (BooleanQueryBuilder.java); optional
  ``minimumNumberShouldMatch``
- ``<UserQuery>`` — classic-syntax text (UserInputQueryBuilder.java)
- ``<MatchAllDocsQuery/>`` (MatchAllDocsQueryBuilder.java)
- ``<ConstantScoreQuery>`` wrapping one sub-query
  (ConstantScoreQueryBuilder.java)
- ``<DisjunctionMaxQuery tieBreaker="0.3">`` (DisjunctionMaxQuery-
  Builder.java)
- ``<RangeQuery lowerTerm="a" upperTerm="b" includeLower="true"
  includeUpper="false"/>`` — term range (RangeQueryBuilder.java)
- spans: ``<SpanTerm>``, ``<SpanNear slop inOrder>``, ``<SpanOr>``,
  ``<SpanOrTerms>`` (analyzed), ``<SpanFirst end>``, ``<SpanNot>``
  with ``<Include>``/``<Exclude>`` (SpanQueryBuilderFactory + the
  span builders)
- ``<BoostingTermQuery>`` — mapped to a span term (the reference
  scores it through payloads; this engine exposes payload scoring
  separately via ``extras.payload_score`` — documented divergence)

Unknown elements raise ``XmlParserException`` exactly like
``CoreParser.getQuery`` ("Unknown query type"). The extensions-only
builders (FuzzyLikeThis/LikeThis, filter caches) are out of scope with
the same boundary the reference draws between ``CoreParser`` and
``CorePlusExtensionsParser``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FieldedQuery,
    MatchAllDocsQuery,
    Query,
    TermQuery,
    TermRangeQuery,
)
from .spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)

__all__ = ["XmlParserException", "parse_xml_query"]


class XmlParserException(ValueError):
    """Element the core builder registry does not know, or a
    structurally invalid element (ParserException.java)."""


def _bool_attr(e: ET.Element, name: str, default: bool) -> bool:
    v = e.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("true", "yes", "1")


def _text(e: ET.Element) -> str:
    return (e.text or "").strip()


def _children(e: ET.Element) -> list[ET.Element]:
    return [c for c in e if isinstance(c.tag, str)]


class XmlQueryParser:
    def __init__(self, analyzer=None, *, fields: set | None = None):
        self.analyzer = analyzer
        self.fields = fields

    # ------------------------------------------------------------ public
    def parse(self, xml: str | ET.Element) -> Query:
        if isinstance(xml, str):
            try:
                root = ET.fromstring(xml)
            except ET.ParseError as e:   # CoreParser wraps SAX errors
                raise XmlParserException(f"malformed XML: {e}") from e
        else:
            root = xml
        return self._query(root)

    # ----------------------------------------------------------- dispatch
    def _query(self, e: ET.Element) -> Query:
        fn = getattr(self, f"_q_{e.tag}", None)
        if fn is None:
            raise XmlParserException(f"Unknown query type: {e.tag!r}")
        try:
            q = fn(e)
            boost = float(e.get("boost", "1"))
        except ValueError as err:
            # bad numeric attributes surface as parser errors, the
            # DOMUtils.getAttribute contract (ParserException)
            if isinstance(err, XmlParserException):
                raise
            raise XmlParserException(
                f"invalid attribute on <{e.tag}>: {err}") from err
        # ConstantScoreQuery consumes its boost as the constant score
        if boost != 1.0 and e.tag != "ConstantScoreQuery":
            q = BoostQuery(q, boost)
        field = e.get("fieldName")
        if field and self.fields is not None and field in self.fields:
            q = FieldedQuery(field, q)
        return q

    def _span(self, e: ET.Element):
        fn = getattr(self, f"_q_{e.tag}", None)
        if fn is None or not e.tag.startswith(("Span", "BoostingTerm")):
            raise XmlParserException(
                f"Expected a span query element, got: {e.tag!r}")
        return fn(e)

    def _analyzed_terms(self, text: str) -> list[str]:
        if self.analyzer is None:
            return text.lower().split()
        toks, _pos = self.analyzer.tokens_with_positions(text)
        return toks

    # ----------------------------------------------------------- builders
    def _q_TermQuery(self, e):
        t = _text(e)
        if not t:
            raise XmlParserException("TermQuery requires term text")
        return TermQuery(t)

    def _q_TermsQuery(self, e):
        toks = self._analyzed_terms(_text(e))
        if not toks:
            return BooleanQuery.build()
        if len(toks) == 1:
            return TermQuery(toks[0])
        return BooleanQuery.build(should=[TermQuery(t) for t in toks])

    def _q_MatchAllDocsQuery(self, e):
        return MatchAllDocsQuery()

    def _q_UserQuery(self, e):
        from .query import parse_query

        if self.analyzer is None:
            raise XmlParserException("UserQuery requires an analyzer")
        return parse_query(_text(e), self.analyzer)

    def _q_BooleanQuery(self, e):
        occur_map = {"must": "must", "should": "should",
                     "mustnot": "must_not", "filter": "filter"}
        groups = {"must": [], "should": [], "must_not": [], "filter": []}
        for c in _children(e):
            if c.tag != "Clause":
                raise XmlParserException(
                    f"BooleanQuery children must be Clause, got {c.tag!r}")
            occ = occur_map.get((c.get("occurs") or "should").lower())
            if occ is None:
                raise XmlParserException(
                    f"invalid occurs value: {c.get('occurs')!r}")
            sub = _children(c)
            if len(sub) != 1:
                raise XmlParserException(
                    "Clause must wrap exactly one query element")
            groups[occ].append(self._query(sub[0]))
        msm = int(e.get("minimumNumberShouldMatch", "0"))
        return BooleanQuery.build(msm=msm, **groups)

    def _q_ConstantScoreQuery(self, e):
        sub = _children(e)
        if len(sub) != 1:
            raise XmlParserException(
                "ConstantScoreQuery wraps exactly one query")
        return ConstantScoreQuery(self._query(sub[0]),
                                  score=float(e.get("boost", "1")))

    def _q_DisjunctionMaxQuery(self, e):
        subs = tuple(self._query(c) for c in _children(e))
        return DisjunctionMaxQuery(
            subs, tie_breaker=float(e.get("tieBreaker", "0")))

    def _q_RangeQuery(self, e):
        return TermRangeQuery(
            lower=e.get("lowerTerm"),
            upper=e.get("upperTerm"),
            include_lower=_bool_attr(e, "includeLower", True),
            include_upper=_bool_attr(e, "includeUpper", True),
        )

    # spans ---------------------------------------------------------------
    def _q_SpanTerm(self, e):
        t = _text(e)
        if not t:
            raise XmlParserException("SpanTerm requires term text")
        return SpanTermQuery(t)

    _q_BoostingTermQuery = _q_SpanTerm

    def _q_SpanOr(self, e):
        return SpanOrQuery(tuple(self._span(c) for c in _children(e)))

    def _q_SpanOrTerms(self, e):
        toks = self._analyzed_terms(_text(e))
        return SpanOrQuery(tuple(SpanTermQuery(t) for t in toks))

    def _q_SpanNear(self, e):
        return SpanNearQuery(
            tuple(self._span(c) for c in _children(e)),
            slop=int(e.get("slop", "0")),
            in_order=_bool_attr(e, "inOrder", True),
        )

    def _q_SpanFirst(self, e):
        sub = _children(e)
        if len(sub) != 1:
            raise XmlParserException("SpanFirst wraps exactly one span")
        return SpanFirstQuery(self._span(sub[0]),
                              end=int(e.get("end", "1")))

    def _q_SpanNot(self, e):
        inc = exc = None
        for c in _children(e):
            if c.tag in ("Include", "Exclude"):
                sub = _children(c)
                if len(sub) != 1:
                    raise XmlParserException(
                        f"{c.tag} must wrap exactly one span element")
                if c.tag == "Include":
                    inc = self._span(sub[0])
                else:
                    exc = self._span(sub[0])
        if inc is None or exc is None:
            raise XmlParserException(
                "SpanNot requires Include and Exclude children")
        return SpanNotQuery(inc, exc)


def parse_xml_query(xml: str, analyzer=None, *,
                    fields: set | None = None) -> Query:
    """One-shot parse: XML text -> engine query."""
    return XmlQueryParser(analyzer, fields=fields).parse(xml)
