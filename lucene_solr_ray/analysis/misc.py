"""Miscellaneous token filters — the Solr ``miscellaneous/`` family.

Restates the small per-token filters of ``lucene/analysis/common/src/java/
org/apache/lucene/analysis/miscellaneous/``:

- :func:`length_filter` — LengthFilter.java (drop tokens outside
  [min, max])
- :func:`keep_words` — KeepWordFilter.java (inverse stop filter)
- :func:`trim_token` — TrimFilter.java
- :func:`truncate_token` — TruncateTokenFilter.java
- :func:`pattern_replace` — pattern/PatternReplaceFilter.java
- :func:`remove_duplicates` — RemoveDuplicatesTokenFilter.java
  (drop a token equal to the previous one at the same position)
- :func:`join_hyphenations` — HyphenatedWordsFilter.java (re-join
  line-break hyphenations: "hyphen- ated" -> "hyphenated")
- :func:`keyword_overrides` — KeywordMarkerFilter.java +
  StemmerOverrideFilter.java as a stem-function wrapper (keywords pass
  unstemmed; overrides map to a fixed form)
- :class:`FilterChainAnalyzer` — composes any of the above behind an
  existing analyzer, preserving position gaps for dropped tokens (the
  posIncr contract of the reference chain).

All are pure per-token (or small stream-local) functions — they run
inside map_batches workers with zero state, so the chain ships by value
to every actor.
"""

from __future__ import annotations

import re
from typing import Callable

from .analyzers import Analyzer


def length_filter(min_len: int = 1, max_len: int = 255):
    def f(tok: str) -> str | None:
        return tok if min_len <= len(tok) <= max_len else None
    return f


def keep_words(words) -> Callable[[str], str | None]:
    keep = frozenset(words)

    def f(tok: str) -> str | None:
        return tok if tok in keep else None
    return f


def trim_token(tok: str) -> str | None:
    t = tok.strip()
    return t or None


def truncate_token(length: int):
    def f(tok: str) -> str:
        return tok[:length]
    return f


def pattern_replace(pattern: str, replacement: str, *,
                    replace_all: bool = True):
    pat = re.compile(pattern)  # compiled ONCE, closure ships to workers

    def f(tok: str) -> str | None:
        out = pat.sub(replacement, tok, count=0 if replace_all else 1)
        return out or None
    return f


def remove_duplicates(tokens: list[str],
                      positions: list[int]) -> tuple[list[str], list[int]]:
    """Drop exact repeats at the SAME position (posIncr-0 duplicates,
    e.g. synonym/WDF echoes) — RemoveDuplicatesTokenFilter.java:51."""
    out_t: list[str] = []
    out_p: list[int] = []
    seen_at: set[str] = set()
    last_pos: int | None = None
    for t, p in zip(tokens, positions):
        if p != last_pos:
            seen_at = set()
            last_pos = p
        if t in seen_at:
            continue
        seen_at.add(t)
        out_t.append(t)
        out_p.append(p)
    return out_t, out_p


def join_hyphenations(tokens: list[str],
                      positions: list[int]) -> tuple[list[str], list[int]]:
    """Re-join line-break hyphenations (HyphenatedWordsFilter.java:67):
    a token ending in '-' merges with the following token at the first
    token's position."""
    out_t: list[str] = []
    out_p: list[int] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t.endswith("-") and i + 1 < len(tokens):
            out_t.append(t[:-1] + tokens[i + 1])
            out_p.append(positions[i])
            i += 2
        else:
            out_t.append(t.rstrip("-") or t)
            out_p.append(positions[i])
            i += 1
    return out_t, out_p


def keyword_overrides(stem_fn: Callable[[str], str],
                      *, keywords=frozenset(),
                      overrides: dict[str, str] | None = None
                      ) -> Callable[[str], str]:
    """KeywordMarkerFilter + StemmerOverrideFilter semantics: tokens in
    ``keywords`` bypass the stemmer unchanged; tokens in ``overrides``
    map to their fixed form; everything else stems normally."""
    kw = frozenset(keywords)
    ov = dict(overrides or {})

    def f(tok: str) -> str:
        if tok in kw:
            return tok
        o = ov.get(tok)
        if o is not None:
            return o
        return stem_fn(tok)
    return f


class FilterChainAnalyzer(Analyzer):
    """Composes per-token filters (str -> str|None; None drops with a
    position gap) and optional stream filters ((tokens, positions) ->
    (tokens, positions)) behind any base analyzer — the Solr
    ``<analyzer><filter .../></analyzer>`` chain assembly."""

    def __init__(self, name: str, base: Analyzer,
                 token_filters: list[Callable[[str], str | None]] = (),
                 stream_filters: list[Callable] = ()):
        self.name = name
        self.base = base
        self.token_filters = list(token_filters)
        self.stream_filters = list(stream_filters)

    def _apply(self, toks: list[str],
               pos: list[int]) -> tuple[list[str], list[int]]:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(toks, pos):
            cur: str | None = t
            for f in self.token_filters:
                cur = f(cur)
                if cur is None:
                    break
            if cur is not None:
                out_t.append(cur)
                out_p.append(int(p))
        for sf in self.stream_filters:
            out_t, out_p = sf(out_t, out_p)
        return out_t, out_p

    def tokens(self, text: str) -> list[str]:
        return self.tokens_with_positions(text)[0]

    def tokens_with_positions(self, text: str):
        toks, pos = self.base.tokens_with_positions(text)
        return self._apply(toks, list(pos))


# ---------------------------------------------------------------------------
# ReversedWildcardFilter (solr/core/src/java/org/apache/solr/analysis/
# ReversedWildcardFilterFactory.java + lucene ReverseStringFilter.java):
# index-time, each token also emits its REVERSED form behind a marker
# char at the same position; leading-wildcard queries (*foo) rewrite to
# a PREFIX scan over the reversed terms instead of a full-dictionary
# scan — O(log V) instead of O(V) per query at 10^9-term scale.
# ---------------------------------------------------------------------------

REVERSE_MARKER = "\u0001"  # ReverseStringFilter.START_OF_HEADING_MARKER


class ReversedWildcardAnalyzer(Analyzer):
    """Base chain + marker-prefixed reversed twin per token (posIncr 0).
    The searcher detects the marker terms and rewrites leading-wildcard
    patterns onto them automatically."""

    def __init__(self, name: str = "reversed_wildcard",
                 base: Analyzer | None = None):
        from .analyzers import StandardAnalyzer

        self.name = name
        self.base = base or StandardAnalyzer()

    def tokens_with_positions(self, text: str):
        toks, pos = self.base.tokens_with_positions(text)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(toks, pos):
            out_t.append(t)
            out_p.append(int(p))
            out_t.append(REVERSE_MARKER + t[::-1])
            out_p.append(int(p))
        return out_t, out_p

    def tokens(self, text: str) -> list[str]:
        return self.tokens_with_positions(text)[0]
