"""WordBreakSpellChecker — compound-splitting / combining suggestions
(``lucene/suggest/.../spell/WordBreakSpellChecker.java``).

Two complementary corrections for space errors:

- **breaks**: a term absent from the index may be dictionary words run
  together (``"hashjoin"`` -> ``hash join``).  Recursive split with up
  to ``max_changes`` break points; every part must have ``df >=
  min_suggestion_frequency`` and ``len >= min_break_word_length``;
  bounded by ``max_evaluations`` candidate checks (the reference's
  runaway guard).  Sorting: NUM_CHANGES_THEN_MAX_FREQUENCY (default)
  or NUM_CHANGES_THEN_SUMMED_FREQUENCY — fewer breaks first, then the
  per-part frequency statistic descending.
- **combinations**: adjacent query terms may be one dictionary word
  (``"data base"`` -> ``database``).  Every window of 2+ adjacent
  terms whose concatenation is <= ``max_combine_word_length`` chars is
  probed; a hit suggests (combined word, span, freq).

SUGGEST_WHEN_NOT_IN_INDEX (the default mode): a term already in the
index returns no break suggestions; SUGGEST_MORE_POPULAR requires each
part to beat the original's own document frequency.

Df probes go through the reader (bloom sidecar short-circuits the
misses — most probed substrings are not words, exactly the workload
the NO answer accelerates).
"""

from __future__ import annotations

from dataclasses import dataclass

NUM_CHANGES_THEN_MAX_FREQUENCY = "max"
NUM_CHANGES_THEN_SUMMED_FREQUENCY = "sum"
SUGGEST_WHEN_NOT_IN_INDEX = "not_in_index"
SUGGEST_MORE_POPULAR = "more_popular"
SUGGEST_ALWAYS = "always"


@dataclass(frozen=True)
class BreakSuggestion:
    words: tuple
    freqs: tuple
    changes: int

    def score(self, method: str) -> int:
        return max(self.freqs) if method == \
            NUM_CHANGES_THEN_MAX_FREQUENCY else sum(self.freqs)


@dataclass(frozen=True)
class CombineSuggestion:
    word: str
    span: tuple  # (start index, end index exclusive) in the input terms
    freq: int


class WordBreakSpellChecker:
    def __init__(self, searcher, *, min_suggestion_frequency: int = 1,
                 min_break_word_length: int = 1,
                 max_combine_word_length: int = 20,
                 max_changes: int = 1, max_evaluations: int = 1000):
        self.searcher = searcher
        self.min_freq = min_suggestion_frequency
        self.min_len = min_break_word_length
        self.max_combine_len = max_combine_word_length
        self.max_changes = max_changes
        self.max_evaluations = max_evaluations

    def _df(self, term: str) -> int:
        return self.searcher.reader.doc_freqs([term])[term]

    def suggest_word_breaks(
        self, term: str, max_suggestions: int = 5, *,
        suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
        sort_method: str = NUM_CHANGES_THEN_MAX_FREQUENCY,
    ) -> list[BreakSuggestion]:
        orig_freq = self._df(term)
        if orig_freq > 0 and suggest_mode == SUGGEST_WHEN_NOT_IN_INDEX:
            return []
        floor = self.min_freq
        if suggest_mode == SUGGEST_MORE_POPULAR:
            floor = max(floor, orig_freq + 1)
        evals = [0]
        out: list[BreakSuggestion] = []

        def rec(rest: str, parts: tuple, freqs: tuple, changes: int):
            # the break added at this level is change number changes+1
            if changes + 1 > self.max_changes or \
                    evals[0] >= self.max_evaluations:
                return
            for i in range(self.min_len, len(rest) - self.min_len + 1):
                if evals[0] >= self.max_evaluations:
                    return
                left, right = rest[:i], rest[i:]
                evals[0] += 1
                lf = self._df(left)
                if lf < floor:
                    continue
                rf = self._df(right)
                if rf >= floor:
                    out.append(BreakSuggestion(
                        parts + (left, right), freqs + (lf, rf),
                        changes + 1))
                rec(right, parts + (left,), freqs + (lf,), changes + 1)

        rec(term, (), (), 0)
        out.sort(key=lambda s: (s.changes, -s.score(sort_method),
                                s.words))
        return out[:max_suggestions]

    def suggest_word_combinations(
        self, terms: list, max_suggestions: int = 5, *,
        suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
    ) -> list[CombineSuggestion]:
        out: list[CombineSuggestion] = []
        evals = 0
        for i in range(len(terms)):
            combined = terms[i]
            for j in range(i + 1, len(terms)):
                combined += terms[j]
                if len(combined) > self.max_combine_len:
                    break
                if evals >= self.max_evaluations:
                    break
                evals += 1
                freq = self._df(combined)
                floor = self.min_freq
                if suggest_mode == SUGGEST_MORE_POPULAR:
                    floor = max(floor, max(
                        self._df(t) for t in terms[i:j + 1]) + 1)
                if freq >= floor:
                    out.append(CombineSuggestion(combined, (i, j + 1),
                                                 freq))
        out.sort(key=lambda s: (-s.freq, s.span, s.word))
        return out[:max_suggestions]
