"""SynonymFilter: multi-word synonym expansion at analysis time.

Restates ``lucene/analysis/common/src/java/org/apache/lucene/analysis/
synonym/SynonymFilter.java:111`` (FST-backed greedy longest-match over the
token stream, emitting synonym outputs at the position of the matched
input's first token with posIncr 0) without the FST: the rule map is a
dict keyed by input token tuples, longest-match-first scanning. Solr's
most-used custom-analysis feature (``SynonymFilterFactory`` /
``synonyms.txt`` format).

Rules:
- ``a => b``        (replace: ``keep_original=False`` per-rule)
- ``a, b, c``       (equivalence class: each expands to all others)
- multi-word inputs (``wi fi => wifi``) match greedily; outputs are
  emitted at the first matched token's position (posIncr-0 contract), so
  phrase positions stay consistent with the reference's graph behavior
  for single-token outputs.
"""

from __future__ import annotations

from .analyzers import Analyzer, get_analyzer, register_analyzer


def parse_synonym_rules(lines: list[str], analyzer=None) -> dict:
    """``synonyms.txt`` lines -> {input_tuple: (outputs, keep_original)}.

    Input/output sides are run through ``analyzer`` (default: raw
    whitespace split, lowercased) — SynonymMap.Builder analyzes rule text
    with the same chain that will consume it."""
    def norm(side: str) -> list[str]:
        if analyzer is not None:
            return analyzer.tokens(side)
        return [t for t in side.lower().split() if t]

    rules: dict[tuple, tuple[list[str], bool]] = {}

    def add(inp: tuple, outs: list[str], keep: bool):
        prev = rules.get(inp)
        if prev:
            merged = prev[0] + [o for o in outs if o not in prev[0]]
            rules[inp] = (merged, prev[1] or keep)
        else:
            rules[inp] = (outs, keep)

    for line in lines:
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            outs = [o for part in rhs.split(",")
                    for o in [" ".join(norm(part))] if o]
            for part in lhs.split(","):
                inp = tuple(norm(part))
                if inp:
                    add(inp, outs, keep=False)
        else:
            classes = [tuple(norm(p)) for p in line.split(",")]
            classes = [c for c in classes if c]
            for c in classes:
                outs = [" ".join(o) for o in classes if o != c]
                add(c, outs, keep=True)
    return rules


class SynonymAnalyzer(Analyzer):
    """Base chain + greedy longest-match synonym expansion."""

    name = "synonym"

    def __init__(self, rules: dict, base: str = "standard"):
        self.rules = rules
        self.base = get_analyzer(base)
        self.max_len = max((len(k) for k in rules), default=1)

    def _expand(self, toks: list[str], pos: list[int]):
        out_t: list[str] = []
        out_p: list[int] = []
        i = 0
        n = len(toks)
        while i < n:
            matched = None
            # greedy longest match (the FST's longest-output behavior)
            for ln in range(min(self.max_len, n - i), 0, -1):
                key = tuple(toks[i : i + ln])
                if key in self.rules:
                    matched = (ln, *self.rules[key])
                    break
            if matched is None:
                out_t.append(toks[i])
                out_p.append(pos[i])
                i += 1
                continue
            ln, outs, keep = matched
            p0 = pos[i]
            if keep:
                for j in range(ln):
                    out_t.append(toks[i + j])
                    out_p.append(pos[i + j])
            for o in outs:  # synonyms share the first token's position
                for piece in o.split(" "):
                    out_t.append(piece)
                    out_p.append(p0)
            i += ln
        return out_t, out_p

    def tokens(self, text: str) -> list[str]:
        return self._expand(*self.base.tokens_with_positions(text))[0]

    def tokens_with_positions(self, text: str):
        return self._expand(*self.base.tokens_with_positions(text))


def register_synonyms(name: str, lines: list[str],
                      base: str = "standard") -> SynonymAnalyzer:
    """Build + register a synonym analyzer (the SynonymFilterFactory)."""
    ana = SynonymAnalyzer(parse_synonym_rules(lines), base=base)
    register_analyzer(name, ana)
    return ana
