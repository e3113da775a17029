"""Phonetic matching: Soundex codes + the PhoneticFilter inject chain.

Restates Solr's ``PhoneticFilterFactory`` (``solr/core`` registers
commons-codec encoders; ``lucene/analysis/phonetic/src/java/org/apache/
lucene/analysis/phonetic/PhoneticFilter.java:36`` injects the encoded
form at the same position as the original token) with the classic
American Soundex encoder (the NARA standard — the same algorithm behind
commons-codec ``Soundex.US_ENGLISH``):

- first letter kept; remaining letters coded 1-6
  (BFPV=1, CGJKQSXZ=2, DT=3, L=4, MN=5, R=6)
- consecutive identical codes collapse; vowels (AEIOUY) reset the
  run; H and W are transparent (same-coded letters separated by H/W
  still collapse)
- pad/truncate to letter + 3 digits.

The encoder is pure and per-token, so phonetic indexing is just another
map_batches analyzer chain; ``inject=True`` mirrors the filter's
default (original AND code, posIncr 0 on the code).
"""

from __future__ import annotations

from .analyzers import Analyzer, StandardAnalyzer

_CODE = {}
for letters, digit in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                       ("L", "4"), ("MN", "5"), ("R", "6")):
    for ch in letters:
        _CODE[ch] = digit


def soundex(word: str) -> str:
    """American Soundex code (letter + 3 digits), '' for no-letter
    input. Canonical vectors: Robert/Rupert -> R163, Ashcraft -> A261,
    Tymczak -> T522, Pfister -> P236."""
    w = [c for c in word.upper() if "A" <= c <= "Z"]
    if not w:
        return ""
    first = w[0]
    out = [first]
    prev = _CODE.get(first, "")
    for c in w[1:]:
        code = _CODE.get(c, "")
        if code:
            if code != prev:
                out.append(code)
                prev = code
        elif c not in "HW":
            prev = ""  # vowel: reset the run
        # H/W: transparent — prev unchanged
        if len(out) == 4:
            break
    return "".join(out) + "0" * (4 - len(out))


class PhoneticAnalyzer(Analyzer):
    """Base chain + Soundex at each token's position. ``inject=True``
    keeps the original token too (PhoneticFilter's default: the code is
    a posIncr-0 twin, so exact AND phonetic matches both hit)."""

    def __init__(self, name: str = "phonetic", base: Analyzer | None = None,
                 *, inject: bool = True,
                 encoder=soundex):
        self.name = name
        self.base = base or StandardAnalyzer()
        self.inject = inject
        self.encoder = encoder

    def tokens_with_positions(self, text: str):
        toks, pos = self.base.tokens_with_positions(text)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(toks, pos):
            code = self.encoder(t)
            if self.inject:
                out_t.append(t)
                out_p.append(int(p))
            if code and code != t:
                out_t.append(code)
                out_p.append(int(p))
        return out_t, out_p

    def tokens(self, text: str) -> list[str]:
        return self.tokens_with_positions(text)[0]


from .analyzers import register_analyzer  # noqa: E402

register_analyzer("phonetic", PhoneticAnalyzer())
