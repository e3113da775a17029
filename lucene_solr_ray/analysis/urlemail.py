"""UAX29URLEmailTokenizer analogue: URLs and emails stay single tokens.

``lucene/analysis/common/src/java/org/apache/lucene/analysis/standard/
UAX29URLEmailTokenizer.java`` extends the UAX#29 grammar with <URL> and
<EMAIL> token types so "visit https://ray.io or mail a@b.co" keeps the
address tokens whole instead of shattering them at punctuation. Here: a
compiled pre-pass extracts URL/email spans (the common scheme://, www.,
and RFC-5321-shaped addresses — the practical subset of the reference's
full RFC grammars), then the standard UAX#29 word-break tokenizer runs
over the remaining text. Positions count one per token in text order,
as the reference emits them.
"""

from __future__ import annotations

import re

from .analyzers import Analyzer, register_analyzer
from .tokenizer import simple_lowercase, tokenize_with_positions

_URL_EMAIL = re.compile(
    r"(?:(?:https?|ftp)://[^\s<>\"']+"          # scheme URLs
    r"|www\.[^\s<>\"']+"                        # schemeless www.
    r"|[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,})"  # emails
)


class URLEmailAnalyzer(Analyzer):
    """URL/email-preserving standard chain (lowercased, stop-filtered
    like StandardAnalyzer; the URL/EMAIL tokens lowercase but never
    split)."""

    name = "url_email"

    def __init__(self, stop_words=frozenset()):
        self.stop_words = frozenset(stop_words)

    def tokens_with_positions(self, text: str):
        out_t: list[str] = []
        out_p: list[int] = []
        pos = 0
        last = 0

        def emit_words(seg: str):
            nonlocal pos
            toks, _ = tokenize_with_positions(simple_lowercase(seg))
            for t in toks:
                if t not in self.stop_words:
                    out_t.append(t)
                    out_p.append(pos)
                pos += 1

        for m in _URL_EMAIL.finditer(text):
            emit_words(text[last:m.start()])
            tok = m.group(0).rstrip(".,;:!?)]}")  # trailing punctuation
            out_t.append(tok.lower())
            out_p.append(pos)
            pos += 1
            last = m.start() + len(m.group(0))
        emit_words(text[last:])
        return out_t, out_p

    def tokens(self, text: str) -> list[str]:
        return self.tokens_with_positions(text)[0]


register_analyzer("url_email", URLEmailAnalyzer())
