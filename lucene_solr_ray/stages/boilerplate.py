"""Boilerplate removal — the jusText algorithm (Pomikálek 2011,
"Removing Boilerplate and Duplicate Content from Web Corpora", public
algorithm description) over the HTML loader's block stream.

Web-corpus curation (C4 / RefinedWeb class pipelines) extracts the
MAIN content of a page and drops navigation, footers, ads and link
farms.  jusText does this with two passes over paragraph blocks:

1. **Context-free classification** per block from three cheap
   features — link density (chars inside <a> / chars), stopword
   density, and length:
   - link_density > ``max_link_density`` (0.2)            -> BAD
   - len < ``length_low`` (70): SHORT (defer to context);
     except link-heavy short blocks                        -> BAD
   - stopword density >= ``stopwords_high`` (0.32) and
     len > ``length_high`` (200)                           -> GOOD
   - stopword density >= ``stopwords_low`` (0.30)          -> NEAR-GOOD
   - else                                                  -> BAD
2. **Context-sensitive smoothing**: SHORT and NEAR-GOOD blocks take
   the label of their nearest GOOD/BAD neighbors — GOOD on either
   side pulls them in (headers, short sentences inside articles
   survive; isolated short links die).

Distributed shape: the classifier is a pure per-document function —
an actor-pool ``map_batches`` stage with the stoplist compiled once in
``__init__``; no shuffle, no driver state, stream-safe at any corpus
size.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..analysis import ENGLISH_STOP_WORDS

GOOD, BAD, SHORT, NEAR_GOOD = "good", "bad", "short", "neargood"

_WORD = re.compile(r"[a-z0-9]+")


def classify_blocks(
    blocks: list[dict],
    *,
    stop_words=ENGLISH_STOP_WORDS,
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
) -> list[str]:
    """jusText two-pass labels for blocks of {"text", "link_density"}."""
    stop = frozenset(stop_words)
    labels = []
    for b in blocks:
        text = b["text"]
        words = _WORD.findall(text.lower())
        sw = sum(1 for w in words if w in stop) / len(words) if words \
            else 0.0
        ld = float(b.get("link_density", 0.0))
        n = len(text)
        if ld > max_link_density:
            labels.append(BAD)
        elif n < length_low:
            labels.append(BAD if ld > 0 else SHORT)
        elif sw >= stopwords_high:
            labels.append(GOOD if n > length_high else NEAR_GOOD)
        elif sw >= stopwords_low:
            labels.append(NEAR_GOOD)
        else:
            labels.append(BAD)
    # context-sensitive pass (jusText §3.3): SHORT/NEAR-GOOD resolve by
    # the closest preceding/following context-free GOOD/BAD blocks
    # (document edges default BAD). NEAR-GOOD joins a GOOD side;
    # SHORT needs GOOD on both sides, or — in the mixed case — an
    # adjacent NEAR-GOOD bridging it toward the GOOD side (the
    # revise_paragraph step, simplified to adjacency).
    hard = [(i, la) for i, la in enumerate(labels) if la in (GOOD, BAD)]
    out = list(labels)
    for i, la in enumerate(labels):
        if la in (GOOD, BAD):
            continue
        prev = next((x[1] for x in reversed(hard) if x[0] < i), BAD)
        nxt = next((x[1] for x in hard if x[0] > i), BAD)
        if la == NEAR_GOOD:
            out[i] = GOOD if GOOD in (prev, nxt) else BAD
        elif prev == GOOD and nxt == GOOD:
            out[i] = GOOD
        elif prev == BAD and nxt == BAD:
            out[i] = BAD
        else:  # mixed: a touching NEAR-GOOD pulls the short block in
            adj = {labels[i - 1] if i else None,
                   labels[i + 1] if i + 1 < len(labels) else None}
            out[i] = GOOD if NEAR_GOOD in adj else BAD
    return out


def html_to_blocks(html: str) -> list[dict]:
    """Paragraph blocks with link densities from raw HTML (the jusText
    segmentation: block-level tags delimit paragraphs; <a> subtree
    chars count toward link density)."""
    from html.parser import HTMLParser

    BLOCK_TAGS = frozenset((
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td",
        "th", "blockquote", "pre", "section", "article", "header",
        "footer", "nav", "aside", "br", "tr", "table", "ul", "ol",
    ))
    SKIP = frozenset(("script", "style", "template", "noscript", "head"))

    class P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.blocks: list[dict] = []
            self._txt: list[str] = []
            self._link_chars = 0
            self._a_depth = 0
            self._skip = 0

        def _flush(self):
            text = " ".join("".join(self._txt).split())
            if text:
                self.blocks.append({
                    "text": text,
                    "link_density": self._link_chars / max(len(text), 1),
                })
            self._txt, self._link_chars = [], 0

        def handle_starttag(self, tag, attrs):
            if tag in SKIP:
                self._skip += 1
            elif tag == "a":
                self._a_depth += 1
            if tag in BLOCK_TAGS:
                self._flush()

        def handle_endtag(self, tag):
            if tag in SKIP and self._skip:
                self._skip -= 1
            elif tag == "a" and self._a_depth:
                self._a_depth -= 1
            if tag in BLOCK_TAGS:
                self._flush()

        def handle_data(self, data):
            if self._skip:
                return
            self._txt.append(data)
            if self._a_depth:
                self._link_chars += len(" ".join(data.split()))

    p = P()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    p._flush()
    return p.blocks


def extract_main_content(html: str, **kw) -> str:
    """jusText end-to-end: GOOD blocks joined with newlines."""
    blocks = html_to_blocks(html)
    labels = classify_blocks(blocks, **kw)
    return "\n".join(b["text"] for b, la in zip(blocks, labels)
                     if la == GOOD)


class BoilerplateFilter:
    """Actor-pool stage: ``map_batches(BoilerplateFilter,
    fn_constructor_kwargs=..., concurrency=N)`` over an HTML column —
    stoplist/thresholds bound once per actor, one pure function per
    row, no shuffle."""

    def __init__(self, html_col: str = "html",
                 out_col: str = "main_text", **kw):
        self.html_col = html_col
        self.out_col = out_col
        self.kw = kw

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_main_content(h or "", **self.kw)
                 for h in batch[self.html_col].to_pylist()]
        return batch.append_column(
            self.out_col, pa.array(texts, pa.string()))


def boilerplate_filter(ds, html_col: str = "html",
                       out_col: str = "main_text", *,
                       concurrency: int = 4, **kw):
    return ds.map_batches(
        BoilerplateFilter, batch_format="pyarrow",
        fn_constructor_kwargs=dict(html_col=html_col, out_col=out_col,
                                   **kw),
        concurrency=(1, concurrency),
    )
