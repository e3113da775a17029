"""Analyzers: tokenizer + filter chains, mirroring the reference's Analyzer API.

- :class:`StandardAnalyzer` replicates the reference chain
  ``StandardTokenizer -> StandardFilter(no-op) -> LowerCaseFilter -> StopFilter``
  (``lucene/analysis/common/src/java/org/apache/lucene/analysis/standard/
  StandardAnalyzer.java:87-113``), including the 33-word English stop set
  (``core/StopAnalyzer.java:42-48``) and position-gap accounting for removed
  stopwords (``core/StopFilter.java:31``, ``util/FilteringTokenFilter.java:50-58``).

- :class:`SimpleRegexAnalyzer` is the SQL-oracle-matchable analyzer: lowercase
  + split on ``[^a-z0-9]+`` + stop set — the ``LetterOrDigitTokenizer`` family
  (``core/LowerCaseTokenizer``-style, ``lucene/analysis/common/.../core/``).
  Its output is reproducible in DuckDB with ``string_split_regex``, which is
  what the driver's correctness oracle runs.

- :class:`WhitespaceAnalyzer` mirrors ``core/WhitespaceAnalyzer.java``.

Analyzers are stateless after construction (compiled patterns, frozen stop
set); construct once per worker (module-level registry) — the Ray analogue of
``Analyzer.ReuseStrategy`` (``lucene/core/.../analysis/Analyzer.java:72-96``).

``field length`` for norms = number of tokens the full chain *emits* (stop
words and over-long tokens excluded) minus overlap tokens; with these chains
no filter emits posIncr==0 so numOverlap==0
(``index/DefaultIndexingChain.java:621-645``).
"""

from __future__ import annotations

import re

import numpy as np

from .fast import ascii_tokenize_concat
from .tokenizer import (
    DEFAULT_MAX_TOKEN_LENGTH,
    simple_lowercase,
    tokenize,
    tokenize_with_positions,
)

# StopAnalyzer.ENGLISH_STOP_WORDS_SET (core/StopAnalyzer.java:42-48)
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


class Analyzer:
    """Base: subclasses implement tokens(text) and tokens_with_positions(text)."""

    name = "base"

    def tokens(self, text: str) -> list[str]:
        raise NotImplementedError

    def tokens_with_positions(self, text: str) -> tuple[list[str], list[int]]:
        # default: no position gaps beyond token order
        toks = self.tokens(text)
        return toks, list(range(len(toks)))

    def __call__(self, text: str) -> list[str]:
        return self.tokens(text)

    def tokens_batch(
        self, texts: list[str]
    ) -> tuple[list[str], np.ndarray, np.ndarray]:
        """Batch tokenize: returns (tokens, doc_idx:int64, positions:int64).

        Default implementation loops docs; StandardAnalyzer overrides with a
        vectorized concat pass. Positions include gaps for tokens removed by
        the chain (stop words / over-long), mirroring posIncr accumulation
        (``core/StopFilter.java:31``, ``StandardTokenizer.java:158``).
        """
        all_t: list[str] = []
        all_d: list[np.ndarray] = []
        all_p: list[np.ndarray] = []
        for i, text in enumerate(texts):
            t, p = self.tokens_with_positions(text)
            all_t.extend(t)
            all_d.append(np.full(len(t), i, dtype=np.int64))
            all_p.append(np.asarray(p, dtype=np.int64))
        if all_d:
            return all_t, np.concatenate(all_d), np.concatenate(all_p)
        z = np.empty(0, np.int64)
        return all_t, z, z


class StandardAnalyzer(Analyzer):
    """The reference default chain (StandardAnalyzer.java:87-113)."""

    name = "standard"

    def __init__(self, stop_words=ENGLISH_STOP_WORDS,
                 max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.stop_words = frozenset(stop_words) if stop_words else frozenset()
        self.max_token_length = max_token_length

    def tokens(self, text: str) -> list[str]:
        # lowercase first: 1:1 simple mapping never changes WB classes, so
        # lower->tokenize == tokenize->lower (the reference order) but cheaper.
        toks = tokenize(simple_lowercase(text), self.max_token_length)
        stop = self.stop_words
        return [t for t in toks if t not in stop]

    def tokens_with_positions(self, text: str) -> tuple[list[str], list[int]]:
        toks, pos = tokenize_with_positions(
            simple_lowercase(text), self.max_token_length
        )
        stop = self.stop_words
        out_t, out_p = [], []
        for t, p in zip(toks, pos):
            if t not in stop:
                out_t.append(t)
                out_p.append(p)
        return out_t, out_p

    def tokens_batch(
        self, texts: list[str]
    ) -> tuple[list[str], np.ndarray, np.ndarray]:
        # Fast path for the ASCII docs (one vectorized pass over their
        # concat); only non-ASCII docs take the per-doc regex path.
        lowered = [t.lower() if t.isascii() else simple_lowercase(t) for t in texts]
        ascii_ids = [i for i, t in enumerate(lowered) if t.isascii()]
        if len(ascii_ids) == len(texts):
            tokens, doc_idx, positions = ascii_tokenize_concat(
                lowered, self.max_token_length
            )
        else:
            a_tok, a_doc, a_pos = ascii_tokenize_concat(
                [lowered[i] for i in ascii_ids], self.max_token_length
            )
            a_doc = np.asarray(ascii_ids, np.int64)[a_doc]
            o_tok: list[str] = []
            o_doc_l, o_pos_l = [], []
            for i, t in enumerate(lowered):
                if t.isascii():
                    continue
                toks, pos = tokenize_with_positions(t, self.max_token_length)
                o_tok.extend(toks)
                o_doc_l.append(np.full(len(toks), i, np.int64))
                o_pos_l.append(np.asarray(pos, np.int64))
            tokens = a_tok + o_tok
            doc_idx = np.concatenate(
                [a_doc] + o_doc_l if o_doc_l else [a_doc]
            )
            positions = np.concatenate(
                [a_pos] + o_pos_l if o_pos_l else [a_pos]
            )
        stop = self.stop_words
        if stop and tokens:
            # vectorized stop filter: membership checked once per DISTINCT
            # token (the batch vocabulary is tiny vs the stream), then a
            # boolean gather — not a per-token Python set probe
            import pandas as pd

            arr = np.asarray(tokens, dtype=object)
            codes, vocab = pd.factorize(arr)
            keep_vocab = np.fromiter(
                (t not in stop for t in vocab), bool, count=len(vocab))
            if not keep_vocab.all():
                keep = keep_vocab[codes]
                tokens = arr[keep].tolist()
                doc_idx = doc_idx[keep]
                positions = positions[keep]
        return tokens, doc_idx, positions

    def tokens_batch_factorized(
        self, texts: list[str]
    ) -> tuple[list[str], np.ndarray, np.ndarray, np.ndarray] | None:
        """``(vocab, codes, doc_idx, positions)`` with the token stream
        as int codes into ``vocab`` — the invert path's native shape
        (skips per-token string materialization AND its factorize).
        Non-ASCII docs take the per-doc path and append their tokens to
        the vocabulary; like :meth:`tokens_batch`, the stream lists the
        ASCII docs first, then the fallback docs (each doc's run stays
        contiguous with ascending positions, which is all the invert's
        boundary scan needs)."""
        from .fast import ascii_tokenize_concat_factorized

        lowered = [t.lower() if t.isascii() else None for t in texts]
        ascii_ids = [i for i, t in enumerate(lowered) if t is not None]
        if len(ascii_ids) == len(texts):
            res = ascii_tokenize_concat_factorized(
                lowered, self.max_token_length)
            if res is None:  # over-wide token: string path instead
                return None
            vocab, codes, doc_idx, positions = res
        else:
            res = ascii_tokenize_concat_factorized(
                [lowered[i] for i in ascii_ids],
                self.max_token_length)
            if res is None:
                return None
            vocab, codes, doc_idx, positions = res
            doc_idx = np.asarray(ascii_ids, np.int64)[doc_idx]
            vid = {t: i for i, t in enumerate(vocab)}
            o_codes: list[int] = []
            o_doc_l, o_pos_l = [], []
            for i, t in enumerate(texts):
                if lowered[i] is not None:
                    continue
                toks, pos = tokenize_with_positions(
                    simple_lowercase(t), self.max_token_length)
                for tok in toks:
                    c = vid.get(tok)
                    if c is None:
                        c = len(vocab)
                        vid[tok] = c
                        vocab.append(tok)
                    o_codes.append(c)
                o_doc_l.append(np.full(len(toks), i, np.int64))
                o_pos_l.append(np.asarray(pos, np.int64))
            if o_codes:
                codes = np.concatenate(
                    [codes, np.asarray(o_codes, np.int64)])
                doc_idx = np.concatenate([doc_idx] + o_doc_l)
                positions = np.concatenate([positions] + o_pos_l)
        stop = self.stop_words
        if stop and vocab:
            keep_vocab = np.fromiter(
                (t not in stop for t in vocab), bool, count=len(vocab))
            if not keep_vocab.all():
                keep = keep_vocab[codes]
                codes = codes[keep]
                doc_idx = doc_idx[keep]
                positions = positions[keep]
                remap = np.cumsum(keep_vocab) - 1
                codes = remap[codes]
                vocab = [t for t, k in zip(vocab, keep_vocab) if k]
        return vocab, codes, doc_idx, positions


def _standard_tokens_batch_spans(ana: "StandardAnalyzer",
                                 texts: list[str]):
    """tokens_batch with char spans (OffsetAttribute): the 1:1 simple
    lowercase preserves offsets, so spans index the original text.
    Returns (tokens, doc_idx, positions, starts, ends)."""
    from .fast import ascii_tokenize_concat_spans
    from .tokenizer import tokenize_with_spans

    lowered = [t.lower() if t.isascii() else simple_lowercase(t)
               for t in texts]
    ascii_ids = [i for i, t in enumerate(lowered) if t.isascii()]
    if len(ascii_ids) == len(texts):
        tokens, doc_idx, positions, starts, ends = \
            ascii_tokenize_concat_spans(lowered, ana.max_token_length)
    else:
        a_tok, a_doc, a_pos, a_s, a_e = ascii_tokenize_concat_spans(
            [lowered[i] for i in ascii_ids], ana.max_token_length)
        a_doc = np.asarray(ascii_ids, np.int64)[a_doc]
        o_tok: list[str] = []
        o_doc, o_pos, o_s, o_e = [], [], [], []
        for i, t in enumerate(lowered):
            if t.isascii():
                continue
            toks, pos, ss, ee = tokenize_with_spans(
                t, ana.max_token_length)
            o_tok.extend(toks)
            o_doc.append(np.full(len(toks), i, np.int64))
            o_pos.append(np.asarray(pos, np.int64))
            o_s.append(np.asarray(ss, np.int64))
            o_e.append(np.asarray(ee, np.int64))
        tokens = a_tok + o_tok
        doc_idx = np.concatenate([a_doc] + o_doc) if o_doc else a_doc
        positions = np.concatenate([a_pos] + o_pos) if o_pos else a_pos
        starts = np.concatenate([a_s] + o_s) if o_s else a_s
        ends = np.concatenate([a_e] + o_e) if o_e else a_e
    stop = ana.stop_words
    if stop and tokens:
        import pandas as pd

        arr = np.asarray(tokens, dtype=object)
        codes, vocab = pd.factorize(arr)
        keep_vocab = np.fromiter(
            (t not in stop for t in vocab), bool, count=len(vocab))
        if not keep_vocab.all():
            keep = keep_vocab[codes]
            tokens = arr[keep].tolist()
            doc_idx = doc_idx[keep]
            positions = positions[keep]
            starts = starts[keep]
            ends = ends[keep]
    return tokens, doc_idx, positions, starts, ends


class SimpleRegexAnalyzer(Analyzer):
    """lowercase + split [^a-z0-9]+ + stop filter; DuckDB-reproducible."""

    name = "simple"
    _split = re.compile(r"[^a-z0-9]+")

    def __init__(self, stop_words=ENGLISH_STOP_WORDS,
                 max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.stop_words = frozenset(stop_words) if stop_words else frozenset()
        self.max_token_length = max_token_length

    def tokens(self, text: str) -> list[str]:
        stop = self.stop_words
        n = self.max_token_length
        return [t for t in self._split.split(text.lower())
                if t and len(t) <= n and t not in stop]

    def sql_tokens_cte(self, table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
        """DuckDB CTE body producing (doc_id, term) identical to tokens()."""
        stop_list = ", ".join(f"'{w}'" for w in sorted(self.stop_words))
        return (
            f"SELECT {id_col} AS doc_id, t AS term "
            f"FROM (SELECT {id_col}, unnest(string_split_regex(lower({text_col}), "
            f"'[^a-z0-9]+')) AS t FROM {table}) "
            f"WHERE t <> '' AND length(t) <= {self.max_token_length}"
            + (f" AND t NOT IN ({stop_list})" if stop_list else "")
        )


class WhitespaceAnalyzer(Analyzer):
    name = "whitespace"
    _split = re.compile(r"\s+")

    def tokens(self, text: str) -> list[str]:
        return [t for t in self._split.split(text) if t]


_REGISTRY: dict[str, Analyzer] = {}


def get_analyzer(name: str) -> Analyzer:
    """Per-process analyzer cache (the Analyzer.ReuseStrategy analogue)."""
    if name not in _REGISTRY:
        if name == "standard":
            _REGISTRY[name] = StandardAnalyzer()
        elif name == "standard_nostop":
            _REGISTRY[name] = StandardAnalyzer(stop_words=())
        elif name == "simple":
            _REGISTRY[name] = SimpleRegexAnalyzer()
        elif name == "simple_nostop":
            _REGISTRY[name] = SimpleRegexAnalyzer(stop_words=())
        elif name == "whitespace":
            _REGISTRY[name] = WhitespaceAnalyzer()
        elif name == "ngram":
            _REGISTRY[name] = NGramAnalyzer()
        elif name == "edge_ngram":
            _REGISTRY[name] = EdgeNGramAnalyzer()
        elif name == "shingle":
            _REGISTRY[name] = ShingleAnalyzer()
        elif name == "common_grams":
            _REGISTRY[name] = CommonGramsAnalyzer()
        else:
            from . import filters  # noqa: F401  registers english/code
            from . import snowball  # noqa: F401  registers de/fr/es
            from . import cjk  # noqa: F401  registers cjk/icu_folded
            from . import light  # noqa: F401  registers ar/fa/cs/hi
            from . import phonetic  # noqa: F401  registers phonetic
            from . import phonetic2  # noqa: F401  registers phonetic_*
            from . import light2  # noqa: F401  registers el/ro/ca
            from . import urlemail  # noqa: F401  registers url_email
            from . import japanese  # noqa: F401  registers ja_morph
            from . import chinese  # noqa: F401  registers zh_smart
            from . import icu  # noqa: F401  registers icu / icu_tokenizer
            from . import polish  # noqa: F401  registers polish / polish_light

            if name not in _REGISTRY:
                raise KeyError(f"unknown analyzer: {name}")
    return _REGISTRY[name]


def register_analyzer(name: str, analyzer: Analyzer) -> None:
    """Extension hook — the TokenizerFactory/AnalyzerFactory SPI analogue
    (``lucene/analysis/common/.../util/TokenizerFactory.java``)."""
    _REGISTRY[name] = analyzer


class NGramAnalyzer(Analyzer):
    """Character n-grams per token (``lucene/analysis/common/.../ngram/
    NGramTokenFilter.java``): grams of length [min_gram, max_gram] emitted
    in order per source token (used for substring/fuzzy-ish matching)."""

    name = "ngram"

    def __init__(self, min_gram: int = 2, max_gram: int = 3,
                 base: str = "simple_nostop"):
        self.min_gram = min_gram
        self.max_gram = max_gram
        self.base = get_analyzer(base)

    def tokens(self, text: str) -> list[str]:
        out = []
        for tok in self.base.tokens(text):
            for n in range(self.min_gram, self.max_gram + 1):
                for i in range(len(tok) - n + 1):
                    out.append(tok[i : i + n])
        return out


class EdgeNGramAnalyzer(Analyzer):
    """Leading-edge character n-grams per token (``lucene/analysis/common/
    .../ngram/EdgeNGramTokenFilter.java``) — the autocomplete/search-as-
    you-type staple: "search" -> se, sea, sear (min..max)."""

    name = "edge_ngram"

    def __init__(self, min_gram: int = 2, max_gram: int = 10,
                 base: str = "standard", keep_full: bool = True):
        self.min_gram = min_gram
        self.max_gram = max_gram
        self.keep_full = keep_full
        self.base = get_analyzer(base)

    def tokens(self, text: str) -> list[str]:
        out = []
        for tok in self.base.tokens(text):
            hi = min(self.max_gram, len(tok))
            for n in range(self.min_gram, hi + 1):
                out.append(tok[:n])
            if self.keep_full and len(tok) > self.max_gram:
                out.append(tok)
            elif len(tok) < self.min_gram:
                out.append(tok)
        return out


class ShingleAnalyzer(Analyzer):
    """Word shingles (``lucene/analysis/common/.../shingle/
    ShingleFilter.java``): token n-grams joined by a separator; unigrams
    optionally kept (outputUnigrams)."""

    name = "shingle"

    def __init__(self, shingle_size: int = 2, output_unigrams: bool = True,
                 sep: str = " ", base: str = "standard"):
        self.shingle_size = shingle_size
        self.output_unigrams = output_unigrams
        self.sep = sep
        self.base = get_analyzer(base)

    def tokens(self, text: str) -> list[str]:
        toks = self.base.tokens(text)
        out = list(toks) if self.output_unigrams else []
        n = self.shingle_size
        for i in range(len(toks) - n + 1):
            out.append(self.sep.join(toks[i : i + n]))
        return out


class CommonGramsAnalyzer(Analyzer):
    """CommonGramsFilter (``lucene/analysis/common/.../commongrams/
    CommonGramsFilter.java:63-88``): alongside every unigram, emit a
    bigram ``a_b`` for each adjacent pair where either side is a common
    word, so phrase queries on stop-heavy phrases ("to be or not to be")
    hit pre-joined grams instead of huge stopword postings. Grams overlap
    the FIRST token of the pair (posIncr 0 on the gram), matching the
    reference's position handling. Index-side variant (unigrams + grams);
    the query-side CommonGramsQueryFilter drop-unigram behavior is the
    ``output_unigrams=False`` flag."""

    name = "common_grams"

    def __init__(self, common_words=ENGLISH_STOP_WORDS, sep: str = "_",
                 output_unigrams: bool = True, base: str = "standard_nostop"):
        self.common = frozenset(common_words)
        self.sep = sep
        self.output_unigrams = output_unigrams
        self.base = get_analyzer(base)

    def tokens(self, text: str) -> list[str]:
        return self.tokens_with_positions(text)[0]

    def tokens_with_positions(self, text: str) -> tuple[list[str], list[int]]:
        toks, pos = self.base.tokens_with_positions(text)
        out: list[str] = []
        opos: list[int] = []
        common = self.common
        for i, t in enumerate(toks):
            if self.output_unigrams:
                out.append(t)
                opos.append(pos[i])
            if i + 1 < len(toks) and (t in common or toks[i + 1] in common):
                out.append(t + self.sep + toks[i + 1])
                opos.append(pos[i])
        return out, opos
