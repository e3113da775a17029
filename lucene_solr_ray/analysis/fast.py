"""Vectorized ASCII fast path for StandardTokenizer.

For pure-ASCII text (the overwhelming majority of a source-code corpus) the
UAX#29 word-break rules implemented by the reference grammar
(``StandardTokenizerImpl.jflex:121-165``) reduce to a per-character mask:

- core token chars: ``[A-Za-z]`` (ALetter), ``[0-9]`` (Numeric), ``_``
  (ExtendNumLet, category Pc)
- ``.`` / ``'`` join when both neighbors are letters OR both are digits
  (MidNumLet / Single_Quote, WB6/7 + WB11/12)
- ``:`` joins letter-letter only (MidLetter, WB6/7)
- ``,`` / ``;`` join digit-digit only (MidNum, WB11/12)

Tokens = maximal runs of (core | joined-mid) containing at least one
letter/digit (a bare ``___`` run is not a token — the grammar's mandatory
inner segment). This is exactly the language the full regex accepts on ASCII
input; ``tests/test_analysis.py`` cross-checks the two on random ASCII text.

Everything here is numpy over a uint8 view of the encoded text — no Python
loop over characters, one slice per emitted token.
"""

from __future__ import annotations

import numpy as np

_LUT = np.zeros(128, np.uint8)
_AL, _NUM, _ENL, _DOTQ, _COLON, _COMMA = 1, 2, 3, 4, 5, 6
for _c in range(ord("a"), ord("z") + 1):
    _LUT[_c] = _AL
for _c in range(ord("A"), ord("Z") + 1):
    _LUT[_c] = _AL
for _c in range(ord("0"), ord("9") + 1):
    _LUT[_c] = _NUM
_LUT[ord("_")] = _ENL
_LUT[ord(".")] = _DOTQ
_LUT[ord("'")] = _DOTQ
_LUT[ord(":")] = _COLON
_LUT[ord(",")] = _COMMA
_LUT[ord(";")] = _COMMA


def ascii_token_spans(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Return (starts, ends) of UAX#29 tokens in ASCII byte string ``data``."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        e = np.empty(0, np.int64)
        return e, e
    cls = _LUT[b & 0x7F]
    core = (cls >= _AL) & (cls <= _ENL)
    prev = np.empty_like(cls)
    prev[0] = 0
    prev[1:] = cls[:-1]
    nxt = np.empty_like(cls)
    nxt[-1] = 0
    nxt[:-1] = cls[1:]
    ll = (prev == _AL) & (nxt == _AL)
    nn = (prev == _NUM) & (nxt == _NUM)
    join = (
        ((cls == _DOTQ) & (ll | nn))
        | ((cls == _COLON) & ll)
        | ((cls == _COMMA) & nn)
    )
    mask = core | join
    padded = np.zeros(b.size + 2, np.int8)
    padded[1:-1] = mask
    d = np.diff(padded)
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    # drop runs with no letter/digit (pure '_' runs are not tokens)
    if starts.size:
        alnum = (cls == _AL) | (cls == _NUM)
        keep = np.logical_or.reduceat(alnum, starts)
        # reduceat over [start_i, start_{i+1}) includes inter-run gaps, but
        # gap chars are all non-core (mask False) and never alnum, so the
        # any-alnum result per run is unaffected.
        return starts[keep], ends[keep]
    return starts, ends


def _ascii_concat_impl(
    texts: list[str],
    max_token_length: int = 255,
):
    """Shared vectorized pass: returns (tokens, doc_idx, positions,
    doc_rel_starts, doc_rel_ends) — spans are char offsets into each
    token's OWN document."""
    big = "\n".join(texts)
    data = big.encode("ascii")
    starts, ends = ascii_token_spans(data)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    doc_starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=doc_starts[1:])
    doc_idx = np.searchsorted(doc_starts, starts, side="right") - 1
    # per-doc position ordinal (before the length filter)
    first_of_doc = np.zeros(starts.size, dtype=bool)
    if starts.size:
        first_of_doc[0] = True
        first_of_doc[1:] = doc_idx[1:] != doc_idx[:-1]
    ordinal = np.arange(starts.size, dtype=np.int64)
    doc_tok_base = np.maximum.accumulate(np.where(first_of_doc, ordinal, 0))
    positions = ordinal - doc_tok_base
    ok = (ends - starts) <= max_token_length
    starts, ends = starts[ok], ends[ok]
    doc_idx, positions = doc_idx[ok], positions[ok]
    tokens = [big[s:e] for s, e in zip(starts.tolist(), ends.tolist())]
    base = doc_starts[doc_idx]
    return tokens, doc_idx, positions, starts - base, ends - base


def ascii_tokenize_concat(
    texts: list[str],
    max_token_length: int = 255,
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Tokenize a batch of ASCII strings in one vectorized pass.

    Joins docs with ``\\n`` (always a boundary), extracts token spans once,
    and attributes each token to its document via searchsorted.

    Returns ``(tokens, doc_idx, positions)`` where positions are
    per-document token ordinals *including* gaps for dropped over-long
    tokens (``StandardTokenizer.java:145-167``).
    """
    tokens, doc_idx, positions, _s, _e = _ascii_concat_impl(
        texts, max_token_length)
    return tokens, doc_idx, positions


def ascii_tokenize_concat_spans(
    texts: list[str],
    max_token_length: int = 255,
):
    """Like :func:`ascii_tokenize_concat` but also returns each token's
    char span within its document — the offsets that feed the postings
    ``.pay`` stream (``IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_
    OFFSETS``, ``Lucene50PostingsFormat.java:100-107``)."""
    return _ascii_concat_impl(texts, max_token_length)


MAX_FACTORIZE_WIDTH = 64  # bytes/row cap: beyond this the padded
# matrix (n_tokens x max_token_len) costs more than it saves


def ascii_tokenize_concat_factorized(
    texts: list[str],
    max_token_length: int = 255,
) -> tuple[list[str], np.ndarray, np.ndarray, np.ndarray] | None:
    """Factorized tokenization: ``(vocab, codes, doc_idx, positions)``
    where ``vocab[codes[i]]`` is token i. Only the DISTINCT tokens ever
    become Python strings — the token stream stays numpy end to end
    (token spans are gathered into NUL-padded fixed-width byte rows and
    hash-factorized as an ``S{w}`` array; ASCII tokens contain no
    interior NULs, so padded-row equality == string equality and the
    S-dtype decode strips the padding). Feeds ``_invert`` directly,
    replacing both the per-token string materialization and its object
    factorize. Returns None when a surviving token is wider than
    ``MAX_FACTORIZE_WIDTH`` (callers fall back to the string path)."""
    big = "\n".join(texts)
    data = big.encode("ascii")
    starts, ends = ascii_token_spans(data)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    doc_starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=doc_starts[1:])
    doc_idx = np.searchsorted(doc_starts, starts, side="right") - 1
    first_of_doc = np.zeros(starts.size, dtype=bool)
    if starts.size:
        first_of_doc[0] = True
        first_of_doc[1:] = doc_idx[1:] != doc_idx[:-1]
    ordinal = np.arange(starts.size, dtype=np.int64)
    doc_tok_base = np.maximum.accumulate(np.where(first_of_doc, ordinal, 0))
    positions = ordinal - doc_tok_base
    ok = (ends - starts) <= max_token_length
    starts, ends = starts[ok], ends[ok]
    doc_idx, positions = doc_idx[ok], positions[ok]
    if not starts.size:
        e = np.empty(0, np.int64)
        return [], e, doc_idx, positions
    b = np.frombuffer(data, dtype=np.uint8)
    tok_len = ends - starts
    w = int(tok_len.max())
    if w > MAX_FACTORIZE_WIDTH:
        return None
    import pandas as pd

    col = np.arange(w, dtype=np.int64)
    idx = starts[:, None] + col
    np.minimum(idx, b.size - 1, out=idx)
    mat = b[idx]
    mat[col >= tok_len[:, None]] = 0
    rows = np.ascontiguousarray(mat).view(f"S{w}").ravel()
    codes, uniq = pd.factorize(rows)
    vocab = [u.decode("ascii") for u in uniq]
    return vocab, codes.astype(np.int64, copy=False), doc_idx, positions
