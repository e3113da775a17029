"""Text-analysis stages for training-data pipelines (SURVEY.md + brief):

- token counting (analyzer-based), quality signals (stop-word counts,
  punctuation/alpha ratios) — Solr's field-length / langid processor family
  (``solr/core/.../update/processor/``; langid contrib)
- language ID via stop-word-profile n-gram heuristic (no external models)
- document fingerprinting: 64-bit rolling/content hashes, SimHash,
  TextProfileSignature (``solr/.../processor/TextProfileSignature.java:49-110``)

All are vectorized ``map_batches`` stages over Arrow batches.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from ..analysis import ENGLISH_STOP_WORDS, get_analyzer

# tiny per-language stop-word profiles (public common-word lists)
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf",
           "für"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "en", "que"},
}
_CJK_RE = re.compile(r"[一-鿿]")


# GPT-2-style pre-tokenizer regex (Radford et al. 2019, the published
# pattern), lookahead-free ASCII variant so DuckDB RE2 reproduces it
BPE_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
)


def bpe_token_count_batch(batch: pa.Table,
                          text_col: str = "text") -> pa.Table:
    """Per-doc BPE-ish token count: the GPT-2 pre-tokenizer split (what a
    training-data pipeline budgets sequence lengths with). The per-row
    regex scan IS the pre-tokenizer cost; compiled once per worker."""
    import re

    pat = re.compile(BPE_PRETOKEN_RE)
    counts = np.fromiter(
        (sum(1 for _ in pat.finditer(t or ""))
         for t in batch[text_col].to_pylist()),
        np.int64, count=batch.num_rows,
    )
    return pa.table({
        "doc_id": batch["doc_id"],
        "bpe_tokens": pa.array(counts),
    })


def token_quality_batch(batch: pa.Table, text_col: str = "text",
                        analyzer: str = "simple") -> pa.Table:
    """Add n_tokens / stop_tokens / distinct_tokens columns."""
    ana = get_analyzer(analyzer + "_nostop")
    texts = batch[text_col].to_pylist()
    n_tok = np.zeros(len(texts), np.int64)
    n_stop = np.zeros(len(texts), np.int64)
    n_distinct = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = ana.tokens(t or "")
        n_tok[i] = len(toks)
        n_stop[i] = sum(1 for x in toks if x in ENGLISH_STOP_WORDS)
        n_distinct[i] = len(set(toks))
    return batch.append_column(
        "n_tokens", pa.array(n_tok)
    ).append_column(
        "stop_tokens", pa.array(n_stop)
    ).append_column(
        "distinct_tokens", pa.array(n_distinct)
    )


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: CJK char presence -> zh, else best stop-word
    profile hit rate (ties -> en). Rows-only correctness check (non-SQL)."""
    texts = batch[text_col].to_pylist()
    out = []
    split = re.compile(r"[^a-zàâäçéèêëîïôöùûüñáíóúß]+")
    for t in texts:
        t = t or ""
        if _CJK_RE.search(t):
            out.append("zh")
            continue
        words = [w for w in split.split(t.lower()) if w]
        if not words:
            out.append("und")
            continue
        ws = set(words)
        best, best_hits = "en", -1
        for lang, prof in LANG_PROFILES.items():
            hits = len(ws & prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        out.append(best if best_hits > 0 else "und")
    return batch.append_column("lang_pred", pa.array(out, pa.string()))


def simhash64_batch(batch: pa.Table, text_col: str = "text",
                    analyzer: str = "simple") -> pa.Table:
    """64-bit SimHash over analyzer tokens (Charikar; near-dup
    fingerprint) — vectorized over the batch's flat token stream: one
    hash_array pass, per-doc unique tokens, then 64 segmented bit votes
    (np.add.reduceat); no per-token hashlib calls."""
    import pandas as pd

    ana = get_analyzer(analyzer + "_nostop")
    texts = [t or "" for t in batch[text_col].to_pylist()]
    out = np.zeros(len(texts), np.uint64)
    tokens, doc_idx, _ = ana.tokens_batch(texts)
    if tokens:
        th = pd.util.hash_array(np.asarray(tokens, dtype=object))
        doc_idx = np.asarray(doc_idx, np.int64)
        # set semantics: unique (doc, token-hash) pairs grouped by doc
        order = np.lexsort((th, doc_idx))
        th, doc_idx = th[order], doc_idx[order]
        keep = np.ones(th.size, bool)
        keep[1:] = (th[1:] != th[:-1]) | (doc_idx[1:] != doc_idx[:-1])
        th, doc_idx = th[keep], doc_idx[keep]
        starts = np.flatnonzero(
            np.concatenate(([True], doc_idx[1:] != doc_idx[:-1])))
        present = doc_idx[starts]
        counts = np.diff(np.append(starts, th.size))
        sig = np.zeros(present.size, np.uint64)
        for b in range(64):
            ones = np.add.reduceat(
                ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int64),
                starts)
            sig |= ((2 * ones > counts).astype(np.uint64)
                    << np.uint64(b))
        out[present] = sig
    return batch.append_column("simhash", pa.array(out.astype(np.int64)))


def text_profile_signature_batch(
    batch: pa.Table, text_col: str = "text", quant_rate: float = 0.01,
    analyzer: str = "simple",
) -> pa.Table:
    """TextProfileSignature: quantized term-frequency profile, sorted,
    md5'd (``solr/.../processor/TextProfileSignature.java:49-110``)."""
    from collections import Counter

    ana = get_analyzer(analyzer + "_nostop")
    out = []
    for t in batch[text_col].to_pylist():
        toks = ana.tokens(t or "")
        if not toks:
            out.append(hashlib.md5(b"").hexdigest())
            continue
        c = Counter(toks)
        max_freq = max(c.values())
        quant = max(2, round(quant_rate * max_freq)) if max_freq > 1 else 1
        prof = sorted(
            (term, (f // quant) * quant)
            for term, f in c.items()
            if (f // quant) * quant > 0
        )
        s = " ".join(f"{t2} {f}" for t2, f in prof)
        out.append(hashlib.md5(s.encode()).hexdigest())
    return batch.append_column("signature", pa.array(out, pa.string()))


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Appendix A1.1 —
# public thresholds). The 8 "must contain >=2 of" stop words:
GOPHER_STOPS = frozenset(
    ["the", "be", "to", "of", "and", "that", "have", "with"])
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.18
_ALPHA_RE = re.compile(r"[a-z]")


def gopher_quality_batch(batch: pa.Table,
                         text_col: str = "text") -> pa.Table:
    """Per-doc Gopher quality signals + pass flag: word count bounds,
    mean word length bounds, >=2 stop-word hits, alpha-word fraction,
    and the repetition rule (fraction of bigram occurrences taken by the
    single most frequent bigram). Whitespace words, like the paper.
    Docs with zero words are dropped (no signals to compute)."""
    from collections import Counter

    texts = batch[text_col].to_pylist()
    keep, nw, mwl, sh, af, tbf = [], [], [], [], [], []
    for i, t in enumerate(texts):
        words = (t or "").split()
        n = len(words)
        if n == 0:
            continue
        keep.append(i)
        nw.append(n)
        mwl.append(sum(map(len, words)) / n)
        sh.append(sum(1 for w in words if w in GOPHER_STOPS))
        af.append(sum(1 for w in words if _ALPHA_RE.search(w)) / n)
        if n >= 2:
            c = Counter(zip(words, words[1:]))
            tbf.append(max(c.values()) / (n - 1))
        else:
            tbf.append(0.0)
    nw_a = np.asarray(nw, np.int64)
    mwl_a = np.asarray(mwl, np.float64)
    sh_a = np.asarray(sh, np.int64)
    af_a = np.asarray(af, np.float64)
    tbf_a = np.asarray(tbf, np.float64)
    passes = (
        (nw_a >= GOPHER_MIN_WORDS) & (nw_a <= GOPHER_MAX_WORDS)
        & (mwl_a >= GOPHER_MIN_MWL) & (mwl_a <= GOPHER_MAX_MWL)
        & (sh_a >= 2) & (af_a >= GOPHER_MIN_ALPHA_FRAC)
        & (tbf_a <= GOPHER_MAX_TOP_BIGRAM_FRAC)
    ).astype(np.int64)
    out = batch.take(pa.array(keep, pa.int64()))
    for name, arr in [("n_words", pa.array(nw_a)),
                      ("mean_word_len", pa.array(mwl_a)),
                      ("gopher_stop_hits", pa.array(sh_a)),
                      ("alpha_frac", pa.array(af_a)),
                      ("top_bigram_frac", pa.array(tbf_a)),
                      ("gopher_pass", pa.array(passes))]:
        out = out.append_column(name, arr)
    return out
