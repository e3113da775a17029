"""Pluggable similarities beyond BM25 — the Similarity extension point.

:class:`ClassicSimilarity` restates Lucene's TF-IDF scoring
(``lucene/core/src/java/org/apache/lucene/search/similarities/
ClassicSimilarity.java`` / ``TFIDFSimilarity.java``):

- ``tf(freq) = sqrt(freq)``
- ``idf(df, N) = log(N / (df + 1)) + 1``
- ``lengthNorm = 1 / sqrt(fieldLength)`` — reconstructed from the shared
  quantized norm byte (the same ``floatToByte315`` byte BM25 uses; the
  decode table gives the quantized length back, so the classic norm is
  ``1/sqrt(decoded_length)`` — byte-level faithful to the shared norms
  file)
- ``queryNorm = 1 / sqrt(sum of squared clause weights)``
  (``TFIDFSimilarity.java`` queryNorm; weight = idf for boost-1 terms)
- ``coord(overlap, maxOverlap) = overlap / maxOverlap`` for OR queries

Per-term partial = ``tf(f) * idf^2 * lengthNorm`` (queryWeight *
fieldWeight); final = ``queryNorm * coord * sum(partials)``.

Scope: term and OR-of-terms queries (the TermQuery/BooleanQuery scorer
pair the reference's TestSimilarity exercises); other query shapes raise.
The BM25 default path is untouched (it stays bit-faithful).
"""

from __future__ import annotations

import math

import numpy as np

from ..codec import NORM_TABLE


class LMDirichletSimilarity:
    """Language-model similarity with Dirichlet smoothing
    (``similarities/LMDirichletSimilarity.java``; Zhai & Lafferty 2001):

    ``score = max(0, log(1 + tf / (mu * p(w|C))) + log(mu / (dl + mu)))``

    with ``p(w|C) = totalTermFreq / sumTotalTermFreq`` (the collection
    language model, ``LMSimilarity.DefaultCollectionModel``) and exact
    doc lengths from the norms file. OR queries sum clause scores (no
    coord/queryNorm — SimilarityBase returns 1 for both)."""

    name = "lmdirichlet"

    def __init__(self, mu: float = 2000.0):
        self.mu = mu

    def score_or(self, searcher, terms: list[str]):
        sum_ttf = max(1, searcher.manifest.sum_total_term_freq)
        mu = self.mu
        parts = []
        for t in terms:
            docs, tfs = searcher.reader.postings(t)
            if searcher.live_docs is not None and docs.size:
                keep = searcher.live_docs.mask[docs]
                docs, tfs = docs[keep], tfs[keep]
            if docs.size == 0:
                continue
            p_c = searcher.reader.total_term_freq(t) / sum_ttf
            if p_c <= 0:
                continue
            dl = searcher.norms.length[docs].astype(np.float64)
            s = (np.log1p(tfs.astype(np.float64) / (mu * p_c))
                 + np.log(mu / (dl + mu)))
            parts.append((docs, np.maximum(s, 0.0)))
        if not parts:
            e = np.empty(0, np.int64)
            return e, e.astype(np.float64)
        union = np.unique(np.concatenate([d for d, _ in parts]))
        acc = np.zeros(union.size, np.float64)
        for docs, s in parts:
            np.add.at(acc, np.searchsorted(union, docs), s)
        return union, acc


class ClassicSimilarity:
    name = "classic"

    @staticmethod
    def idf(df: int, num_docs: int) -> float:
        return math.log(num_docs / (df + 1)) + 1.0

    @staticmethod
    def tf(freqs: np.ndarray) -> np.ndarray:
        return np.sqrt(freqs.astype(np.float64))

    def _doc_norms(self, searcher, docs: np.ndarray) -> np.ndarray:
        """Per-doc length norm — the one line subclasses override
        (SweetSpotSimilarity swaps the plateau formula in here)."""
        inv_sqrt_len = 1.0 / np.sqrt(NORM_TABLE.astype(np.float64))
        return inv_sqrt_len[searcher.norms.norm[docs]]

    def score_or(self, searcher, terms: list[str]):
        """(docs asc, scores) for an OR-of-terms query, float64."""
        n = searcher.max_doc
        datas = []
        idfs = []
        for t in terms:
            docs, tfs = searcher.reader.postings(t)
            if searcher.live_docs is not None and docs.size:
                keep = searcher.live_docs.mask[docs]
                docs, tfs = docs[keep], tfs[keep]
            df = searcher.doc_freq(t)
            datas.append((docs, tfs))
            idfs.append(self.idf(df, n) if df else 0.0)
        qnorm_den = math.sqrt(sum(i * i for i in idfs)) or 1.0
        qnorm = 1.0 / qnorm_den
        union = np.unique(np.concatenate(
            [d for d, _ in datas] or [np.empty(0, np.int64)]))
        acc = np.zeros(union.size, np.float64)
        overlap = np.zeros(union.size, np.int64)
        for (docs, tfs), i in zip(datas, idfs):
            if docs.size == 0:
                continue
            pos = np.searchsorted(union, docs)
            norm = self._doc_norms(searcher, docs)
            partial = self.tf(tfs) * (i * i) * norm
            np.add.at(acc, pos, partial)
            np.add.at(overlap, pos, 1)
        coord = overlap / float(len(terms))
        return union, (acc * qnorm * coord)


class SweetSpotSimilarity(ClassicSimilarity):
    """``lucene/misc/src/java/org/apache/lucene/misc/
    SweetSpotSimilarity.java``: ClassicSimilarity with a PLATEAU length
    norm — docs whose length falls inside [ln_min, ln_max] get the full
    norm 1/sqrt(base); outside, the norm decays with ``steepness``:

        lengthNorm(l) = 1 / sqrt( steepness * (|l - ln_min| +
                        |l - ln_max| - (ln_max - ln_min)) + base )

    and an optional baseline tf: freqs below ``tf_min`` score
    ``tf_base`` instead of sqrt(freq) (baselineTf)."""

    name = "sweetspot"

    def __init__(self, ln_min: int = 1, ln_max: int = 1,
                 steepness: float = 0.5, base: float = 1.0,
                 tf_min: float = 0.0, tf_base: float = 0.0):
        self.ln_min, self.ln_max = ln_min, ln_max
        self.steepness, self.base = steepness, base
        self.tf_min, self.tf_base = tf_min, tf_base

    def length_norm(self, lengths: np.ndarray) -> np.ndarray:
        l_ = lengths.astype(np.float64)
        core = (np.abs(l_ - self.ln_min) + np.abs(l_ - self.ln_max)
                - (self.ln_max - self.ln_min))
        return 1.0 / np.sqrt(self.steepness * core + self.base)

    def tf(self, freqs: np.ndarray) -> np.ndarray:
        t = np.sqrt(freqs.astype(np.float64))
        if self.tf_min > 0:
            t = np.where(freqs < self.tf_min, self.tf_base, t)
        return t

    def _doc_norms(self, searcher, docs: np.ndarray) -> np.ndarray:
        # plateau norm from TRUE doc lengths (precise norms path);
        # everything else is the inherited Classic scoring skeleton
        return self.length_norm(searcher.norms.length[docs])


class LMJelinekMercerSimilarity:
    """Language model with Jelinek-Mercer smoothing
    (``similarities/LMJelinekMercerSimilarity.java``; Zhai & Lafferty
    2001):

        score = log(1 + ((1 - lambda) * tf/dl) / (lambda * p(w|C)))

    with p(w|C) = totalTermFreq / sumTotalTermFreq. The reference's
    guidance: small lambda (0.1) for short queries, 0.7 for long ones.
    OR queries sum clause scores (SimilarityBase: no coord/queryNorm)."""

    name = "lmjelinekmercer"

    def __init__(self, lambda_: float = 0.1):
        if not 0.0 < lambda_ < 1.0:
            raise ValueError("lambda must be in (0, 1)")
        self.lambda_ = lambda_

    def score_or(self, searcher, terms: list[str]):
        sum_ttf = max(1, searcher.manifest.sum_total_term_freq)
        lam = self.lambda_
        parts = []
        for t in terms:
            docs, tfs = searcher.reader.postings(t)
            if searcher.live_docs is not None and docs.size:
                keep = searcher.live_docs.mask[docs]
                docs, tfs = docs[keep], tfs[keep]
            if docs.size == 0:
                continue
            p_c = searcher.reader.total_term_freq(t) / sum_ttf
            if p_c <= 0:
                continue
            dl = searcher.norms.length[docs].astype(np.float64)
            s = np.log1p(((1 - lam) * tfs.astype(np.float64) / dl)
                         / (lam * p_c))
            parts.append((docs, s))
        if not parts:
            e = np.empty(0, np.int64)
            return e, e.astype(np.float64)
        union = np.unique(np.concatenate([d for d, _ in parts]))
        acc = np.zeros(union.size, np.float64)
        for docs, s in parts:
            np.add.at(acc, np.searchsorted(union, docs), s)
        return union, acc


class DFRSimilarity:
    """Divergence-from-randomness (``similarities/DFRSimilarity.java``,
    Amati & van Rijsbergen 2002): score = tfn-after-effect-weighted
    information content. Pluggable pieces restated:

    - basic models: ``"in"`` — I(n): tfn * log2((N + 1) / (df + 0.5));
      ``"g"`` — geometric: log2(1 + l) + tfn * log2((1 + l) / l) with
      l = ttf / N; ``"if"`` — I(F); ``"ine"`` — I(ne) with the expected
      doc count ne = N(1 - ((N-1)/N)^F); ``"p"`` — the Poisson
      approximation (BasicModelP). (BE and D are the reference's
      numerically-unstable variants superseded by G and P and are
      intentionally not restated.)
    - after effects: ``"l"`` — Laplace 1/(tfn + 1); ``"b"`` — ratio of
      Bernoulli (ttf + 1) / (df * (tfn + 1)).
    - normalizations: ``"h1"`` — tf * avgdl / dl; ``"h2"`` —
      tf * log2(1 + c * avgdl / dl).

    The canonical configuration I(n)L2 is the default. OR queries sum
    clause scores (SimilarityBase semantics)."""

    def __init__(self, basic_model: str = "in", after_effect: str = "l",
                 normalization: str = "h2", c: float = 1.0,
                 mu: float = 800.0, z: float = 0.30):
        assert basic_model in ("in", "g", "if", "ine", "p")
        assert after_effect in ("l", "b")
        assert normalization in ("h1", "h2", "h3", "z")
        self.basic_model = basic_model
        self.after_effect = after_effect
        self.normalization = normalization
        self.c = c
        self.mu = mu  # NormalizationH3 Dirichlet prior (default 800)
        self.z = z    # NormalizationZ exponent (default 0.30)
        self.name = f"dfr_{basic_model}{after_effect}{normalization}"

    def _tfn(self, tfs, dl, avgdl, ttf, sum_ttf):
        if self.normalization == "h1":
            return tfs * (avgdl / dl)
        if self.normalization == "h2":
            return tfs * np.log2(1 + self.c * avgdl / dl)
        if self.normalization == "h3":
            # NormalizationH3.java: Dirichlet-prior smoothing
            return ((tfs + self.mu * ((ttf + 1.0) / (sum_ttf + 1.0)))
                    / (dl + self.mu) * self.mu)
        # NormalizationZ.java: Pareto-Zipf
        return tfs * np.power(avgdl / dl, self.z)

    def score_or(self, searcher, terms: list[str]):
        n = float(searcher.max_doc)
        avgdl = max(searcher.manifest.sum_total_term_freq / n, 1e-9)
        parts = []
        for t in terms:
            docs, tfs = searcher.reader.postings(t)
            if searcher.live_docs is not None and docs.size:
                keep = searcher.live_docs.mask[docs]
                docs, tfs = docs[keep], tfs[keep]
            if docs.size == 0:
                continue
            df = float(searcher.doc_freq(t))
            ttf = float(searcher.reader.total_term_freq(t))
            dl = searcher.norms.length[docs].astype(np.float64)
            tfn = self._tfn(tfs.astype(np.float64), dl, avgdl, ttf,
                            float(searcher.manifest.sum_total_term_freq))
            if self.basic_model == "in":
                info = tfn * np.log2((n + 1.0) / (df + 0.5))
            elif self.basic_model == "g":
                lam = ttf / n
                info = (np.log2(1 + lam)
                        + tfn * np.log2((1 + lam) / lam))
            elif self.basic_model == "if":
                # BasicModelIF.java: tfn * log2(1 + (N+1)/(F+0.5))
                info = tfn * np.log2(1 + (n + 1.0) / (ttf + 0.5))
            elif self.basic_model == "ine":
                # BasicModelIne.java: expected ne = N(1 - ((N-1)/N)^F)
                ne = n * (1 - ((n - 1.0) / n) ** ttf)
                info = tfn * np.log2((n + 1.0) / (ne + 0.5))
            else:  # "p" — BasicModelP.java Poisson approximation
                lam = (ttf + 1.0) / (n + 1.0)
                log2e = np.log2(np.e)
                info = (tfn * np.log2(tfn / lam)
                        + (lam + 1.0 / (12 * tfn) - tfn) * log2e
                        + 0.5 * np.log2(2 * np.pi * tfn))
            if self.after_effect == "l":
                ae = 1.0 / (tfn + 1.0)
            else:
                ae = (ttf + 1.0) / (df * (tfn + 1.0))
            parts.append((docs, ae * info))
        if not parts:
            e = np.empty(0, np.int64)
            return e, e.astype(np.float64)
        union = np.unique(np.concatenate([d for d, _ in parts]))
        acc = np.zeros(union.size, np.float64)
        for docs, s in parts:
            np.add.at(acc, np.searchsorted(union, docs), s)
        return union, acc


class IBSimilarity:
    """Information-based similarity (``similarities/IBSimilarity.java``,
    Clinchant & Gaussier 2010): score = distribution(tfn, lambda).

    - distributions: ``"ll"`` — log-logistic: -ln(lambda/(tfn+lambda));
      ``"spl"`` — smoothed power law:
      -ln((lambda^(tfn/(tfn+1)) - lambda) / (1 - lambda))
      (lambda clamped to 0.99 at 1, the reference's guard).
    - lambdas: ``"df"`` — (df+1)/(N+1); ``"ttf"`` — (ttf+1)/(N+1).
    - normalizations: H1/H2 (shared with DFR).

    OR queries sum clause scores (SimilarityBase)."""

    def __init__(self, distribution: str = "ll", lambda_: str = "df",
                 normalization: str = "h2", c: float = 1.0,
                 mu: float = 800.0, z: float = 0.30):
        assert distribution in ("ll", "spl")
        assert lambda_ in ("df", "ttf")
        assert normalization in ("h1", "h2", "h3", "z")
        self.distribution = distribution
        self.lambda_kind = lambda_
        self.normalization = normalization
        self.c = c
        self.mu = mu
        self.z = z
        self.name = f"ib_{distribution}_{lambda_}_{normalization}"

    _tfn = DFRSimilarity._tfn

    def score_or(self, searcher, terms: list[str]):
        n = float(searcher.max_doc)
        avgdl = max(searcher.manifest.sum_total_term_freq / n, 1e-9)
        parts = []
        for t in terms:
            docs, tfs = searcher.reader.postings(t)
            if searcher.live_docs is not None and docs.size:
                keep = searcher.live_docs.mask[docs]
                docs, tfs = docs[keep], tfs[keep]
            if docs.size == 0:
                continue
            if self.lambda_kind == "df":
                lam = (searcher.doc_freq(t) + 1.0) / (n + 1.0)
            else:
                lam = (searcher.reader.total_term_freq(t) + 1.0) \
                    / (n + 1.0)
            dl = searcher.norms.length[docs].astype(np.float64)
            ttf = float(searcher.reader.total_term_freq(t))
            tfn = self._tfn(tfs.astype(np.float64), dl, avgdl, ttf,
                            float(searcher.manifest.sum_total_term_freq))
            if self.distribution == "ll":
                s = -np.log(lam / (tfn + lam))
            else:
                lam = 0.99 if lam == 1.0 else lam
                s = -np.log(
                    (np.power(lam, tfn / (tfn + 1.0)) - lam) / (1 - lam))
            parts.append((docs, s))
        if not parts:
            e = np.empty(0, np.int64)
            return e, e.astype(np.float64)
        union = np.unique(np.concatenate([d for d, _ in parts]))
        acc = np.zeros(union.size, np.float64)
        for docs, s in parts:
            np.add.at(acc, np.searchsorted(union, docs), s)
        return union, acc


class MultiSimilarity:
    """``similarities/MultiSimilarity.java``: the SUM of several
    sub-similarities' scores per doc (MultiSimScorer.score) — score
    blending without changing any sub-formula."""

    def __init__(self, sims: list):
        self.sims = list(sims)
        self.name = "multi(" + ",".join(s.name for s in sims) + ")"

    def score_or(self, searcher, terms: list[str]):
        parts = [sim.score_or(searcher, terms) for sim in self.sims]
        parts = [(d, s) for d, s in parts if d.size]
        if not parts:
            e = np.empty(0, np.int64)
            return e, e.astype(np.float64)
        union = np.unique(np.concatenate([d for d, _ in parts]))
        acc = np.zeros(union.size, np.float64)
        for docs, s in parts:
            np.add.at(acc, np.searchsorted(union, docs), s)
        return union, acc
