"""AnalyzingSuggester: analyzed-key prefix lookup to weighted surface forms.

Restates ``lucene/suggest/src/java/org/apache/lucene/search/suggest/
analyzing/AnalyzingSuggester.java``: suggestions are keyed by their
ANALYZED form (so "The Ghost Writer" matches input "ghost"), map back to
the original surface form, and rank by weight. The reference compiles an
FST; here the analyzed keys live in one sorted array binary-searched per
lookup (O(log N) per query, the same asymptotics at in-RAM scale; a
per-shard sorted array is exactly how the merged term dict is served).

Build is a Ray pass when given a Dataset: (surface, weight) pairs stream
through ``map_batches`` for analysis; the finished suggester is a compact
(keys, surfaces, weights) triple that broadcasts to serving actors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class AnalyzingSuggester:
    def __init__(self, keys: np.ndarray, surfaces: np.ndarray,
                 weights: np.ndarray):
        order = np.lexsort((-weights, keys))
        self.keys = keys[order]
        self.surfaces = surfaces[order]
        self.weights = weights[order]

    # ---- builders ----
    @classmethod
    def from_pairs(cls, pairs: list[tuple[str, float]],
                   analyzer) -> "AnalyzingSuggester":
        """Driver-side build from (surface, weight) pairs."""
        keys, surfaces, weights = [], [], []
        for surface, w in pairs:
            toks = analyzer.tokens(surface)
            if not toks:
                continue
            keys.append(" ".join(toks))
            surfaces.append(surface)
            weights.append(float(w))
        return cls(np.asarray(keys, object), np.asarray(surfaces, object),
                   np.asarray(weights, np.float64))

    @classmethod
    def from_dataset(cls, ds, surface_col: str, weight_col: str,
                     analyzer_name: str = "standard") -> "AnalyzingSuggester":
        """Distributed build: analysis inside map_batches; the collected
        dictionary is small (distinct suggestions, not the corpus)."""
        from ..analysis import get_analyzer

        def prep(b: pa.Table) -> pa.Table:
            ana = get_analyzer(analyzer_name)
            surfaces = b[surface_col].to_pylist()
            keys = [" ".join(ana.tokens(s or "")) for s in surfaces]
            return pa.table({
                "key": pa.array(keys, pa.string()),
                "surface": pa.array(surfaces, pa.string()),
                "weight": b[weight_col].combine_chunks().cast(pa.float64()),
            })

        rows = (ds.map_batches(prep, batch_format="pyarrow")
                .take_all())
        keys = np.asarray([r["key"] for r in rows], object)
        surfaces = np.asarray([r["surface"] for r in rows], object)
        weights = np.asarray([r["weight"] for r in rows], np.float64)
        ok = keys != ""
        return cls(keys[ok], surfaces[ok], weights[ok])

    # ---- lookup ----
    def suggest(self, text: str, analyzer, n: int = 5) -> pa.Table:
        """Top-n suggestions whose analyzed key starts with the analyzed
        input, weight desc then key asc."""
        toks = analyzer.tokens(text)
        prefix = " ".join(toks) if toks else text.lower().strip()
        lo = np.searchsorted(self.keys, prefix, "left")
        hi = np.searchsorted(self.keys, prefix + "\U0010FFFF", "right")
        sl = slice(int(lo), int(hi))
        w = self.weights[sl]
        order = np.lexsort((self.surfaces[sl], -w))[:n]
        return pa.table({
            "surface": pa.array(self.surfaces[sl][order].tolist(),
                                pa.string()),
            "weight": pa.array(w[order], pa.float64()),
        })


class FreeTextSuggester:
    """N-gram language-model suggester (``lucene/suggest/src/java/org/
    apache/lucene/search/suggest/analyzing/FreeTextSuggester.java``):
    predicts the next token (or completes the last partial token) from
    an n-gram model over the suggestion corpus, scored with "stupid
    backoff" (Brants et al. 2007) — score at order k is
    ``ALPHA^(grams-1-k) * count(context+cand) / count(context)``,
    backing off one order when a context is unseen, exactly the
    reference's ranking (``FreeTextSuggester.java`` lookup loop).

    Distributed build: per-batch gram counting (a Counter per block is
    the combiner) -> one small ``groupby(gram).sum`` shuffle over the
    pre-aggregated partials -> the finished model (vocab-bounded, like
    the reference's in-RAM FST) broadcasts to serving actors.
    """

    SEP = "\x1e"
    ALPHA = 0.4

    def __init__(self, counts: dict[str, int], grams: int = 2):
        self.grams = grams
        self.counts = counts
        self.total = sum(
            c for g, c in counts.items() if self.SEP not in g)
        # candidate index: context-key -> sorted (token, count) arrays
        by_ctx: dict[str, list[tuple[str, int]]] = {}
        for g, c in counts.items():
            parts = g.split(self.SEP)
            if len(parts) < 2:
                continue
            by_ctx.setdefault(self.SEP.join(parts[:-1]), []).append(
                (parts[-1], c))
        self._by_ctx = {k: sorted(v) for k, v in by_ctx.items()}

    # ---- builders ----
    @classmethod
    def from_texts(cls, texts: list[str], analyzer,
                   grams: int = 2) -> "FreeTextSuggester":
        from collections import Counter

        counts: Counter = Counter()
        for t in texts:
            toks = analyzer.tokens(t)
            for k in range(1, grams + 1):
                for i in range(len(toks) - k + 1):
                    counts[cls.SEP.join(toks[i:i + k])] += 1
        return cls(dict(counts), grams)

    @classmethod
    def from_dataset(cls, ds, text_col: str, analyzer_name: str = "standard",
                     grams: int = 2) -> "FreeTextSuggester":
        from collections import Counter

        from ..analysis import get_analyzer

        def emit(b: pa.Table) -> pa.Table:
            ana = get_analyzer(analyzer_name)
            c: Counter = Counter()
            for t in b[text_col].to_pylist():
                toks = ana.tokens(t or "")
                for k in range(1, grams + 1):
                    for i in range(len(toks) - k + 1):
                        c[cls.SEP.join(toks[i:i + k])] += 1
            return pa.table({
                "gram": pa.array(list(c.keys()), pa.string()),
                "count": pa.array(list(c.values()), pa.int64()),
            })

        rows = (ds.map_batches(emit, batch_format="pyarrow")
                .groupby("gram").sum("count").take_all())
        return cls({r["gram"]: int(r["sum(count)"]) for r in rows}, grams)

    # ---- lookup ----
    def suggest(self, text: str, analyzer, n: int = 5) -> pa.Table:
        """Trailing whitespace = predict the NEXT token; otherwise the
        last token is a prefix to complete (reference behavior)."""
        predict_next = text != text.rstrip()
        toks = analyzer.tokens(text)
        if predict_next:
            context, prefix = toks, ""
        else:
            context, prefix = toks[:-1], (toks[-1] if toks else "")
        best: dict[str, float] = {}
        max_ctx = min(self.grams - 1, len(context))
        for k in range(max_ctx, -1, -1):
            ctx = context[len(context) - k:]
            key = self.SEP.join(ctx)
            denom = (self.counts.get(key) if k else self.total) or 0
            if not denom:
                continue
            scale = self.ALPHA ** (self.grams - 1 - k)
            if k:
                cands = self._by_ctx.get(key, [])
            else:
                cands = [(g, c) for g, c in self.counts.items()
                         if self.SEP not in g]
            for tok, c in cands:
                if prefix and not tok.startswith(prefix):
                    continue
                s = scale * c / denom
                if tok not in best:  # higher-order hit always wins
                    best[tok] = s
        order = sorted(best.items(), key=lambda x: (-x[1], x[0]))[:n]
        return pa.table({
            "term": pa.array([t for t, _ in order], pa.string()),
            "score": pa.array([s for _, s in order], pa.float64()),
        })


class AnalyzingInfixSuggester(AnalyzingSuggester):
    """Infix suggester (``lucene/suggest/src/java/org/apache/lucene/
    search/suggest/analyzing/AnalyzingInfixSuggester.java:114``):
    the input may match at ANY token position of the analyzed key —
    "wr" suggests "The Ghost Writer". The reference indexes every key
    into an internal Lucene index with edge-ngrammed tokens; here the
    same lookup is an inverted (token -> entry row) pair of parallel
    sorted arrays binary-searched per query. Multi-token input follows
    the reference: all tokens but the last must match exactly, the
    last token is a prefix; ranking is weight desc (no per-position
    boost, matching allTermsRequired=true defaults).
    """

    def __init__(self, keys: np.ndarray, surfaces: np.ndarray,
                 weights: np.ndarray):
        super().__init__(keys, surfaces, weights)
        toks: list[str] = []
        rows: list[int] = []
        for i, k in enumerate(self.keys.tolist()):
            for t in dict.fromkeys(k.split()):
                toks.append(t)
                rows.append(i)
        tok_arr = np.asarray(toks, object)
        order = np.argsort(tok_arr, kind="stable")
        self._tok = tok_arr[order]
        self._row = np.asarray(rows, np.int64)[order]

    def _rows_for(self, tok: str, prefix: bool) -> np.ndarray:
        hi_key = tok + ("\U0010FFFF" if prefix else "")
        lo = int(np.searchsorted(self._tok, tok, "left"))
        hi = int(np.searchsorted(self._tok, hi_key, "right"))
        return np.unique(self._row[lo:hi])

    def suggest(self, text: str, analyzer, n: int = 5) -> pa.Table:
        toks = analyzer.tokens(text)
        if not toks:
            t = text.lower().strip()
            toks = [t] if t else []
        if not toks:
            rows = np.empty(0, np.int64)
        else:
            rows = self._rows_for(toks[-1], prefix=True)
            for t in toks[:-1]:
                rows = np.intersect1d(rows, self._rows_for(t, prefix=False),
                                      assume_unique=True)
        w = self.weights[rows]
        order = np.lexsort((self.surfaces[rows], -w))[:n]
        return pa.table({
            "surface": pa.array(self.surfaces[rows][order].tolist(),
                                pa.string()),
            "weight": pa.array(w[order], pa.float64()),
        })


class FuzzySuggester(AnalyzingSuggester):
    """Typo-tolerant suggester (``lucene/suggest/src/java/org/apache/
    lucene/search/suggest/analyzing/FuzzySuggester.java``): suggestions
    whose analyzed key has SOME prefix within ``max_edits`` Levenshtein
    edits of the analyzed input. Reference defaults mirrored: maxEdits=1,
    nonFuzzyPrefix=1 (first char must match exactly — this also bounds
    the scan to one sorted-array block), minFuzzyLength=3 (shorter
    inputs match exact-prefix only). Ranking is weight desc, exactly the
    reference (edit distance does not re-rank).

    The candidate check is one vectorized edit-distance DP: all block
    keys' first ``len(input)+max_edits`` chars form an (N, L) char
    matrix; the DP runs len(input) x L numpy ops over N-vectors, and a
    key qualifies when the final DP row's minimum is <= max_edits (the
    min over p of dist(input, key[:p]) — the automaton's prefix
    intersection restated).
    """

    def __init__(self, keys, surfaces, weights, *, max_edits: int = 1,
                 non_fuzzy_prefix: int = 1, min_fuzzy_length: int = 3):
        super().__init__(keys, surfaces, weights)
        self.max_edits = max_edits
        self.non_fuzzy_prefix = non_fuzzy_prefix
        self.min_fuzzy_length = min_fuzzy_length

    def _fuzzy_mask(self, prefix: str, block: np.ndarray) -> np.ndarray:
        m = len(prefix)
        L = m + self.max_edits
        codes = np.zeros((block.size, L), np.uint32)
        for i, k in enumerate(block.tolist()):
            cut = k[:L]
            codes[i, :len(cut)] = np.frombuffer(
                cut.encode("utf-32-le"), np.uint32)
        klen = np.minimum(np.char.str_len(block.astype(np.str_)), L)
        q = np.frombuffer(prefix.encode("utf-32-le"), np.uint32)
        INF = 1 << 20
        # D[p] over candidates; iterate query chars as DP rows
        prev = np.tile(np.arange(L + 1), (block.size, 1)).astype(np.int64)
        # positions beyond a key's length are invalid
        pos_valid = np.arange(L + 1)[None, :] <= klen[:, None]
        prev = np.where(pos_valid, prev, INF)
        for i in range(1, m + 1):
            cur = np.full_like(prev, INF)
            cur[:, 0] = i
            for p in range(1, L + 1):
                sub = prev[:, p - 1] + (codes[:, p - 1] != q[i - 1])
                ins = prev[:, p] + 1
                cur[:, p] = np.minimum(sub, ins)
                np.minimum(cur[:, p], cur[:, p - 1] + 1, out=cur[:, p])
            cur = np.where(pos_valid, cur, INF)
            prev = cur
        return prev.min(1) <= self.max_edits

    def suggest(self, text: str, analyzer, n: int = 5) -> pa.Table:
        toks = analyzer.tokens(text)
        prefix = " ".join(toks) if toks else text.lower().strip()
        if len(prefix) < self.min_fuzzy_length or not prefix:
            return super().suggest(text, analyzer, n)
        # the nonFuzzyPrefix block of the sorted key array
        anchor = prefix[:self.non_fuzzy_prefix]
        lo = int(np.searchsorted(self.keys, anchor, "left"))
        hi = int(np.searchsorted(self.keys, anchor + "\U0010FFFF", "right"))
        block = self.keys[lo:hi]
        if not block.size:
            return super().suggest(text, analyzer, n)
        hit = self._fuzzy_mask(prefix, block)
        idx = np.flatnonzero(hit) + lo
        w = self.weights[idx]
        order = np.lexsort((self.surfaces[idx], -w))[:n]
        return pa.table({
            "surface": pa.array(self.surfaces[idx][order].tolist(),
                                pa.string()),
            "weight": pa.array(w[order], pa.float64()),
        })


class BlendedInfixSuggester(AnalyzingInfixSuggester):
    """Position-blended infix suggester (``lucene/suggest/.../analyzing/
    BlendedInfixSuggester.java:60-120``): infix matches re-rank by
    ``weight * coefficient(position)`` where position is the BEST
    (minimum) matched token position in the analyzed key. Blender types
    mirror the reference: ``reciprocal`` -> 1/(1+pos) and ``linear`` ->
    max(0.1, 1 - 0.10*pos)."""

    def __init__(self, keys: np.ndarray, surfaces: np.ndarray,
                 weights: np.ndarray, blender: str = "reciprocal"):
        super().__init__(keys, surfaces, weights)
        if blender not in ("reciprocal", "linear"):
            raise ValueError(f"unknown blender: {blender!r}")
        self.blender = blender
        toks: list[str] = []
        rows: list[int] = []
        poss: list[int] = []
        for i, k in enumerate(self.keys.tolist()):
            seen: dict[str, int] = {}
            for p, t in enumerate(k.split()):
                if t not in seen:
                    seen[t] = p
            for t, p in seen.items():
                toks.append(t)
                rows.append(i)
                poss.append(p)
        tok_arr = np.asarray(toks, object)
        order = np.argsort(tok_arr, kind="stable")
        self._tok = tok_arr[order]
        self._row = np.asarray(rows, np.int64)[order]
        self._pos = np.asarray(poss, np.int64)[order]

    def _rows_minpos(self, tok: str, prefix: bool
                     ) -> tuple[np.ndarray, np.ndarray]:
        hi_key = tok + ("\U0010FFFF" if prefix else "")
        lo = int(np.searchsorted(self._tok, tok, "left"))
        hi = int(np.searchsorted(self._tok, hi_key, "right"))
        rows = self._row[lo:hi]
        pos = self._pos[lo:hi]
        if not rows.size:
            return rows, pos
        order = np.argsort(rows, kind="stable")
        rows, pos = rows[order], pos[order]
        urows, starts = np.unique(rows, return_index=True)
        return urows, np.minimum.reduceat(pos, starts)

    def _coef(self, pos: np.ndarray) -> np.ndarray:
        if self.blender == "reciprocal":
            return 1.0 / (1.0 + pos)
        return np.maximum(0.1, 1.0 - 0.10 * pos)

    def suggest(self, text: str, analyzer, n: int = 5) -> pa.Table:
        toks = analyzer.tokens(text)
        if not toks:
            t = text.lower().strip()
            toks = [t] if t else []
        if not toks:
            rows = np.empty(0, np.int64)
            best = np.empty(0, np.int64)
        else:
            rows, best = self._rows_minpos(toks[-1], prefix=True)
            for t in toks[:-1]:
                r2, p2 = self._rows_minpos(t, prefix=False)
                keep = np.isin(rows, r2, assume_unique=True)
                keep2 = np.isin(r2, rows, assume_unique=True)
                rows = rows[keep]
                best = np.minimum(best[keep], p2[keep2])
        blended = self.weights[rows] * self._coef(best.astype(np.float64))
        order = np.lexsort((self.surfaces[rows], -blended))[:n]
        return pa.table({
            "surface": pa.array(self.surfaces[rows][order].tolist(),
                                pa.string()),
            "weight": pa.array(blended[order], pa.float64()),
        })
