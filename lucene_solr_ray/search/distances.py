"""StringDistance family (``lucene/suggest/.../spell/``): the
similarity metrics DirectSpellChecker / distributed-spellcheck merging
rank suggestions by.  All return 1.0 for identical strings, toward 0
for dissimilar (the StringDistance contract).

- :func:`levenshtein_distance` — ``LevensteinDistance.java``: plain
  edit distance normalized by the longer length.
- :func:`lucene_levenshtein_distance` —
  ``LuceneLevenshteinDistance.java``: codepoint-level OSA (adjacent
  transposition allowed), normalized by the SHORTER length — the
  merge-compatible mimic of Lucene's internal edit distance.
- :func:`jaro_winkler_distance` — ``JaroWinklerDistance.java``: Jaro
  similarity with the Winkler common-prefix bonus above threshold 0.7.
- :func:`ngram_distance` — ``NGramDistance.java``: n-gram-positional
  edit distance with prefix padding and partial-match costs.

``spellcheck_ranked`` re-ranks the df-ordered DirectSpellChecker
candidates by any of these (distance desc, df desc, term asc) — the
SuggestWordScoreComparator ordering.
"""

from __future__ import annotations

import numpy as np


def levenshtein_distance(s1: str, s2: str) -> float:
    n, m = len(s1), len(s2)
    if n == 0 or m == 0:
        return 1.0 if n == m else 0.0
    prev = np.arange(m + 1, dtype=np.int64)
    t = np.frombuffer(s2.encode("utf-32-le"), np.uint32)
    for i, c in enumerate(s1, 1):
        cur = np.empty(m + 1, np.int64)
        cur[0] = i
        cost = (t != ord(c)).astype(np.int64)
        for j in range(1, m + 1):
            cur[j] = min(cur[j - 1] + 1, prev[j] + 1,
                         prev[j - 1] + cost[j - 1])
        prev = cur
    return 1.0 - prev[m] / max(n, m)


def lucene_levenshtein_distance(target: str, other: str) -> float:
    """OSA with transpositions, normalized by min length (the quirk the
    reference keeps for DirectSpellChecker merge compatibility)."""
    a = [ord(c) for c in target]
    b = [ord(c) for c in other]
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0.0 if n == m else float(max(n, m))
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for j in range(1, m + 1):
        tj = b[j - 1]
        for i in range(1, n + 1):
            cost = 0 if a[i - 1] == tj else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] \
                    and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return 1.0 - d[n][m] / min(n, m)


def jaro_winkler_distance(s1: str, s2: str,
                          threshold: float = 0.7) -> float:
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    transpositions = sum(1 for x, y in zip(ms1, ms2) if x != y) // 2
    prefix = 0
    for x, y in zip(s1, s2):
        if x != y:
            break
        prefix += 1
    m = float(matches)
    j = (m / len(s1) + m / len(s2) + (m - transpositions) / m) / 3
    if j < threshold:
        return j
    return j + min(0.1, 1.0 / len(mx)) * prefix * (1 - j)


def ngram_distance(source: str, target: str, n: int = 2) -> float:
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(1 for i in range(min(sl, tl))
                   if source[i] == target[i])
        return cost / max(sl, tl)
    sa = "\0" * (n - 1) + source
    p = list(range(sl + 1))
    for j in range(1, tl + 1):
        if j < n:
            t_j = "\0" * (n - j) + target[:j]
        else:
            t_j = target[j - n:j]
        d = [float(j)] + [0.0] * sl
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\0":
                    tn -= 1  # discount matches on the padded prefix
            d[i] = min(d[i - 1] + 1, p[i] + 1, p[i - 1] + cost / tn)
        p = d
    return 1.0 - p[sl] / max(tl, sl)


DISTANCES = {
    "levenshtein": levenshtein_distance,
    "lucene_levenshtein": lucene_levenshtein_distance,
    "jaro_winkler": jaro_winkler_distance,
    "ngram": ngram_distance,
}


def spellcheck_ranked(searcher, word: str, *, max_edits: int = 2,
                      n: int = 10, distance: str = "jaro_winkler"):
    """DirectSpellChecker candidates re-ranked by a StringDistance —
    the SuggestWordScoreComparator ordering (score desc, then df desc,
    then term asc)."""
    import pyarrow as pa

    from .searcher import fuzzy_candidates

    dist = DISTANCES[distance]
    cands, _ = fuzzy_candidates(searcher.reader, word, max_edits)
    dfs = np.array([searcher.doc_freq(t) for t in cands], np.int64)
    scores = np.array([dist(word, t) for t in cands], np.float64)
    order = np.lexsort((np.asarray(cands, object), -dfs, -scores))[:n]
    return pa.table({
        "term": pa.array([cands[i] for i in order], pa.string()),
        "score": pa.array(scores[order], pa.float64()),
        "df": pa.array(dfs[order], pa.int64()),
    })
