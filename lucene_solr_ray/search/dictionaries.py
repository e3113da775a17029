"""Suggester dictionaries (``lucene/suggest/.../spell/``): the input
sources that feed suggester builds.

- :func:`lucene_dictionary` — ``LuceneDictionary.java``: every unique
  term of a field with its document frequency as the weight.
- :func:`high_frequency_dictionary` — ``HighFrequencyDictionary.java``:
  only terms whose df/maxDoc ratio meets the threshold — the classic
  "build the spellcheck dictionary from words frequent enough to be
  real" source.
- :func:`plain_text_dictionary` — ``PlainTextDictionary.java``: one
  entry per line (file path, file object, or iterable), weight 1.

Each returns ``(keys, surfaces, weights)`` numpy arrays, the exact
constructor shape of every suggester in ``suggester.py`` — so any
dictionary feeds any suggester, the reference's Dictionary/
InputIterator decoupling.
"""

from __future__ import annotations

import numpy as np


def lucene_dictionary(reader):
    terms = reader.unique_terms()
    dfs = np.array([reader.doc_freqs([t])[t] for t in terms.tolist()],
                   np.int64)
    return terms, terms.copy(), dfs


def high_frequency_dictionary(reader, max_doc: int,
                              min_freq_ratio: float = 0.0):
    terms, surfaces, dfs = lucene_dictionary(reader)
    keep = dfs >= min_freq_ratio * max_doc
    return terms[keep], surfaces[keep], dfs[keep]


def plain_text_dictionary(source):
    if isinstance(source, str):
        with open(source, encoding="utf-8") as f:
            words = [ln.strip() for ln in f if ln.strip()]
    else:
        words = [str(w).strip() for w in source if str(w).strip()]
    arr = np.asarray(words, object)
    return arr, arr.copy(), np.ones(arr.size, np.int64)
