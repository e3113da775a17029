"""Corpus-level line/paragraph deduplication (CCNet-style).

The standard web-corpus cleanup step (CCNet, RefinedWeb, Gopher all
apply a variant): a line/paragraph that appears in many documents is
boilerplate (nav bars, cookie banners, license headers) — remove every
occurrence of any unit repeated >= ``min_repeat`` times corpus-wide,
then reassemble documents. Reference behavior, not reference code: the
Solr-side analogue is SignatureUpdateProcessor at paragraph granularity
(``solr/core/.../processor/SignatureUpdateProcessorFactory.java``), the
published recipe is CCNet §3.1 (Wenzek et al., 2020).

Ray Data shape (two streamed passes, no corpus pin):

1. COUNT pass: per batch, split every doc into units, hash each unit
   (blake2b-64), pre-aggregate counts WITHIN the batch (the combiner),
   shuffle only (hash, partial_count) pairs, ``groupby(hash).sum``,
   keep hashes with count >= min_repeat. The result is bounded by the
   number of DISTINCT repeated units — boilerplate vocabulary, not
   corpus size. (At 10^12 docs swap the exact set for a Bloom filter
   built the same way; the pass structure is unchanged.)
2. REWRITE pass: broadcast the sorted dup-hash array (``ray.put``
   once), fresh pruned read, drop matching units per doc vectorized
   (np.searchsorted membership), reassemble text.

Units: ``"window:K"`` (fixed K-word chunks — what this corpus's
unpunctuated text needs), ``"sentence"`` ('.'-split), ``"line"``
('\\n'-split).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _split_units(text: str, unit: str) -> list[str]:
    if unit.startswith("window:"):
        k = int(unit.split(":", 1)[1])
        w = text.split()
        return [" ".join(w[i:i + k]) for i in range(0, len(w), k)]
    if unit == "sentence":
        return [s.strip() for s in text.split(".") if s.strip()]
    if unit == "line":
        return [s for s in text.split("\n") if s.strip()]
    raise ValueError(f"unknown unit {unit!r}")


def _hash64(units: list[str]) -> np.ndarray:
    """64-bit unit hashes, VIEWED as int64 (same bits): Arrow/Ray keep
    int64 native, while uint64 values above 2^63 fall off the fast path
    into pickled-object columns."""
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(u.encode(), digest_size=8).digest(),
                        "little") for u in units),
        np.uint64, count=len(units)).view(np.int64)


def repeated_unit_hashes(ds, text_col: str, *, unit: str = "window:10",
                         min_repeat: int = 2) -> np.ndarray:
    """COUNT pass -> sorted int64-viewed hashes of repeated units."""
    from ray.data.aggregate import Sum

    def partial_counts(b: pa.Table) -> pa.Table:
        all_units: list[str] = []
        for t in b[text_col].to_pylist():
            all_units.extend(_split_units(t, unit))
        if not all_units:
            return pa.table({"h": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        h = _hash64(all_units)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    import pyarrow.compute as pc

    t = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b["cnt"], min_repeat)),
            batch_format="pyarrow")
        .select_columns(["h"])
        .take_all()
    )
    return np.sort(np.asarray([r["h"] for r in t], np.int64))


def line_dedup(ds, text_col: str, id_col: str, *,
               unit: str = "window:10", min_repeat: int = 2,
               dup_hashes: np.ndarray | None = None):
    """REWRITE pass: remove every occurrence of corpus-repeated units.

    Returns a Dataset of (id_col, text_col, units_in, units_dropped);
    docs whose every unit is boilerplate come out with empty text (the
    caller filters — CCNet drops them).
    """
    import ray

    if dup_hashes is None:
        dup_hashes = repeated_unit_hashes(
            ds, text_col, unit=unit, min_repeat=min_repeat)
    dup_ref = ray.put(np.sort(np.asarray(dup_hashes, np.int64)))

    def rewrite(b: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        out_text: list[str] = []
        n_in: list[int] = []
        n_drop: list[int] = []
        for t in b[text_col].to_pylist():
            units = _split_units(t, unit)
            if not units:
                out_text.append("")
                n_in.append(0)
                n_drop.append(0)
                continue
            h = _hash64(units)
            pos = np.searchsorted(dup, h)
            hit = (pos < dup.size) & (
                dup[np.minimum(pos, max(dup.size - 1, 0))] == h) \
                if dup.size else np.zeros(len(units), bool)
            kept = [u for u, bad in zip(units, hit) if not bad]
            sep = "\n" if unit == "line" else (
                ". " if unit == "sentence" else " ")
            out_text.append(sep.join(kept))
            n_in.append(len(units))
            n_drop.append(int(hit.sum()))
        return pa.table({
            id_col: b[id_col],
            text_col: pa.array(out_text, pa.string()),
            "units_in": pa.array(n_in, pa.int64()),
            "units_dropped": pa.array(n_drop, pa.int64()),
        })

    return ds.map_batches(rewrite, batch_format="pyarrow")


def rolling_dup_hashes(ds, text_col: str, *, k: int = 10, stride: int = 1,
                       min_repeat: int = 2) -> np.ndarray:
    """COUNT pass over OVERLAPPING k-token windows at ``stride`` (the
    ExactSubstr recipe of Lee et al., 2022 "Deduplicating Training Data
    Makes Language Models Better", at window resolution instead of
    suffix arrays): sorted int64 hashes of windows seen >= min_repeat
    times corpus-wide. stride=1 is exact at k-token granularity;
    stride>1 trades recall for a 1/stride smaller shuffle."""
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    def windows(words: list[str]):
        return [" ".join(words[i:i + k])
                for i in range(0, max(len(words) - k + 1, 0), stride)]

    def partial(b: pa.Table) -> pa.Table:
        units: list[str] = []
        for t in b[text_col].to_pylist():
            units.extend(windows(t.split()))
        if not units:
            return pa.table({"h": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        uniq, cnt = np.unique(_hash64(units), return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b["cnt"], min_repeat)),
            batch_format="pyarrow")
        .select_columns(["h"]).take_all()
    )
    return np.sort(np.asarray([r["h"] for r in t], np.int64))


def rolling_dedup(ds, text_col: str, id_col: str, *, k: int = 10,
                  stride: int = 1, min_repeat: int = 2,
                  dup_hashes: np.ndarray | None = None):
    """REWRITE pass: drop every TOKEN covered by any corpus-repeated
    window (the union of matched [i, i+k) spans — how ExactSubstr cuts
    the repeated byte ranges). Returns (id, text, tokens_in,
    tokens_dropped)."""
    import ray

    if dup_hashes is None:
        dup_hashes = rolling_dup_hashes(
            ds, text_col, k=k, stride=stride, min_repeat=min_repeat)
    dup_ref = ray.put(np.sort(np.asarray(dup_hashes, np.int64)))

    def rewrite(b: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        out_text, n_in, n_drop = [], [], []
        for t in b[text_col].to_pylist():
            w = t.split()
            starts = list(range(0, max(len(w) - k + 1, 0), stride))
            if not starts:
                out_text.append(t)
                n_in.append(len(w))
                n_drop.append(0)
                continue
            units = [" ".join(w[i:i + k]) for i in starts]
            h = _hash64(units)
            pos = np.searchsorted(dup, h)
            hit = (pos < dup.size) & (
                dup[np.minimum(pos, max(dup.size - 1, 0))] == h) \
                if dup.size else np.zeros(len(units), bool)
            drop = np.zeros(len(w), bool)
            for i, bad in zip(starts, hit):
                if bad:
                    drop[i:i + k] = True
            out_text.append(" ".join(
                x for x, d_ in zip(w, drop) if not d_))
            n_in.append(len(w))
            n_drop.append(int(drop.sum()))
        return pa.table({
            id_col: b[id_col],
            text_col: pa.array(out_text, pa.string()),
            "tokens_in": pa.array(n_in, pa.int64()),
            "tokens_dropped": pa.array(n_drop, pa.int64()),
        })

    return ds.map_batches(rewrite, batch_format="pyarrow")
