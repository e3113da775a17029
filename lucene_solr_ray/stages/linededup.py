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
   corpus size.
2. REWRITE pass: broadcast the sorted dup-hash array (``ray.put``
   once), fresh pruned read, drop matching units per doc vectorized
   (np.searchsorted membership), reassemble text.

Scale path (``method="bloom"``): at 10^12 docs the repeated-unit set
is itself huge, so the exact broadcast set is swapped for a fixed-size
:class:`Bloom` filter built the same HLL/t-digest partial+final way —
each block of the (already count-filtered) hash stream becomes ONE
``m_bits``-bit partial bitmap row, the driver OR-merges bitmap rows
streaming, and the broadcast / driver-held structure is ``m_bits/8``
bytes REGARDLESS of corpus size (false-positive rate degrades
gracefully; FPs only ever over-delete boilerplate-like units).

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


class Bloom:
    """Fixed-size Bloom filter over int64-viewed 64-bit hashes.

    Double hashing (Kirsch & Mitzenmacher 2006): the k probe positions
    come from the hash's two 32-bit halves, ``p_i = (h1 + i*h2) % m`` —
    no re-hashing needed. ``m_bits`` fixes the memory footprint
    (``m_bits/8`` bytes) independent of how many hashes are added."""

    def __init__(self, m_bits: int = 1 << 23, k: int = 4):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = np.zeros(self.m // 8, np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        u = np.asarray(h, np.int64).view(np.uint64)
        h1 = (u & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        h2 = (u >> np.uint64(32)) | np.uint64(1)  # odd -> full-cycle
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m))

    def add(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         (1 << (pos & np.uint64(7))).astype(np.uint8))

    def contains(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, bool)
        pos = self._positions(h)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=0).astype(bool)

    def merge(self, other: "Bloom") -> "Bloom":
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, k: int = 4) -> "Bloom":
        out = cls(m_bits=len(b) * 8, k=k)
        out.bits = np.frombuffer(b, np.uint8).copy()
        return out


def _count_filtered_hashes(ds, partial_counts, min_repeat: int):
    """Shared COUNT pass: combiner -> ONE groupby(h).sum shuffle ->
    streamed >= min_repeat filter. Returns the lazy hash Dataset."""
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    return (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b["cnt"], min_repeat)),
            batch_format="pyarrow")
        .select_columns(["h"])
    )


def _collect_exact(hash_ds) -> np.ndarray:
    t = hash_ds.take_all()
    return np.sort(np.asarray([r["h"] for r in t], np.int64))


def _collect_bloom(hash_ds, m_bits: int, k: int) -> Bloom:
    """Per-block partial bitmaps (the HLL partial+final shape), driver
    OR-merges streaming — holds m_bits/8 bytes + one row at a time."""
    def sketch(b: pa.Table) -> pa.Table:
        f = Bloom(m_bits=m_bits, k=k)
        f.add(b["h"].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([f.to_bytes()], pa.binary())})

    merged = Bloom(m_bits=m_bits, k=k)
    for row in hash_ds.map_batches(
            sketch, batch_format="pyarrow").iter_rows():
        merged.merge(Bloom.from_bytes(row["sketch"], k=k))
    return merged


def repeated_unit_hashes(ds, text_col: str, *, unit: str = "window:10",
                         min_repeat: int = 2, method: str = "exact",
                         m_bits: int = 1 << 23, k: int = 4):
    """COUNT pass. ``method="exact"`` -> sorted int64 hash array
    (bounded by the distinct-repeated-unit vocabulary);
    ``method="bloom"`` -> a fixed-size :class:`Bloom` (bounded by
    ``m_bits`` regardless of corpus size)."""
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

    hash_ds = _count_filtered_hashes(ds, partial_counts, min_repeat)
    if method == "bloom":
        return _collect_bloom(hash_ds, m_bits, k)
    return _collect_exact(hash_ds)


def _membership(dup, h: np.ndarray) -> np.ndarray:
    """Boolean hit mask for ``h`` against either an exact sorted hash
    array or a :class:`Bloom` (the scale path)."""
    if isinstance(dup, Bloom):
        return dup.contains(h)
    if not dup.size:
        return np.zeros(len(h), bool)
    pos = np.searchsorted(dup, h)
    return (pos < dup.size) & (
        dup[np.minimum(pos, max(dup.size - 1, 0))] == h)


def _as_broadcastable(dup_hashes):
    return dup_hashes if isinstance(dup_hashes, Bloom) \
        else np.sort(np.asarray(dup_hashes, np.int64))


def line_dedup(ds, text_col: str, id_col: str, *,
               unit: str = "window:10", min_repeat: int = 2,
               dup_hashes=None, method: str = "exact",
               m_bits: int = 1 << 23):
    """REWRITE pass: remove every occurrence of corpus-repeated units.

    Returns a Dataset of (id_col, text_col, units_in, units_dropped);
    docs whose every unit is boilerplate come out with empty text (the
    caller filters — CCNet drops them). ``dup_hashes`` may be an exact
    sorted hash array or a :class:`Bloom`; ``method="bloom"`` builds
    the latter (fixed driver/broadcast footprint at any corpus size).
    """
    import ray

    if dup_hashes is None:
        dup_hashes = repeated_unit_hashes(
            ds, text_col, unit=unit, min_repeat=min_repeat,
            method=method, m_bits=m_bits)
    dup_ref = ray.put(_as_broadcastable(dup_hashes))

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
            hit = _membership(dup, _hash64(units))
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
                       min_repeat: int = 2, method: str = "exact",
                       m_bits: int = 1 << 23):
    """COUNT pass over OVERLAPPING k-token windows at ``stride`` (the
    ExactSubstr recipe of Lee et al., 2022 "Deduplicating Training Data
    Makes Language Models Better", at window resolution instead of
    suffix arrays): hashes of windows seen >= min_repeat times
    corpus-wide, as a sorted int64 array (exact) or a fixed-size
    :class:`Bloom` (``method="bloom"``). stride=1 is exact at k-token
    granularity; stride>1 trades recall for a 1/stride smaller
    shuffle."""
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

    hash_ds = _count_filtered_hashes(ds, partial, min_repeat)
    if method == "bloom":
        return _collect_bloom(hash_ds, m_bits, 4)
    return _collect_exact(hash_ds)


def rolling_dedup(ds, text_col: str, id_col: str, *, k: int = 10,
                  stride: int = 1, min_repeat: int = 2,
                  dup_hashes=None, method: str = "exact",
                  m_bits: int = 1 << 23):
    """REWRITE pass: drop every TOKEN covered by any corpus-repeated
    window (the union of matched [i, i+k) spans — how ExactSubstr cuts
    the repeated byte ranges). Returns (id, text, tokens_in,
    tokens_dropped). ``method``/``dup_hashes`` as :func:`line_dedup`."""
    import ray

    if dup_hashes is None:
        dup_hashes = rolling_dup_hashes(
            ds, text_col, k=k, stride=stride, min_repeat=min_repeat,
            method=method, m_bits=m_bits)
    dup_ref = ray.put(_as_broadcastable(dup_hashes))

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
            hit = _membership(dup, _hash64(units))
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
