"""Deterministic weighted mixture sampling: per-domain keep rates.

Training-data mixtures ("sample web at 30%, wiki at 100%, ...") need a
sampler that is (a) deterministic — re-runs and resumed runs keep the
same rows, (b) driver-free — the decision is a pure function of the row,
so a 100 TB corpus streams through one stateless ``map_batches`` with no
shuffle and no RNG-state coordination across workers.

The decision hashes a salted row key (md5, first 4 hex chars = 16 bits)
and keeps the row when that value falls below ``rate * 65536``. DuckDB's
``md5()`` reproduces the exact decision for oracles. Rates quantize to
1/65536 steps, plenty for mixture weights.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _keep_mask(keys: list, rates_per_row: np.ndarray,
               salt: str) -> np.ndarray:
    thresholds = np.floor(rates_per_row * 65536.0).astype(np.int64)
    vals = np.fromiter(
        (int(hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:4], 16)
         for k in keys),
        np.int64, count=len(keys))
    return vals < thresholds


def mixture_sample_batch(batch: pa.Table, rates: dict[str, float],
                         source_col: str = "source",
                         key_col: str = "doc_id", salt: str = "mix",
                         default_rate: float = 0.0) -> pa.Table:
    """Filter a batch to the sampled mixture (vector threshold lookup +
    md5 per row; md5 is a C primitive, the loop is the hash cost)."""
    srcs = batch[source_col].to_pylist()
    r = np.array([rates.get(s, default_rate) for s in srcs], np.float64)
    mask = _keep_mask(batch[key_col].to_pylist(), r, salt)
    return batch.filter(pa.array(mask))


def mixture_sample(ds, rates: dict[str, float], source_col: str = "source",
                   key_col: str = "doc_id", salt: str = "mix",
                   default_rate: float = 0.0):
    return ds.map_batches(
        lambda b: mixture_sample_batch(b, rates, source_col, key_col,
                                       salt, default_rate),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al., 2023: "Data Selection
# for Language Models via Importance Resampling"): score documents by a
# log-ratio of target-vs-raw hashed-ngram models, keep the top-scoring
# (or Gumbel-perturbed) fraction. Everything is a pure per-batch
# function over broadcast model arrays — no shuffle, no driver loops.
# ---------------------------------------------------------------------------

def hashed_ngram_counts(texts: list[str], *, n: int = 2,
                        num_buckets: int = 4096) -> np.ndarray:
    """Bag of hashed word n-grams (unigrams + bigrams like the paper's
    hashed n-gram features), summed over all texts -> bucket counts."""
    counts = np.zeros(num_buckets, np.int64)
    for t in texts:
        w = t.split()
        grams = w + [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        if not grams:
            continue
        idx = np.fromiter(
            (int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
             % num_buckets for g in grams),
            np.int64, count=len(grams))
        np.add.at(counts, idx, 1)
    return counts


def dsir_log_ratio(target_counts: np.ndarray,
                   raw_counts: np.ndarray) -> np.ndarray:
    """Smoothed per-bucket log(p_target / p_raw) importance weights."""
    pt = (target_counts + 1.0) / (target_counts.sum() + len(target_counts))
    pr = (raw_counts + 1.0) / (raw_counts.sum() + len(raw_counts))
    return np.log(pt) - np.log(pr)


def dsir_score_batch(batch: pa.Table, text_col: str,
                     log_ratio: np.ndarray, *, n: int = 2) -> pa.Table:
    """Per-doc importance score: mean log-ratio over the doc's hashed
    n-grams (length-normalized, as the paper's unigram model is)."""
    num_buckets = len(log_ratio)
    scores = np.zeros(batch.num_rows, np.float64)
    for i, t in enumerate(batch[text_col].to_pylist()):
        w = t.split()
        grams = w + [" ".join(w[j:j + n]) for j in range(len(w) - n + 1)]
        if not grams:
            continue
        idx = np.fromiter(
            (int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
             % num_buckets for g in grams),
            np.int64, count=len(grams))
        scores[i] = float(log_ratio[idx].mean())
    return batch.append_column("dsir_score", pa.array(scores))


def dsir_select(ds, text_col: str, target_texts: list[str], *,
                keep_frac: float = 0.25, n: int = 2,
                num_buckets: int = 4096):
    """Full DSIR-lite pipeline: fit the raw model with one streamed
    count pass (per-batch partials summed driver-side — the model is a
    fixed ``num_buckets`` array, not corpus-sized), fit the target model
    from the given exemplar texts, broadcast the log-ratio, score every
    doc, and keep docs above the score quantile implied by
    ``keep_frac`` (quantile estimated from a bounded sample of scores).
    Returns (selected Dataset with dsir_score column, threshold)."""
    import ray

    target = hashed_ngram_counts(target_texts, n=n,
                                 num_buckets=num_buckets)

    def batch_counts(b: pa.Table) -> pa.Table:
        c = hashed_ngram_counts(b[text_col].to_pylist(), n=n,
                                num_buckets=num_buckets)
        return pa.table({"bucket": pa.array(np.arange(num_buckets)),
                         "cnt": pa.array(c)})

    from ray.data.aggregate import Sum

    raw_rows = (
        ds.map_batches(batch_counts, batch_format="pyarrow")
        .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    raw = np.zeros(num_buckets, np.int64)
    for r in raw_rows:
        raw[int(r["bucket"])] = int(r["cnt"])
    lr_ref = ray.put(dsir_log_ratio(target, raw))

    def score(b: pa.Table) -> pa.Table:
        return dsir_score_batch(b, text_col, ray.get(lr_ref), n=n)

    scored = ds.map_batches(score, batch_format="pyarrow")
    # threshold from a bounded score sample (driver holds <= 100k floats)
    sample = scored.select_columns(["dsir_score"]) \
        .limit(100_000).take_all()
    vals = np.asarray([r["dsir_score"] for r in sample])
    thr = float(np.quantile(vals, 1.0 - keep_frac))

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(
            b["dsir_score"].to_numpy() >= thr))

    return scored.map_batches(keep, batch_format="pyarrow"), thr
