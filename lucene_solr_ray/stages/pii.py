"""PII detection / redaction stages for training-data curation.

The reference's per-record mutator family (``solr/core/src/java/org/
apache/solr/update/processor/RegexReplaceProcessorFactory.java``) applies
a compiled regex replacement per field; at 100 TB the same shape is a
stateless vectorized ``map_batches`` stage. Patterns here are
RE2-compatible (pyarrow.compute's regex engine) so the exact same
expressions run in DuckDB oracles: no lookahead/backreferences.

Scale notes: both kernels are single-pass Arrow compute calls per
pattern (``count_substring_regex`` / ``replace_substring_regex``) —
zero-copy in, one new string column out, no Python row loop. Order of
``PII_PATTERNS`` is the application order (overlapping shapes such as
SSN vs phone stay disjoint by construction: 3-2-4 vs 3-3-4 digits).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_scan_batch(batch: pa.Table, text_col: str = "text",
                   patterns: dict[str, str] | None = None) -> pa.Table:
    """Append one ``n_{name}`` int64 count column per PII pattern
    (non-overlapping match counts, RE2 semantics)."""
    pats = patterns or PII_PATTERNS
    col = batch[text_col]
    out = batch
    for name, pat in pats.items():
        out = out.append_column(
            f"n_{name}",
            pc.count_substring_regex(col, pat).cast(pa.int64()),
        )
    return out


def pii_redact_batch(batch: pa.Table, text_col: str = "text",
                     out_col: str | None = None,
                     patterns: dict[str, str] | None = None,
                     token: str = "<{name}>") -> pa.Table:
    """Replace every PII match with a per-type token (``<email>`` ...),
    applied in ``patterns`` order. Writes ``out_col`` (defaults to
    replacing ``text_col``)."""
    pats = patterns or PII_PATTERNS
    col = batch[text_col]
    for name, pat in pats.items():
        col = pc.replace_substring_regex(
            col, pat, token.format(name=name))
    dst = out_col or text_col
    if dst in batch.column_names:
        batch = batch.set_column(
            batch.column_names.index(dst), dst, col)
    else:
        batch = batch.append_column(dst, col)
    return batch
