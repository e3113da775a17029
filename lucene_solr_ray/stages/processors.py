"""Update-processor chain: Solr's per-record field mutators as
vectorized Arrow batch transforms.

Solr runs every incoming document through an
``UpdateRequestProcessorChain`` (``solr/core/src/java/org/apache/solr/
update/processor/`` — CloneFieldUpdateProcessorFactory,
RegexReplaceProcessorFactory, TrimFieldUpdateProcessorFactory,
FieldLengthUpdateProcessorFactory, ConcatFieldUpdateProcessorFactory,
HTMLStripFieldUpdateProcessorFactory, DefaultValueUpdateProcessorFactory,
TimestampUpdateProcessorFactory, UUIDUpdateProcessorFactory...). Here
each processor is a pyarrow.compute kernel over the batch — no Python
per-row loop anywhere — and a chain is one ``map_batches`` callable, so
ingestion mutates records at Arrow speed while streaming.

Every processor takes and returns a ``pa.Table``; :class:`ProcessorChain`
composes them and is directly usable as
``ds.map_batches(chain, batch_format="pyarrow")``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def clone_field(batch: pa.Table, src: str, dst: str) -> pa.Table:
    """CloneFieldUpdateProcessorFactory: copy src -> dst."""
    return batch.append_column(dst, batch[src])


def regex_replace(batch: pa.Table, field: str, pattern: str,
                  replacement: str) -> pa.Table:
    """RegexReplaceProcessorFactory (replace ALL matches)."""
    out = pc.replace_substring_regex(batch[field], pattern=pattern,
                                     replacement=replacement)
    return batch.set_column(batch.column_names.index(field), field, out)


def trim_field(batch: pa.Table, field: str) -> pa.Table:
    """TrimFieldUpdateProcessorFactory."""
    out = pc.utf8_trim_whitespace(batch[field])
    return batch.set_column(batch.column_names.index(field), field, out)


def lower_field(batch: pa.Table, field: str) -> pa.Table:
    """A FieldMutatingUpdateProcessor lowercase mutator."""
    out = pc.utf8_lower(batch[field])
    return batch.set_column(batch.column_names.index(field), field, out)


def field_length(batch: pa.Table, src: str, dst: str) -> pa.Table:
    """FieldLengthUpdateProcessorFactory: dst = len(src) (chars)."""
    return batch.append_column(
        dst, pc.cast(pc.utf8_length(batch[src]), pa.int64()))


def concat_fields(batch: pa.Table, fields: list[str], dst: str,
                  sep: str = " ") -> pa.Table:
    """ConcatFieldUpdateProcessorFactory / copyField-into-one:
    dst = join(fields, sep)."""
    out = pc.binary_join_element_wise(
        *[batch[f] for f in fields], sep)
    return batch.append_column(dst, out)


def html_strip(batch: pa.Table, field: str) -> pa.Table:
    """HTMLStripFieldUpdateProcessorFactory: drop tags (regex strip —
    the charfilter's tag-removal core)."""
    out = pc.replace_substring_regex(batch[field], pattern="<[^>]*>",
                                     replacement="")
    return batch.set_column(batch.column_names.index(field), field, out)


def default_value(batch: pa.Table, field: str, default) -> pa.Table:
    """DefaultValueUpdateProcessorFactory: fill nulls with a constant."""
    out = pc.fill_null(batch[field], default)
    return batch.set_column(batch.column_names.index(field), field, out)


def lang_id(batch: pa.Table, field: str = "text",
            lang_field: str = "language") -> pa.Table:
    """LanguageIdentifierUpdateProcessor (``solr/contrib/langid``): detect
    the document language from ``field`` and write it to ``lang_field``
    (the langField/langsField contract; the detector is the engine's
    stop-word-profile heuristic from ``stages.textstats``)."""
    from .textstats import lang_id_batch

    out = lang_id_batch(batch, text_col=field)
    pred = out["lang_pred"]
    return batch.append_column(lang_field, pred)


_REGISTRY = {
    "clone": clone_field,
    "regex_replace": regex_replace,
    "trim": trim_field,
    "lower": lower_field,
    "field_length": field_length,
    "concat": concat_fields,
    "html_strip": html_strip,
    "default_value": default_value,
    "lang_id": lang_id,
}


class ProcessorChain:
    """``UpdateRequestProcessorChain``: an ordered list of
    (processor_name, kwargs) steps applied per batch. Declarative (plain
    data), so a chain ships to workers by value and reads like the
    solrconfig.xml chain it restates."""

    def __init__(self, steps: list[tuple[str, dict]]):
        for name, _ in steps:
            if name not in _REGISTRY:
                raise ValueError(f"unknown processor {name!r}; have "
                                 f"{sorted(_REGISTRY)}")
        self.steps = steps

    def __call__(self, batch: pa.Table) -> pa.Table:
        for name, kw in self.steps:
            batch = _REGISTRY[name](batch, **kw)
        return batch
