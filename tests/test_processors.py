"""Update-processor chain (stages/processors.py) — Arrow-kernel field
mutators vs plain-Python references."""

import pyarrow as pa
import pytest

from lucene_solr_ray.stages.processors import (
    ProcessorChain,
    clone_field,
    concat_fields,
    default_value,
    field_length,
    html_strip,
    regex_replace,
    trim_field,
)


def _batch():
    return pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["  Hello 123 World  ", "<b>bold</b> x2",
                          None]),
        "lang": pa.array(["en", "de", "fr"]),
    })


def test_individual_processors():
    b = default_value(_batch(), "text", "")
    b = clone_field(b, "text", "copy")
    assert b["copy"].to_pylist() == b["text"].to_pylist()
    b = regex_replace(b, "copy", "[0-9]+", "#")
    assert b["copy"][0].as_py() == "  Hello # World  "
    b = trim_field(b, "copy")
    assert b["copy"][0].as_py() == "Hello # World"
    b = html_strip(b, "text")
    assert b["text"][1].as_py() == "bold x2"
    b = field_length(b, "copy", "n")
    assert b["n"][0].as_py() == len("Hello # World")
    b = concat_fields(b, ["lang", "copy"], "tag", sep="|")
    assert b["tag"][0].as_py() == "en|Hello # World"


def test_chain_composes_and_validates():
    chain = ProcessorChain([
        ("default_value", {"field": "text", "default": ""}),
        ("regex_replace", {"field": "text", "pattern": "<[^>]*>",
                           "replacement": ""}),
        ("lower", {"field": "text"}),
        ("field_length", {"src": "text", "dst": "len"}),
    ])
    out = chain(_batch())
    assert out["text"][1].as_py() == "bold x2"
    assert out["len"].to_pylist() == [19, 7, 0]
    with pytest.raises(ValueError):
        ProcessorChain([("nope", {})])


def test_lang_id_processor():
    b = pa.table({"text": pa.array([
        "the quick brown fox jumps over the lazy dog and runs away",
        "le renard brun et rapide saute sur le chien paresseux dans la rue",
        "",
    ])})
    chain = ProcessorChain([("lang_id", {"field": "text"})])
    out = chain(b)
    assert out["language"].to_pylist() == ["en", "fr", "und"]
