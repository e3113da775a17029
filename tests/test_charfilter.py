"""CharFilters (lucene/analysis/common charfilter/): transforms +
BaseCharFilter offset-correction semantics, and the analyzer wrapper
producing original-text spans."""

import numpy as np
import pytest

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.analysis.charfilter import (
    CharFilteredAnalyzer,
    char_filter,
    html_strip_char_filter,
    mapping_char_filter,
    pattern_replace_char_filter,
)


def test_mapping_longest_match_and_offsets():
    text = "a phone with ph"
    out, corr = mapping_char_filter(text, {"ph": "f", "pho": "FO"})
    assert out == "a FOne with f"
    # token "FOne" at out[2:6] -> original "phone" span [2:7]
    assert corr.correct_scalar(2) == 2
    assert corr.correct_scalar(6) == 7
    # trailing "f" at out[12:13] -> original "ph" [13:15]
    assert corr.correct_scalar(12) == 13
    assert corr.correct_scalar(13) == 15


def test_pattern_replace_offsets():
    out, corr = pattern_replace_char_filter(
        "call 555-1234 now", r"\d{3}-\d{4}", "PHONE")
    assert out == "call PHONE now"
    # "now" at out[11:14] -> original [14:17]
    assert corr.correct_scalar(11) == 14
    assert corr.correct_scalar(14) == 17
    # group expansion
    out2, _ = pattern_replace_char_filter("ab", r"(a)(b)", r"\2\1")
    assert out2 == "ba"


def test_html_strip():
    text = '<p class="x">bold &amp; <b>beautiful</b></p><!-- c -->'
    out, corr = html_strip_char_filter(text)
    assert out.split() == ["bold", "&", "beautiful"]
    i = out.index("bold")
    assert corr.correct_scalar(i) == text.index("bold")
    j = out.index("beautiful")
    assert corr.correct_scalar(j) == text.index("beautiful")
    # script/style subtrees vanish entirely; numeric entities decode
    out2, _ = html_strip_char_filter(
        "a<script>var x = '<b>'</script>b &#65; &#x42;")
    assert out2.split() == ["a", "b", "A", "B"]


def test_char_filter_factory_and_errors():
    f = char_filter("mapping", {"x": "y"})
    assert f("ax")[0] == "ay"
    with pytest.raises(ValueError):
        char_filter("nope")


def test_charfiltered_analyzer_spans_point_at_original():
    ana = CharFilteredAnalyzer(
        get_analyzer("standard"),
        [char_filter("html_strip")],
    )
    texts = ["<p>Hello <b>world</b></p>", "plain text"]
    toks, doc_idx, pos, starts, ends = ana.tokens_batch_spans(texts)
    got = {}
    for t, d, s, e in zip(toks, doc_idx, starts, ends):
        got.setdefault(int(d), []).append((t, texts[int(d)][int(s):int(e)]))
    # every token's corrected span slices to the token in the ORIGINAL
    for d, pairs in got.items():
        for tok, sliced in pairs:
            assert sliced.lower() == tok, (d, tok, sliced)
    # plain tokens() path matches the filtered text
    assert ana.tokens("<i>Cats</i> & dogs") == ["cats", "dogs"]


def test_chain_composition():
    ana = CharFilteredAnalyzer(
        get_analyzer("standard_nostop"),
        [char_filter("html_strip"),
         char_filter("mapping", {"colour": "color"})],
    )
    text = "<p>the colour red</p>"
    toks, doc_idx, pos, starts, ends = ana.tokens_batch_spans([text])
    m = dict(zip(toks, zip(starts.tolist(), ends.tolist())))
    assert "color" in m
    s, e = m["color"]
    assert text[s:e] == "colour"
