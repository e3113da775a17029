"""jusText boilerplate removal: block segmentation, two-pass
classification, end-to-end main-content extraction, Dataset stage."""

import pyarrow as pa
import pytest

from lucene_solr_ray.stages.boilerplate import (
    BAD,
    GOOD,
    boilerplate_filter,
    classify_blocks,
    extract_main_content,
    html_to_blocks,
)

ARTICLE = (
    "The quick brown fox jumps over the lazy dog and then it runs to "
    "the forest where all of the other animals are waiting for it to "
    "come back with the news of the day about this and that and more. "
) * 2  # long, stopword-rich -> GOOD


def test_html_to_blocks_link_density():
    html = ("<div><p>hello world plain</p>"
            '<p><a href="x">all link text here</a></p>'
            "<p>half <a href='y'>link</a> here</p></div>")
    blocks = html_to_blocks(html)
    assert [b["text"] for b in blocks] == [
        "hello world plain", "all link text here", "half link here"]
    assert blocks[0]["link_density"] == 0.0
    assert blocks[1]["link_density"] > 0.9
    assert 0.1 < blocks[2]["link_density"] < 0.5


def test_classify_core_rules():
    blocks = [
        {"text": "Home | About | Contact", "link_density": 0.9},  # nav
        {"text": ARTICLE, "link_density": 0.0},                   # body
        {"text": "Read more", "link_density": 0.0},               # short
        {"text": ARTICLE, "link_density": 0.0},
        {"text": "x " * 200, "link_density": 0.0},                # no stopwords
    ]
    labels = classify_blocks(blocks)
    assert labels[0] == BAD
    assert labels[1] == GOOD
    assert labels[2] == GOOD  # short between two goods survives
    assert labels[3] == GOOD
    assert labels[4] == BAD


def test_short_between_bad_dies():
    blocks = [
        {"text": "menu item", "link_density": 0.0},
        {"text": "another menu", "link_density": 0.0},
    ]
    assert classify_blocks(blocks) == [BAD, BAD]


def test_extract_main_content_end_to_end():
    html = (
        "<html><head><title>t</title><style>x{}</style></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        f"<article><p>{ARTICLE}</p><p>{ARTICLE}</p></article>"
        "<footer><a href='/p'>Privacy</a> copyright</footer>"
        "</body></html>"
    )
    main = extract_main_content(html)
    assert ARTICLE.split()[0] in main
    assert "Home" not in main and "Privacy" not in main
    assert main.count("quick brown fox") >= 2


def test_dataset_stage(ray_session):
    import ray.data as rd

    html = (f"<p><a href='/'>nav nav nav</a></p><p>{ARTICLE}</p>"
            "<p><a href='/x'>footer link</a></p>")
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2],
                                 "html": [html, "<p></p>"]}))
    out = boilerplate_filter(ds, concurrency=1).to_pandas()
    assert "quick brown fox" in out.loc[0, "main_text"]
    assert "nav" not in out.loc[0, "main_text"]
    assert out.loc[1, "main_text"] == ""
