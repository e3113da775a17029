"""/select facade: q + fq + sort + pagination + facet.field + hl in one
Solr-shaped request/response."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.select import solr_select


@pytest.fixture(scope="module")
def sel_idx(tmp_path_factory, ray_session):
    rng = np.random.default_rng(41)
    langs = ["en", "de", "fr"]
    rows = []
    for i in range(60):
        lang = langs[i % 3]
        words = ["common"] + rng.choice(
            ["alpha", "beta", "gamma", "delta"], 6).tolist()
        if i % 5 == 0:
            words.append("special")
        rows.append((i, lang, " ".join(words), i * 10))
    d = tmp_path_factory.mktemp("sel_src")
    pq.write_table(pa.table({
        "doc_key": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows]),
        "content": pa.array([r[2] for r in rows]),
        "price": pa.array([r[3] for r in rows], pa.int64()),
    }), str(d / "docs.parquet"))
    out = str(tmp_path_factory.mktemp("sel_idx") / "idx")
    build_index(str(d), out, text_field="content", rows_per_partition=20)
    return out


def test_select_basic_and_pagination(sel_idx):
    s = IndexSearcher(sel_idx)
    r = solr_select(s, {"q": "special", "rows": 5,
                        "fl": ["doc_key", "lang"]})
    assert r["responseHeader"]["status"] == 0
    assert r["response"]["numFound"] == 12
    assert len(r["response"]["docs"]) == 5
    assert all("score" in d and "doc_key" in d
               for d in r["response"]["docs"])
    # page 2 disjoint from page 1
    r2 = solr_select(s, {"q": "special", "rows": 5, "start": 5})
    ids1 = {d["[docid]"] for d in r["response"]["docs"]}
    ids2 = {d["[docid]"] for d in r2["response"]["docs"]}
    assert not ids1 & ids2 and r2["response"]["start"] == 5


def test_select_fq_sort_facets(sel_idx):
    s = IndexSearcher(sel_idx)
    r = solr_select(s, {"q": "special", "fq": ["lang:en"],
                        "sort": "price desc", "rows": 100,
                        "facet.field": ["lang"],
                        "fl": ["doc_key", "lang", "price"]})
    docs = r["response"]["docs"]
    assert docs and all(d["lang"] == "en" for d in docs)
    prices = [d["price"] for d in docs]
    assert prices == sorted(prices, reverse=True)
    # facet over the FILTERED match set: only en remains
    ff = dict(zip(r["facet_counts"]["facet_fields"]["lang"][::2],
                  r["facet_counts"]["facet_fields"]["lang"][1::2]))
    assert set(ff) == {"en"} and ff["en"] == len(docs)


def test_select_matchall_and_highlight(sel_idx):
    s = IndexSearcher(sel_idx)
    r = solr_select(s, {"q": "*:*", "rows": 3,
                        "facet.field": "lang"})
    assert r["response"]["numFound"] == 60
    ff = r["facet_counts"]["facet_fields"]["lang"]
    assert sum(ff[1::2]) == 60
    h = solr_select(s, {"q": "special common", "rows": 2, "hl": True,
                        "fl": ["doc_key", "content"]})
    hl = h["highlighting"]
    assert len(hl) == 2
    frag = next(iter(hl.values()))["content"][0]
    assert "<em>" in frag


def test_select_distributed_matches_local(sel_idx, ray_session):
    """Distributed /select == single-searcher /select: numFound, the
    ranked page (rank-identical merge) and facet counts all agree at
    two shard counts."""
    from lucene_solr_ray.search.select import solr_select_distributed

    s = IndexSearcher(sel_idx)
    want = solr_select(s, {"q": "special common", "rows": 5,
                           "facet.field": ["lang"],
                           "fl": ["doc_key", "lang"]})
    for shards in (2, 4):
        got = solr_select_distributed(
            sel_idx, {"q": "special common", "rows": 5,
                      "facet.field": ["lang"], "fl": ["doc_key", "lang"]},
            num_shards=shards)
        assert got["response"]["numFound"] == \
            want["response"]["numFound"]
        assert [d["[docid]"] for d in got["response"]["docs"]] == \
            [d["[docid]"] for d in want["response"]["docs"]], shards
        assert got["facet_counts"] == want["facet_counts"], shards


def test_select_spellcheck_component(sel_idx):
    """SpellCheckComponent in the /select chain: a misspelled term gets
    suggestions + a collation; well-spelled queries add nothing."""
    s = IndexSearcher(sel_idx)
    r = solr_select(s, {"q": "specail", "rows": 3, "spellcheck": True})
    sc = r["spellcheck"]
    assert "specail" in sc["suggestions"]
    assert "special" in sc["suggestions"]["specail"]
    assert sc.get("collation") == "special"
    ok = solr_select(s, {"q": "special", "rows": 3, "spellcheck": True})
    assert ok["spellcheck"]["suggestions"] == {}


def test_select_mlt_component(sel_idx):
    """MoreLikeThisComponent: each page doc gets similar docs (self
    excluded)."""
    s = IndexSearcher(sel_idx)
    r = solr_select(s, {"q": "special", "rows": 2, "mlt": True,
                        "mlt.count": 2,
                        "fl": ["doc_key", "content"]})
    ml = r["moreLikeThis"]
    assert len(ml) == 2
    for did, sims in ml.items():
        assert 1 <= len(sims) <= 2
        assert int(did) not in sims


def test_select_debug_component(sel_idx):
    """DebugComponent: structured Explanation per page doc; the
    explanation's value equals the doc's score."""
    s = IndexSearcher(sel_idx)
    r = solr_select(s, {"q": "special common", "rows": 2,
                        "debug": True, "fl": ["doc_key"]})
    ex = r["debug"]["explain"]
    assert len(ex) == 2
    for row in r["response"]["docs"]:
        e = ex[str(row["[docid]"])]
        assert e["match"] is True
        assert abs(e["value"] - row["score"]) < 1e-4


def test_select_stats_component(sel_idx):
    """StatsComponent: numeric stats over the MATCH set (not the page)."""
    import numpy as np

    s = IndexSearcher(sel_idx)
    r = solr_select(s, {"q": "special", "rows": 2, "stats": True,
                        "stats.field": ["price"], "fl": ["doc_key"]})
    st = r["stats"]["stats_fields"]["price"]
    assert st["count"] == r["response"]["numFound"] == 12
    # ground truth: docs 0,5,10,... have special; price = i*10
    prices = np.asarray([i * 10 for i in range(0, 60, 5)], float)
    assert st["min"] == prices.min() and st["max"] == prices.max()
    assert abs(st["mean"] - prices.mean()) < 1e-9
    assert abs(st["sum"] - prices.sum()) < 1e-9


def test_select_string_field_sort_desc(sel_idx):
    """sort='<string field> desc' must work (regression: unary minus on
    a string array)."""
    s = IndexSearcher(sel_idx)
    r = solr_select(s, {"q": "special", "rows": 12,
                        "sort": "lang desc", "fl": ["doc_key", "lang"]})
    langs = [d["lang"] for d in r["response"]["docs"]]
    assert langs == sorted(langs, reverse=True)
    r2 = solr_select(s, {"q": "special", "rows": 12,
                         "sort": "lang asc", "fl": ["doc_key", "lang"]})
    langs2 = [d["lang"] for d in r2["response"]["docs"]]
    assert langs2 == sorted(langs2)


def test_select_hl_mlt_with_projected_fl(sel_idx):
    """hl/mlt work even when fl omits the text field (fetched as a
    companion, stripped from the page)."""
    s = IndexSearcher(sel_idx)
    r = solr_select(s, {"q": "special common", "rows": 2, "hl": True,
                        "mlt": True, "fl": ["doc_key"]})
    frag = next(iter(r["highlighting"].values()))["content"][0]
    assert "<em>" in frag
    assert r["moreLikeThis"] and all(
        sims for sims in r["moreLikeThis"].values())
    # the page rows only carry the requested fields
    for row in r["response"]["docs"]:
        assert "content" not in row
        assert "doc_key" in row


def test_select_grouping_component(sel_idx):
    """GroupingComponent: top groups by best-doc rank, group.limit docs
    each, per-group numFound."""
    s = IndexSearcher(sel_idx)
    r = solr_select(s, {"q": "special", "rows": 3, "group": True,
                        "group.field": "lang", "group.limit": 2,
                        "fl": ["doc_key"]})
    g = r["grouped"]["lang"]
    assert g["matches"] == 12
    assert 1 <= len(g["groups"]) <= 3
    total = 0
    for grp in g["groups"]:
        assert 1 <= len(grp["doclist"]["docs"]) <= 2
        total += grp["doclist"]["numFound"]
    assert total == 12  # 3 langs x 4 special docs each


def test_select_composite_matchall_q(sel_idx):
    """q='*:* AND <term>' behaves like q='<term>' (the match-all clause
    is honored inside the boolean tree, not substring-stripped)."""
    s = IndexSearcher(sel_idx)
    plain = solr_select(s, {"q": "special", "rows": 60})
    comp = solr_select(s, {"q": "*:* AND special", "rows": 60})
    assert comp["response"]["numFound"] == plain["response"]["numFound"]
    assert {d["doc_id"] for d in comp["response"]["docs"]} == \
        {d["doc_id"] for d in plain["response"]["docs"]}
