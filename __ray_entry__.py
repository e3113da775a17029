"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in lucene_solr_ray) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship pipeline (Lucene-faithful index build + BM25 query
  set) over /root/testdata/sf0.001.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 + the training-data stages; each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (omitted for
  non-SQL-expressible ops -> rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from lucene_solr_ray.pipelines import run_flagship

    return run_flagship("/root/testdata/sf0.001")


# The driver's correctness file covers a fixed number of leading
# queries() slots; rounds 1-3 hard-checked the registry's natural order
# (all green, CORRECTNESS_r01-r03). Round 4 rotates previously
# contract-only entries to the front — SQL planner family, suggesters,
# streaming expressions, block join, spatial shapes — so the driver's
# oracle gate hard-checks them too. Everything else stays covered by
# tests/test_driver_contract.py (same oracle, sf0.01).
_PRIORITY = [
    # SQL planner family
    "sql_group_agg", "sql_select_topk", "sql_join_agg",
    "sql_count_distinct", "sql_distinct", "sql_left_join",
    "sql_tpch_q1", "sql_where_expr", "sql_case_when",
    # suggesters + spellcheck
    "suggest_prefix", "suggest_fuzzy", "suggest_infix",
    "suggest_blended", "suggest_freetext", "spellcheck",
    # streaming expressions / windows
    "events_window", "events_sliding_window", "events_top_stream",
    "events_sessionize", "unique_stream", "having_stream",
    "fetch_stream", "group_stats", "date_histogram",
    # joins
    "blockjoin_orders", "asof_join",
    # spatial shape relations + morphological Japanese (new this round)
    "geo_within", "geo_linestring_near", "geo_contains",
    "ja_morph_tokens",
    # query/search surface
    "qp_classic", "rescore_top20", "mlt_top10", "func_boost",
    "elevate_query", "terms_regex", "span_near_search",
    "ft_sorted_search", "facet_on_query", "group_search_top2",
    "facet_prefix", "sampled_facet_lang", "interval_facet",
    "taxonomy_facet", "expand_collapse", "significant_terms",
    # analysis chains
    "wdf_brand_subtoken", "shingle_top10", "common_grams_stats",
    "bpe_token_count",
    # dedup / data curation
    "dedup_exact", "text_profile_dedup", "embed_neardup",
    "ngram_jaccard", "quality_tokens", "gopher_quality",
    "pii_redact", "decontam", "chunk_windows", "mixture_sample",
    # graph
    "graph_gather", "graph_shortest_path",
    # ANN
    "ann_cosine_top5", "ann_ivf_top5", "ann_filtered_top5",
]


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_solr_ray.pipelines import QUERIES

    out = {k: QUERIES[k] for k in _PRIORITY if k in QUERIES}
    out.update({k: v for k, v in QUERIES.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    from lucene_solr_ray.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
