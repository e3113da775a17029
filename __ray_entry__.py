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


# The driver's correctness file covers the FIRST 50 queries() slots;
# rounds 1-3 hard-checked the registry's natural order, round 4 rotated
# the SQL planner / suggester / streaming / blockjoin families to the
# front — 113 of 127 registry entries now carry a driver-recorded green
# row. Round 5 front-loads the 14 entries the driver has NEVER
# hard-checked (round 4's list was 65 long, so its tail missed the
# 50-slot cut), then backfills with the stalest once-checked entries.
# Everything else stays covered by tests/test_driver_contract.py (same
# oracle, sf0.01).
_PRIORITY = [
    # new in round 5 (never driver-checked)
    "bloom_term_probe", "term_automaton_matches", "diversified_top10",
    "autoprefix_count", "split_by_query_counts", "term_automaton_topk",
    "boosting_demote_top10", "dv_filtered_search", "assoc_facet_sum",
    "wordbreak_suggest", "spell_distance_ranked", "lmjm_score_top10",
    "phonetic_keys", "icu_tokens", "pl_lemmas", "zh_smart_tokens",
    "surround_near_matches", "simple_query_topk", "xml_dismax_topk", "perceptron_filter", "analytics_expressions",
    # never driver-checked (r1-r4): curation/LLM-pipeline stages + graph
    "media_embed_topk", "text_profile_dedup", "graph_gather",
    "graph_shortest_path", "ann_pq_top5", "pii_redact", "decontam",
    "chunk_windows", "mixture_sample", "gopher_quality",
    "lm_perplexity", "semdedup", "cluster_docs", "ann_filtered_top5",
    # checked once in round 1 only
    "lang_id", "media_image_stats", "minhash_candidates", "simhash",
    # checked once in round 2 only
    "ann_ivf_top5", "embed_neardup", "ngram_jaccard",
    "curation_funnel", "nb_lang_classify", "simhash_pairs",
    # checked once in round 3 only
    "drill_sideways", "expression_score", "facet_missing_indexsort",
    "fact_join_revenue", "geo_bbox", "geo_heatmap", "geo_polygon",
    "geo_sort_nearest", "group_percentiles", "join_global_ordinals",
    "json_facet_nested", "line_dedup", "payload_score_top10",
    "percolate_matches", "rolling_dedup", "stream_complement",
    "stream_join_rollup", "tdigest_quantiles", "update_processors",
    "dsir_select", "highlight_offsets", "multilingual_stems",
    "pack_sequences",
    # checked once in round 4 only
    "asof_join", "blockjoin_orders", "common_grams_stats",
]


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_solr_ray.pipelines import QUERIES

    out = {k: QUERIES[k] for k in _PRIORITY if k in QUERIES}
    out.update({k: v for k, v in QUERIES.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    from lucene_solr_ray.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
