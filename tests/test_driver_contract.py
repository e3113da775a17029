"""Emulates the driver's correctness gate: every queries() entry runs at
sf0.01 and must match its oracle_sql() DuckDB result on row count, schema
(column names) and values (order-insensitive)."""

import os

import pandas as pd
import pytest

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SF_DIR = os.environ.get("GRAFT_TEST_SF001", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def test_all_queries_have_callable_and_sql_columns_match(contract):
    queries, sql = contract
    assert len(queries) >= 20
    unknown_sql = set(sql) - set(queries)
    assert not unknown_sql


ORACLE_CHECKED = [
        "ft_term_df_top100", "ft_collection_stats", "ft_doc_length",
        "ft_term_search", "ft_term_search_rare", "ft_bool_or", "ft_bool_and",
        "ft_phrase_count", "ft_prefix_count", "facet_lang",
        "facet_source_top10", "stats_nchars", "range_facet_nchars",
        "group_top2_per_lang", "sort_export_top50", "join_semi", "join_agg",
        "dedup_exact", "events_window", "quality_tokens", "ann_cosine_top5",
        "ft_phrase_search", "suggest_prefix", "spellcheck",
        "facet_on_query", "group_search_top2", "events_sliding_window",
        "unique_stream", "numeric_range", "agg_pricing_summary",
        "join_orders_revenue", "stats_percentiles", "tdigest_quantiles", "group_percentiles", "expression_score", "percolate_matches",
        "json_facet_nested", "geo_bbox", "geo_heatmap", "payload_score_top10", "update_processors",
        "stream_join_rollup", "stream_complement", "fact_join_revenue",
        "pivot_facet",
        "geo_radius", "rescore_top20", "json_field_facet",
        "ann_ivf_top5", "qp_classic", "wdf_brand_subtoken",
        "ft_sorted_search", "taxonomy_facet", "expand_collapse",
        "sampled_facet_lang", "embed_neardup", "ngram_jaccard",
        "mlt_top10", "func_boost", "bpe_token_count", "date_histogram",
        "events_top_stream", "group_stats", "events_sessionize",
        "terms_regex", "span_near_search", "blockjoin_orders",
        "elevate_query", "fetch_stream", "having_stream",
        "significant_terms", "text_profile_dedup",
        "graph_gather", "graph_shortest_path",
        "suggest_fuzzy", "suggest_infix",
        "pii_redact", "decontam", "chunk_windows", "mixture_sample",
        "suggest_freetext",
        "shingle_top10", "common_grams_stats", "interval_facet",
        "gopher_quality", "lm_perplexity", "semdedup",
        "sql_group_agg", "sql_select_topk", "asof_join",
        "suggest_blended", "facet_prefix", "ann_filtered_top5",
        "sql_join_agg", "sql_count_distinct", "sql_distinct",
        "sql_left_join", "sql_tpch_q1", "sql_where_expr",
        "geo_polygon", "drill_sideways", "sql_case_when", "line_dedup",
        "join_global_ordinals", "facet_missing_indexsort",
        "rolling_dedup", "geo_sort_nearest",
        "geo_within", "geo_linestring_near", "geo_contains",
        "ja_morph_tokens", "zh_smart_tokens", "phonetic_keys",
        "icu_tokens", "pl_lemmas", "multilingual_stems",
        "highlight_offsets", "surround_near_matches",
        "simple_query_topk", "xml_dismax_topk", "perceptron_filter",
        "analytics_expressions",
        "bloom_term_probe", "term_automaton_matches",
        "diversified_top10", "autoprefix_count",
        "split_by_query_counts", "term_automaton_topk",
        "boosting_demote_top10", "dv_filtered_search",
        "assoc_facet_sum", "wordbreak_suggest",
        "spell_distance_ranked", "lmjm_score_top10",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(contract, duck, name):
    queries, sql = contract
    got = _norm(_to_df(queries[name](SF_DIR)))
    want = _norm(duck.execute(sql[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: cols {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True, obj=name)


ROWS_ONLY = ["lang_id", "simhash", "minhash_candidates",
             "media_image_stats", "ann_lsh_top5", "hll_users",
             "nb_lang_classify", "curation_funnel", "simhash_pairs",
             "ann_pq_top5",
             "cluster_docs", "dsir_select", "pack_sequences",
             "media_embed_topk"]


def test_contract_lists_are_complete(contract):
    """Every oracle-checked entry is exercised above; every rows-only
    entry is exercised below — a new registry entry that is not added
    here fails this test instead of silently skipping the gate."""
    queries, sql = contract
    assert set(ORACLE_CHECKED) == set(sql)
    assert set(ROWS_ONLY) == set(queries) - set(sql)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(contract, name):
    queries, _ = contract
    df = _to_df(queries[name](SF_DIR))
    assert len(df) >= 1


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    t = _to_df(e.entry())
    assert len(t) > 0
    assert set(t.columns) == {"query_id", "query", "rank", "doc_id", "score"}
