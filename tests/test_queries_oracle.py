"""Driver-contract conformance: a representative subset of queries() vs
their oracle_sql() through DuckDB at sf0.001 (the full sweep runs in the
driver at sf0.01; this keeps CI fast while locking the contract)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

FAST_SQL_QUERIES = [
    "tumbling_stats",
    "session_windows",
    "rising_edges",
    "hampel_outliers",
    "fp_extract_parity",
    "fp_tumbling_windows",
    "exact_dedup",
    "token_counts",
    "lang_id",
    "text_features",
    "minhash_lsh_clusters_dist",
    "simhash_clusters_dist",
    "ngram_jaccard_clusters",
    "contamination_check",
    "repetition_ratio",
    "clean_corpus",
    "embedding_near_pairs",
    "embedding_near_pairs_lsh",
    "semantic_dedup_check",
    "ann_topk",
    "pricing_summary",
    "segment_orders",
    "top_orders",
    "filter_revenue",
    "user_event_types",
    "derived_expr",
    "pivot_wide",
    "rule_alarms",
    "rule_alarms_duration",
    "mapped_lookup",
    "value_counts",
    "interval_join",
    "asof_join",
    "window_join",
    "snm_dedup_pairs",
    "graph_components",
    "temporal_dim_join",
    "over_range_count",
    "jsonl_ingest",
    "host_frontier_order",
    "bm25_scores",
    "grouping_sets_revenue",
    "dense_rank_balance",
    "host_boilerplate_rate",
    "dedup_keep_last",
    "session_windows_dynamic",
    "link_reciprocity",
    "ngram_novelty",
    "rows_moving_avg",
    "obs_text",
    "json_extract",
    "hampel_repair",
    "throttle_first",
    "deterministic_sample",
    "canonical_docs",
    "stratified_sample",
    "top_docs_per_lang",
    "group_quantiles",
    "customers_without_orders",
    "bloom_join_revenue",
    "approx_quantiles",
    "users_intersect",
    "users_except",
    "rollup_revenue",
    "running_revenue",
    "event_gaps",
    "union_activity",
    "approx_distinct",
    "minhash_lsh_clusters_check",
    "ann_topk_ivf_check",
    "lowess_smooth_check",
    "media_image_features_check",
    "simhash_clusters_check",
    "heavy_hitters",
    "tfidf_top_term",
    "inverted_index",
    "funnel_steps",
    "cohort_retention",
    "mode_event_type",
    "time_weighted_avg",
    "regr_value_trend",
    "shipping_priority",
    "regional_volume",
    "ntile_acctbal",
    "chunk_dedup_stats",
    "countmin_check",
    "temperature_mix",
    "gap_fill_daily",
    "group_quantiles_cont",
    "event_transitions",
    "zscore_chars",
    "label_centroid_norms",
    "weighted_sample",
    "rolling_hourly_avg",
    "event_paths",
    "user_entropy",
    "customers_with_orders",
    "daily_revenue_change",
    "pattern_redact",
    "hourly_active_users",
    "train_split_counts",
    "unigram_logprob",
    "bpe_word_counts",
    "bpe_train_merges_check",
    "bpe_token_counts_check",
    "above_segment_avg",
    "revenue_share",
    "event_cooccurrence",
    "bucketed_join_revenue",
    "pruned_date_scan",
    "ann_topk_pq_check",
    "ann_topk_ivfpq_check",
    "dsir_weights",
    "robust_length_stats",
    "supplier_pagerank_check",
    "top_bigrams",
    "rule_report",
    "model_lang_score_check",
    "media_jpeg_features_check",
    "media_png_features_check",
    "media_audio_codecs_check",
    "media_flac_check",
    "media_video_frames_check",
    "media_gif_features_check",
    "media_gif_anim_frames_check",
    "warc_ingest",
    "wet_ingest",
    "warc_cdx_lookup",
    "url_canonicalize",
    "url_blocklist_filter",
    "robots_filter",
    "exact_substring_dedup",
    "winnow_fingerprints_check",
    "html_extract_text",
    "warc_extract_general",
    "outlink_graph",
    "charset_decode",
    "crawl_curation_chain",
    "cube_revenue",
    "cumulate_windows",
    "window_topn_hosts",
    "cep_pattern_matches",
    "upsert_aggregate",
    "host_pagerank_check",
    "host_quota_cap",
    "bigram_logprob",
    "anchor_text_index",
    "pack_contexts",
    "ccnet_lang_buckets",
    "window_dedup_first",
    "pack_greedy_check",
    "gopher_rules",
    "epoch_shuffle_order",
    "host_hits_check",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


@pytest.mark.parametrize("name", FAST_SQL_QUERIES)
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as entrymod

    rdf = _to_df(entrymod.queries()[name](SF))
    odf = con.execute(entrymod.oracle_sql()[name]).df()
    cols = sorted(odf.columns)
    assert sorted(rdf.columns) == cols
    r = rdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(r) == len(o) > 0
    pd.testing.assert_frame_equal(r, o, check_dtype=False)


def test_rows_only_queries_nonempty(ray_session):
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    for name in ("minhash_lsh_clusters", "ann_topk_ivf", "ann_topk_pq",
                 "model_lang_score", "media_jpeg_features",
                 "media_png_features", "media_audio_codecs", "media_flac",
                 "media_video_frames", "media_gif_features",
                 "media_gif_anim_frames", "host_pagerank", "pack_greedy",
                 "host_hits"):
        df = _to_df(q[name](SF))
        assert len(df) > 0, name


def test_every_oracle_has_query(ray_session):
    import __ray_entry__ as entrymod

    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
