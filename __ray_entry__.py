"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing in
here (or in the tokenzip library) calls ray.init()/ray.shutdown().

The engine's input table is the north-rule shape
(doc_id:string, tokens:list<int32>, n_tok:int32, source:string); it is
synthesized deterministically per scale factor (seed=42, FIXTURES.md F1) to
/tmp/tokenzip_corpus/<sf>/tokens/*.parquet, so the DuckDB oracle SQL reads
the exact same parquet the Ray pipelines read.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_ORACLE_SF = "sf0.01"  # the driver's correctness scale


def _corpus_glob(sf_name: str) -> str:
    from tokenzip.corpus import ensure_corpus

    return ensure_corpus(sf_name) + "/*.parquet"


def entry() -> Any:
    """Flagship pipeline at sf0.001: compress the token corpus into chunk
    parquet + lineage manifest; return the chunk-metadata Dataset."""
    from tokenzip.corpus import corpus_paths
    from tokenzip.pipeline import chunk_meta_dataset, compress

    out_dir = "/tmp/tokenzip_out/sf0.001"
    compress(corpus_paths("sf0.001"), out_dir)
    return chunk_meta_dataset(out_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from tokenzip import queries as q

    _corpus_glob(_ORACLE_SF)  # materialize before the driver runs oracle SQL

    from tokenzip import analysis as a

    return {
        "roundtrip_by_source": q.q_roundtrip_by_source,
        "filtered_decompress": _filtered_decompress,
        "doc_range_decompress": q.q_doc_range_decompress,
        "clustered_range_decompress": q.q_clustered_range_decompress,
        "doc_point_decompress": q.q_doc_point_decompress,
        "compacted_roundtrip": _compacted_roundtrip,
        "sink_roundtrip_join": q.q_sink_roundtrip_join,
        "boundary_roundtrip": q.q_boundary_roundtrip,
        "token_stats_by_source": q.q_token_stats_by_source,
        "compression_by_codec": q.q_compression_by_codec,
        "compression_totals": q.q_compression_totals,
        "dedup_exact": a.q_dedup_exact,
        "embedding_topk": a.q_embedding_topk,
        "text_quality_by_lang": a.q_text_quality_by_lang,
        "token_counts_by_lang": a.q_token_counts_by_lang,
        "intcol_roundtrip_lineitem": q.q_intcol_roundtrip_lineitem,
        "events_ts_roundtrip": q.q_events_ts_roundtrip,
        "dedup_minhash": a.q_dedup_minhash,
        "dedup_simhash": a.q_dedup_simhash,
        "fingerprint_by_source": a.q_fingerprint_by_source,
        "lang_id_confusion": a.q_lang_id_confusion,
        "media_features_by_source": _media_features,
        "media_real_stats": _media_real_stats,
        "embedding_topk_ivf": a.q_embedding_topk_ivf,
        "dedup_embedding": a.q_dedup_embedding,
        "dedup_embedding_ivf": a.q_dedup_embedding_ivf,
        "dedup_jaccard": a.q_dedup_jaccard,
        "events_window_agg": _events_window_agg,
        "events_asof_orders": _events_asof_orders,
        "events_range_orders": _events_range_orders,
        "events_sessions": _events_sessions,
        "top_orders_by_nation": _top_orders_by_nation,
        "orders_without_lineitems": _orders_without_lineitems,
        "orders_by_nation": _orders_by_nation,
        "pricing_summary": _pricing_summary,
        "jsonl_ingest_stats": _jsonl_ingest,
        "pack_stats_by_source": _pack_stats,
        "pack_emit_by_source": _pack_emit,
        "vocab_topk": _vocab_topk,
        "vocab_topk_mg": _vocab_topk_mg,
        "bigram_topk_mg": _bigram_topk_mg,
        "df_topk_mg": _df_topk_mg,
        "split_stats_by_source": _split_stats,
        "table_roundtrip_events": _table_roundtrip,
        "table_where_events": _table_where,
        "table_where_strings": _table_where_str,
        "table_nulls_roundtrip": _table_nulls,
        "table_agg_pushdown": _table_agg_pushdown,
        "table_roundtrip_embeddings": _table_emb_roundtrip,
        "mixture_sample_stats": _mixture_stats,
        "decontamination_by_source": _decontam,
        "distinct_tokens_by_source": _distinct_tokens,
        "sample_bottomk_by_source": _sample_bottomk,
        "seqlen_quantiles_by_source": _seqlen_quantiles,
        "lineitem_semijoin_bloom": _semijoin_bloom,
        "events_tumbling_agg": _events_tumbling,
        "price_quantiles_sampled": _price_quantiles,
        "repetition_by_source": _repetition,
        "order_revenue_by_priority": _order_revenue,
        "fk_integrity": _fk_integrity,
        "tfidf_topk": _tfidf_topk,
        "cross_source_dups": _cross_source_dups,
        "revenue_rollup": _revenue_rollup,
        "top_token_by_source": _top_token_by_source,
        "token_freq_histogram": _token_freq_histogram,
        "csv_ingest_stats": _csv_ingest,
        "sink_stats_pushdown": _sink_stats,
        "order_price_deciles": _price_deciles,
        "user_gap_stats": _user_gaps,
        "top_customer_by_nation": _top_customer,
        "events_hourly_pivot": _hourly_pivot,
        "nation_revenue_share": _revenue_share,
        "funnel_view_purchase": _funnel,
        "lineitem_qty_salted": _qty_salted,
        "sink_projection_stats": _sink_projection,
        "dup_clusters": _dup_clusters,
        "dedup_keep_stats": _keep_stats,
        "retention_cohorts": _retention,
        "shipping_priority": _shipping_priority,
        "embedding_kmeans_sizes": _kmeans_sizes,
        "user_peak_window": _user_peak_window,
        "small_qty_revenue": _small_qty_revenue,
        "lineitem_cube": _lineitem_cube,
        "customer_order_dist": _customer_order_dist,
        "large_orders": _large_orders,
        "order_priority_exists": _order_priority_exists,
        "returned_top_customers": _returned_top_customers,
        "cumulative_revenue": _cumulative_revenue,
        "idle_high_balance": _idle_high_balance,
        "local_supplier_volume": _local_supplier_volume,
        "vocab_overlap": _vocab_overlap,
        "token_run_stats": _token_run_stats,
        "supplier_variety": _supplier_variety,
        "marker_counts_by_lang": _marker_counts,
        "single_month_orders": _single_month_orders,
        "events_dedup_lag": _events_dedup_lag,
        "qty_price_suffstats": _qty_price_suffstats,
        "props_field_stats": _props_field_stats,
        "recode_stats": _recode_stats,
        "fused_decode_stats": _fused_decode_stats,
        "events_asof_orders_salted": _events_asof_orders_salted,
        "order_revenue_by_priority_salted": _order_revenue_salted,
        "events_range_orders_salted": _events_range_orders_salted,
        "vocab_unique_by_source": _vocab_unique,
        "multi_format_union_stats": _multi_format_union,
        "incompressible_topk": _incompressible_topk,
        "shuffled_compress_stats": _shuffled_compress,
        "corpus_diff_stats": _corpus_diff,
        "funnel_three_step": _funnel3,
        "rolling_active_users": _rolling_wau,
        "event_type_affinity": _type_affinity,
        "vocab_jaccard": _vocab_jaccard,
        "longest_docs": _longest_docs,
        "shuffle_head_stats": _shuffle_head,
        "sink_delete_roundtrip": _sink_delete,
        "sink_upsert_roundtrip": _sink_upsert,
        "sink_fsck_stats": _sink_fsck,
        "dup_block_census": _dup_block_census,
        "length_outliers_by_source": _length_outliers,
        "vocab_tv_distance": _vocab_tv,
        "seqlen_mad_by_source": _seqlen_mad,
        "curation_funnel": _curation_funnel,
        "append_roundtrip": _append_roundtrip,
        "table_delete_roundtrip": _table_delete,
        "table_drop_column_roundtrip": _table_drop_col,
        "table_add_column_roundtrip": _table_add_col,
        "ratio_by_length_bucket": _ratio_by_bucket,
        "forecast_revenue": _forecast_revenue,
        "promo_revenue": _promo_revenue,
        "top_supplier": _top_supplier,
        "brand_qty_revenue": _brand_qty_revenue,
        "volume_shipping": _volume_shipping,
        "market_share": _market_share,
        "nation_profit": _nation_profit,
    }


def _forecast_revenue(sf_dir: str):
    from tokenzip.relational import q_forecast_revenue

    return q_forecast_revenue(sf_dir)


def _promo_revenue(sf_dir: str):
    from tokenzip.relational import q_promo_revenue

    return q_promo_revenue(sf_dir)


def _top_supplier(sf_dir: str):
    from tokenzip.relational import q_top_supplier

    return q_top_supplier(sf_dir)


def _brand_qty_revenue(sf_dir: str):
    from tokenzip.relational import q_brand_qty_revenue

    return q_brand_qty_revenue(sf_dir)


def _volume_shipping(sf_dir: str):
    from tokenzip.relational import q_volume_shipping

    return q_volume_shipping(sf_dir)


def _market_share(sf_dir: str):
    from tokenzip.relational import q_market_share

    return q_market_share(sf_dir)


def _nation_profit(sf_dir: str):
    from tokenzip.relational import q_nation_profit

    return q_nation_profit(sf_dir)


def _ratio_by_bucket(sf_dir: str):
    from tokenzip.queries import q_ratio_by_length_bucket

    return q_ratio_by_length_bucket(sf_dir)


def _table_drop_col(sf_dir: str):
    from tokenzip.table import q_table_drop_column_roundtrip

    return q_table_drop_column_roundtrip(sf_dir)


def _table_add_col(sf_dir: str):
    from tokenzip.table import q_table_add_column_roundtrip

    return q_table_add_column_roundtrip(sf_dir)


def _table_delete(sf_dir: str):
    from tokenzip.table import q_table_delete_roundtrip

    return q_table_delete_roundtrip(sf_dir)


def _append_roundtrip(sf_dir: str):
    from tokenzip.queries import q_append_roundtrip

    return q_append_roundtrip(sf_dir)


def _curation_funnel(sf_dir: str):
    from tokenzip.analysis import q_curation_funnel

    return q_curation_funnel(sf_dir)


def _seqlen_mad(sf_dir: str):
    from tokenzip.training import q_seqlen_mad_by_source

    return q_seqlen_mad_by_source(sf_dir)


def _vocab_tv(sf_dir: str):
    from tokenzip.training import q_vocab_tv_distance

    return q_vocab_tv_distance(sf_dir)


def _length_outliers(sf_dir: str):
    from tokenzip.training import q_length_outliers_by_source

    return q_length_outliers_by_source(sf_dir)


def _dup_block_census(sf_dir: str):
    from tokenzip.training import q_dup_block_census

    return q_dup_block_census(sf_dir)


def _sink_delete(sf_dir: str):
    from tokenzip.queries import q_sink_delete_roundtrip

    return q_sink_delete_roundtrip(sf_dir)


def _sink_upsert(sf_dir: str):
    from tokenzip.queries import q_sink_upsert_roundtrip

    return q_sink_upsert_roundtrip(sf_dir)


def _sink_fsck(sf_dir: str):
    from tokenzip.queries import q_sink_fsck_stats

    return q_sink_fsck_stats(sf_dir)


def _longest_docs(sf_dir: str):
    from tokenzip.training import q_longest_docs

    return q_longest_docs(sf_dir)


def _shuffle_head(sf_dir: str):
    from tokenzip.training import q_shuffle_head_stats

    return q_shuffle_head_stats(sf_dir)


def _vocab_jaccard(sf_dir: str):
    from tokenzip.training import q_vocab_jaccard

    return q_vocab_jaccard(sf_dir)


def _type_affinity(sf_dir: str):
    from tokenzip.relational import q_event_type_affinity

    return q_event_type_affinity(sf_dir)


def _rolling_wau(sf_dir: str):
    from tokenzip.relational import q_rolling_active_users

    return q_rolling_active_users(sf_dir)


def _funnel3(sf_dir: str):
    from tokenzip.relational import q_funnel_three_step

    return q_funnel_three_step(sf_dir)


def _corpus_diff(sf_dir: str):
    from tokenzip.analysis import q_corpus_diff_stats

    return q_corpus_diff_stats(sf_dir)


def _shuffled_compress(sf_dir: str):
    from tokenzip.queries import q_shuffled_compress_stats

    return q_shuffled_compress_stats(sf_dir)


def _incompressible_topk(sf_dir: str):
    from tokenzip.queries import q_incompressible_topk

    return q_incompressible_topk(sf_dir)


def _multi_format_union(sf_dir: str):
    from tokenzip.sources import q_multi_format_union

    return q_multi_format_union(sf_dir)


def _vocab_unique(sf_dir: str):
    from tokenzip.training import q_vocab_unique_by_source

    return q_vocab_unique_by_source(sf_dir)


def _recode_stats(sf_dir: str):
    from tokenzip.queries import q_recode_stats

    return q_recode_stats(sf_dir)


def _fused_decode_stats(sf_dir: str):
    from tokenzip.queries import q_fused_decode_stats

    return q_fused_decode_stats(sf_dir)


def _events_asof_orders_salted(sf_dir: str):
    # the skew-salted plan MUST be answer-identical to the plain one, so it
    # shares events_asof_orders' oracle verbatim. hot_frac is dropped far
    # below the production 0.10 so the detector actually flags keys at the
    # oracle scale (max user share at sf0.01 is ~0.9%) and the salted path
    # genuinely executes under the hash gate
    from tokenzip.relational import q_events_asof_orders

    return q_events_asof_orders(sf_dir, hot_keys="auto", hot_frac=0.005)


def _events_range_orders_salted(sf_dir: str):
    # range-join counterpart of the salted as-of plan; same oracle as the
    # plain plan, hot_frac lowered so detection engages at oracle scale
    from tokenzip.relational import q_events_range_orders

    return q_events_range_orders(sf_dir, hot_keys="auto", hot_frac=0.005)


def _order_revenue_salted(sf_dir: str):
    # equi-join counterpart: lineitem probe rows of detected-hot orderkeys
    # split across salt buckets; same oracle as the plain plan
    from tokenzip.relational import q_order_revenue_by_priority

    return q_order_revenue_by_priority(sf_dir, hot_keys="auto", hot_frac=0.0002)


def _props_field_stats(sf_dir: str):
    from tokenzip.relational import q_props_field_stats

    return q_props_field_stats(sf_dir)


def _events_dedup_lag(sf_dir: str):
    from tokenzip.relational import q_events_dedup_lag

    return q_events_dedup_lag(sf_dir)


def _qty_price_suffstats(sf_dir: str):
    from tokenzip.relational import q_qty_price_suffstats

    return q_qty_price_suffstats(sf_dir)


def _marker_counts(sf_dir: str):
    from tokenzip.analysis import q_marker_counts_by_lang

    return q_marker_counts_by_lang(sf_dir)


def _single_month_orders(sf_dir: str):
    from tokenzip.relational import q_single_month_orders

    return q_single_month_orders(sf_dir)


def _vocab_overlap(sf_dir: str):
    from tokenzip.training import q_vocab_overlap

    return q_vocab_overlap(sf_dir)


def _token_run_stats(sf_dir: str):
    from tokenzip.training import q_token_run_stats

    return q_token_run_stats(sf_dir)


def _supplier_variety(sf_dir: str):
    from tokenzip.relational import q_supplier_variety

    return q_supplier_variety(sf_dir)


def _cumulative_revenue(sf_dir: str):
    from tokenzip.relational import q_cumulative_revenue

    return q_cumulative_revenue(sf_dir)


def _idle_high_balance(sf_dir: str):
    from tokenzip.relational import q_idle_high_balance

    return q_idle_high_balance(sf_dir)


def _local_supplier_volume(sf_dir: str):
    from tokenzip.relational import q_local_supplier_volume

    return q_local_supplier_volume(sf_dir)


def _customer_order_dist(sf_dir: str):
    from tokenzip.relational import q_customer_order_dist

    return q_customer_order_dist(sf_dir)


def _large_orders(sf_dir: str):
    from tokenzip.relational import q_large_orders

    return q_large_orders(sf_dir)


def _order_priority_exists(sf_dir: str):
    from tokenzip.relational import q_order_priority_exists

    return q_order_priority_exists(sf_dir)


def _returned_top_customers(sf_dir: str):
    from tokenzip.relational import q_returned_top_customers

    return q_returned_top_customers(sf_dir)


def _user_peak_window(sf_dir: str):
    from tokenzip.relational import q_user_peak_window

    return q_user_peak_window(sf_dir)


def _small_qty_revenue(sf_dir: str):
    from tokenzip.relational import q_small_qty_revenue

    return q_small_qty_revenue(sf_dir)


def _lineitem_cube(sf_dir: str):
    from tokenzip.relational import q_lineitem_cube

    return q_lineitem_cube(sf_dir)


def _kmeans_sizes(sf_dir: str):
    from tokenzip.analysis import q_embedding_kmeans_sizes

    return q_embedding_kmeans_sizes(sf_dir)


def _shipping_priority(sf_dir: str):
    from tokenzip.relational import q_shipping_priority

    return q_shipping_priority(sf_dir)


def _retention(sf_dir: str):
    from tokenzip.relational import q_retention_cohorts

    return q_retention_cohorts(sf_dir)


def _keep_stats(sf_dir: str):
    from tokenzip.analysis import q_dedup_keep_stats

    return q_dedup_keep_stats(sf_dir)


def _dup_clusters(sf_dir: str):
    from tokenzip.analysis import q_dup_clusters

    return q_dup_clusters(sf_dir)


def _sink_projection(sf_dir: str):
    from tokenzip.queries import q_sink_projection_stats

    return q_sink_projection_stats(sf_dir)


def _qty_salted(sf_dir: str):
    from tokenzip.relational import q_lineitem_qty_salted

    return q_lineitem_qty_salted(sf_dir)


def _funnel(sf_dir: str):
    from tokenzip.relational import q_funnel_view_purchase

    return q_funnel_view_purchase(sf_dir)


def _hourly_pivot(sf_dir: str):
    from tokenzip.relational import q_events_hourly_pivot

    return q_events_hourly_pivot(sf_dir)


def _revenue_share(sf_dir: str):
    from tokenzip.relational import q_nation_revenue_share

    return q_nation_revenue_share(sf_dir)


def _top_customer(sf_dir: str):
    from tokenzip.relational import q_top_customer_by_nation

    return q_top_customer_by_nation(sf_dir)


def _user_gaps(sf_dir: str):
    from tokenzip.relational import q_user_gap_stats

    return q_user_gap_stats(sf_dir)


def _price_deciles(sf_dir: str):
    from tokenzip.relational import q_order_price_deciles

    return q_order_price_deciles(sf_dir)


def _sink_stats(sf_dir: str):
    from tokenzip.queries import q_sink_stats_pushdown

    return q_sink_stats_pushdown(sf_dir)


def _csv_ingest(sf_dir: str):
    from tokenzip.sources import q_csv_ingest_stats

    return q_csv_ingest_stats(sf_dir)


def _token_freq_histogram(sf_dir: str):
    from tokenzip.training import q_token_freq_histogram

    return q_token_freq_histogram(sf_dir)


def _top_token_by_source(sf_dir: str):
    from tokenzip.training import q_top_token_by_source

    return q_top_token_by_source(sf_dir)


def _revenue_rollup(sf_dir: str):
    from tokenzip.relational import q_revenue_rollup

    return q_revenue_rollup(sf_dir)


def _cross_source_dups(sf_dir: str):
    from tokenzip.analysis import q_cross_source_dups

    return q_cross_source_dups(sf_dir)


def _tfidf_topk(sf_dir: str):
    from tokenzip.retrieval import q_tfidf_topk

    return q_tfidf_topk(sf_dir)


def _fk_integrity(sf_dir: str):
    from tokenzip.relational import q_fk_integrity

    return q_fk_integrity(sf_dir)


def _order_revenue(sf_dir: str):
    from tokenzip.relational import q_order_revenue_by_priority

    return q_order_revenue_by_priority(sf_dir)


def _repetition(sf_dir: str):
    from tokenzip.analysis import q_repetition_by_source

    return q_repetition_by_source(sf_dir)


def _price_quantiles(sf_dir: str):
    from tokenzip.sketch import q_price_quantiles_sampled

    return q_price_quantiles_sampled(sf_dir)


def _semijoin_bloom(sf_dir: str):
    from tokenzip.bloomjoin import q_lineitem_semijoin_bloom

    return q_lineitem_semijoin_bloom(sf_dir)


def _events_tumbling(sf_dir: str):
    from tokenzip.relational import q_events_tumbling_agg

    return q_events_tumbling_agg(sf_dir)


def _seqlen_quantiles(sf_dir: str):
    from tokenzip.training import q_seqlen_quantiles_by_source

    return q_seqlen_quantiles_by_source(sf_dir)


def _sample_bottomk(sf_dir: str):
    from tokenzip.training import q_sample_bottomk_by_source

    return q_sample_bottomk_by_source(sf_dir)


def _distinct_tokens(sf_dir: str):
    from tokenzip.sketch import q_distinct_tokens_by_source

    return q_distinct_tokens_by_source(sf_dir)


def _mixture_stats(sf_dir: str):
    from tokenzip.training import q_mixture_sample_stats

    return q_mixture_sample_stats(sf_dir)


def _decontam(sf_dir: str):
    from tokenzip.training import q_decontamination_by_source

    return q_decontamination_by_source(sf_dir)


def _table_roundtrip(sf_dir: str):
    from tokenzip.table import q_table_roundtrip_events

    return q_table_roundtrip_events(sf_dir)


def _table_where(sf_dir: str):
    from tokenzip.table import q_table_where_events

    return q_table_where_events(sf_dir)


def _table_where_str(sf_dir: str):
    from tokenzip.table import q_table_where_strings

    return q_table_where_strings(sf_dir)


def _table_where_str_sql() -> str:
    from tokenzip.table import table_where_strings_sql

    return table_where_strings_sql()


def _table_nulls(sf_dir: str):
    from tokenzip.table import q_table_nulls_roundtrip

    return q_table_nulls_roundtrip(sf_dir)


def _table_agg_pushdown(sf_dir: str):
    from tokenzip.table import q_table_agg_pushdown

    return q_table_agg_pushdown(sf_dir)


def _table_emb_roundtrip(sf_dir: str):
    from tokenzip.table import q_table_roundtrip_embeddings

    return q_table_roundtrip_embeddings(sf_dir)


def _pack_stats(sf_dir: str):
    from tokenzip.training import q_pack_stats_by_source

    return q_pack_stats_by_source(sf_dir)


def _pack_emit(sf_dir: str):
    from tokenzip.training import q_pack_emit_by_source

    return q_pack_emit_by_source(sf_dir)


def _vocab_topk(sf_dir: str):
    from tokenzip.training import q_vocab_topk

    return q_vocab_topk(sf_dir)


def _filtered_decompress(sf_dir: str):
    from tokenzip.queries import q_filtered_decompress

    return q_filtered_decompress(sf_dir)


def _compacted_roundtrip(sf_dir: str):
    from tokenzip.queries import q_compacted_roundtrip

    return q_compacted_roundtrip(sf_dir)


def _vocab_topk_mg(sf_dir: str):
    from tokenzip.training import q_vocab_topk_mg

    return q_vocab_topk_mg(sf_dir)


def _bigram_topk_mg(sf_dir: str):
    from tokenzip.training import q_bigram_topk_mg

    return q_bigram_topk_mg(sf_dir)


def _df_topk_mg(sf_dir: str):
    from tokenzip.training import q_df_topk_mg

    return q_df_topk_mg(sf_dir)


def _split_stats(sf_dir: str):
    from tokenzip.training import q_split_stats_by_source

    return q_split_stats_by_source(sf_dir)


def _events_window_agg(sf_dir: str):
    from tokenzip.relational import q_events_window_agg

    return q_events_window_agg(sf_dir)


def _events_asof_orders(sf_dir: str):
    from tokenzip.relational import q_events_asof_orders

    return q_events_asof_orders(sf_dir)


def _events_range_orders(sf_dir: str):
    from tokenzip.relational import q_events_range_orders

    return q_events_range_orders(sf_dir)


def _events_sessions(sf_dir: str):
    from tokenzip.relational import q_events_sessions

    return q_events_sessions(sf_dir)


def _top_orders_by_nation(sf_dir: str):
    from tokenzip.relational import q_top_orders_by_nation

    return q_top_orders_by_nation(sf_dir)


def _orders_without_lineitems(sf_dir: str):
    from tokenzip.relational import q_orders_without_lineitems

    return q_orders_without_lineitems(sf_dir)


def _orders_by_nation(sf_dir: str):
    from tokenzip.relational import q_orders_by_nation

    return q_orders_by_nation(sf_dir)


def _jsonl_sql() -> str:
    # builds (idempotently) the same deterministic JSONL the query reads
    from tokenzip.sources import ensure_jsonl_corpus, jsonl_ingest_sql

    return jsonl_ingest_sql(ensure_jsonl_corpus(_ORACLE_SF))


def _csv_sql() -> str:
    # builds (idempotently) the same deterministic CSV the query reads
    from tokenzip.sources import csv_ingest_sql, ensure_csv_corpus

    return csv_ingest_sql(ensure_csv_corpus(_ORACLE_SF))


def _sink_stats_sql(glob: str) -> str:
    from tokenzip.queries import sink_stats_pushdown_sql

    return sink_stats_pushdown_sql(glob)


def _deciles_sql() -> str:
    from tokenzip.relational import order_price_deciles_sql

    return order_price_deciles_sql()


def _user_gaps_sql() -> str:
    from tokenzip.relational import user_gap_stats_sql

    return user_gap_stats_sql()


def _top_customer_sql() -> str:
    from tokenzip.relational import top_customer_by_nation_sql

    return top_customer_by_nation_sql()


def _hourly_pivot_sql() -> str:
    from tokenzip.relational import events_hourly_pivot_sql

    return events_hourly_pivot_sql()


def _revenue_share_sql() -> str:
    from tokenzip.relational import nation_revenue_share_sql

    return nation_revenue_share_sql()


def _funnel_sql() -> str:
    from tokenzip.relational import funnel_view_purchase_sql

    return funnel_view_purchase_sql()


def _qty_salted_sql() -> str:
    from tokenzip.relational import lineitem_qty_salted_sql

    return lineitem_qty_salted_sql()


def _sink_projection_sql(glob: str) -> str:
    from tokenzip.queries import sink_projection_stats_sql

    return sink_projection_stats_sql(glob)


def _dup_clusters_sql() -> str:
    from tokenzip.analysis import dup_clusters_sql

    return dup_clusters_sql()


def _keep_stats_sql() -> str:
    from tokenzip.analysis import dedup_keep_stats_sql

    return dedup_keep_stats_sql()


def _retention_sql() -> str:
    from tokenzip.relational import retention_cohorts_sql

    return retention_cohorts_sql()


def _shipping_sql() -> str:
    from tokenzip.relational import shipping_priority_sql

    return shipping_priority_sql()


def _kmeans_sql() -> str:
    from tokenzip.analysis import embedding_kmeans_sizes_sql

    return embedding_kmeans_sizes_sql()


def _custdist_sql() -> str:
    from tokenzip.relational import customer_order_dist_sql

    return customer_order_dist_sql()


def _large_orders_sql() -> str:
    from tokenzip.relational import large_orders_sql

    return large_orders_sql()


def _priority_exists_sql() -> str:
    from tokenzip.relational import order_priority_exists_sql

    return order_priority_exists_sql()


def _returned_topk_sql() -> str:
    from tokenzip.relational import returned_top_customers_sql

    return returned_top_customers_sql()


def _cumrev_sql() -> str:
    from tokenzip.relational import cumulative_revenue_sql

    return cumulative_revenue_sql()


def _idle_high_sql() -> str:
    from tokenzip.relational import idle_high_balance_sql

    return idle_high_balance_sql()


def _q5_sql() -> str:
    from tokenzip.relational import local_supplier_volume_sql

    return local_supplier_volume_sql()


def _forecast_revenue_sql() -> str:
    from tokenzip.relational import forecast_revenue_sql

    return forecast_revenue_sql()


def _promo_revenue_sql() -> str:
    from tokenzip.relational import promo_revenue_sql

    return promo_revenue_sql()


def _top_supplier_sql() -> str:
    from tokenzip.relational import top_supplier_sql

    return top_supplier_sql()


def _brand_qty_revenue_sql() -> str:
    from tokenzip.relational import brand_qty_revenue_sql

    return brand_qty_revenue_sql()


def _volume_shipping_sql() -> str:
    from tokenzip.relational import volume_shipping_sql

    return volume_shipping_sql()


def _market_share_sql() -> str:
    from tokenzip.relational import market_share_sql

    return market_share_sql()


def _nation_profit_sql() -> str:
    from tokenzip.relational import nation_profit_sql

    return nation_profit_sql()


def _vocab_overlap_sql(glob: str) -> str:
    from tokenzip.training import vocab_overlap_sql

    return vocab_overlap_sql(glob)


def _vocab_unique_sql(glob: str) -> str:
    from tokenzip.training import vocab_unique_by_source_sql

    return vocab_unique_by_source_sql(glob)


def _multi_union_sql(glob: str) -> str:
    from tokenzip.sources import multi_format_union_sql

    return multi_format_union_sql(glob)


def _incompressible_sql(glob: str) -> str:
    from tokenzip.queries import incompressible_topk_sql

    return incompressible_topk_sql(glob)


def _corpus_diff_sql(glob: str) -> str:
    from tokenzip.analysis import corpus_diff_stats_sql

    return corpus_diff_stats_sql(glob)


def _funnel3_sql() -> str:
    from tokenzip.relational import funnel_three_step_sql

    return funnel_three_step_sql()


def _rolling_wau_sql() -> str:
    from tokenzip.relational import rolling_active_users_sql

    return rolling_active_users_sql()


def _affinity_sql() -> str:
    from tokenzip.relational import event_type_affinity_sql

    return event_type_affinity_sql()


def _vocab_jaccard_sql(glob: str) -> str:
    from tokenzip.training import vocab_jaccard_sql

    return vocab_jaccard_sql(glob)


def _shuffle_head_sql(glob: str) -> str:
    from tokenzip.training import shuffle_head_sql

    return shuffle_head_sql(glob)


def _longest_docs_sql(glob: str) -> str:
    from tokenzip.training import longest_docs_sql

    return longest_docs_sql(glob)


def _token_run_sql(glob: str) -> str:
    from tokenzip.training import token_run_stats_sql

    return token_run_stats_sql(glob)


def _supplier_variety_sql() -> str:
    from tokenzip.relational import supplier_variety_sql

    return supplier_variety_sql()


def _marker_counts_sql() -> str:
    from tokenzip.analysis import marker_counts_by_lang_sql

    return marker_counts_by_lang_sql()


def _single_month_sql() -> str:
    from tokenzip.relational import single_month_orders_sql

    return single_month_orders_sql()


def _dedup_lag_sql() -> str:
    from tokenzip.relational import events_dedup_lag_sql

    return events_dedup_lag_sql()


def _suffstats_sql() -> str:
    from tokenzip.relational import qty_price_suffstats_sql

    return qty_price_suffstats_sql()


def _props_stats_sql() -> str:
    from tokenzip.relational import props_field_stats_sql

    return props_field_stats_sql()


def _recode_sql(glob: str) -> str:
    from tokenzip.queries import recode_stats_sql

    return recode_stats_sql(glob)


def _sink_delete_sql(glob: str) -> str:
    from tokenzip.queries import delete_roundtrip_sql

    return delete_roundtrip_sql(glob)


def _sink_upsert_sql(glob: str) -> str:
    from tokenzip.queries import upsert_roundtrip_sql

    return upsert_roundtrip_sql(glob)


def _sink_fsck_sql(glob: str) -> str:
    from tokenzip.queries import sink_fsck_sql

    return sink_fsck_sql(glob)


def _dup_block_sql(glob: str) -> str:
    from tokenzip.training import dup_block_census_sql

    return dup_block_census_sql(glob)


def _length_outliers_sql(glob: str) -> str:
    from tokenzip.training import length_outliers_sql

    return length_outliers_sql(glob)


def _vocab_tv_sql(glob: str) -> str:
    from tokenzip.training import vocab_tv_distance_sql

    return vocab_tv_distance_sql(glob)


def _seqlen_mad_sql(glob: str) -> str:
    from tokenzip.training import seqlen_mad_sql

    return seqlen_mad_sql(glob)


def _curation_funnel_sql() -> str:
    from tokenzip.analysis import curation_funnel_sql

    return curation_funnel_sql()


def _table_delete_sql() -> str:
    from tokenzip.table import table_delete_roundtrip_sql

    return table_delete_roundtrip_sql()


def _table_drop_col_sql() -> str:
    from tokenzip.table import table_drop_column_sql

    return table_drop_column_sql()


def _table_add_col_sql() -> str:
    from tokenzip.table import table_add_column_sql

    return table_add_column_sql()


def _ratio_by_bucket_sql(glob: str) -> str:
    from tokenzip.queries import ratio_by_length_bucket_sql

    return ratio_by_length_bucket_sql(glob)


def _pricing_sql() -> str:
    from tokenzip.relational import pricing_summary_sql

    return pricing_summary_sql()


def _orders_nation_sql() -> str:
    from tokenzip.relational import orders_by_nation_sql

    return orders_by_nation_sql()


def _sessions_sql() -> str:
    from tokenzip.relational import events_sessions_sql

    return events_sessions_sql()


def _top_orders_sql() -> str:
    from tokenzip.relational import top_orders_by_nation_sql

    return top_orders_by_nation_sql()


def _anti_join_sql() -> str:
    from tokenzip.relational import orders_without_lineitems_sql

    return orders_without_lineitems_sql()


def _semijoin_bloom_sql() -> str:
    from tokenzip.bloomjoin import lineitem_semijoin_bloom_sql

    return lineitem_semijoin_bloom_sql()


def _events_tumbling_sql() -> str:
    from tokenzip.relational import events_tumbling_sql

    return events_tumbling_sql()


def _price_quantiles_sql() -> str:
    from tokenzip.sketch import price_quantiles_sql

    return price_quantiles_sql()


def _repetition_sql() -> str:
    from tokenzip.analysis import repetition_sql

    return repetition_sql()


def _order_revenue_sql() -> str:
    from tokenzip.relational import order_revenue_sql

    return order_revenue_sql()


def _fk_integrity_sql() -> str:
    from tokenzip.relational import fk_integrity_sql

    return fk_integrity_sql()


def _tfidf_sql() -> str:
    from tokenzip.retrieval import tfidf_topk_sql

    return tfidf_topk_sql()


def _cross_dups_sql() -> str:
    from tokenzip.analysis import cross_source_dups_sql

    return cross_source_dups_sql()


def _rollup_sql() -> str:
    from tokenzip.relational import revenue_rollup_sql

    return revenue_rollup_sql()


def _cube_sql() -> str:
    from tokenzip.relational import lineitem_cube_sql

    return lineitem_cube_sql()


def _peak_window_sql() -> str:
    from tokenzip.relational import user_peak_window_sql

    return user_peak_window_sql()


def _small_qty_sql() -> str:
    from tokenzip.relational import small_qty_revenue_sql

    return small_qty_revenue_sql()


def _top_token_sql(glob: str) -> str:
    from tokenzip.training import top_token_by_source_sql

    return top_token_by_source_sql(glob)


def _freq_hist_sql(glob: str) -> str:
    from tokenzip.training import token_freq_histogram_sql

    return token_freq_histogram_sql(glob)


def _pricing_summary(sf_dir: str):
    from tokenzip.relational import q_pricing_summary

    return q_pricing_summary(sf_dir)


def _jsonl_ingest(sf_dir: str):
    from tokenzip.sources import q_jsonl_ingest_stats

    return q_jsonl_ingest_stats(sf_dir)


def _media_features(sf_dir: str):
    from tokenzip.multimodal import q_media_features_by_source

    return q_media_features_by_source(sf_dir)


def _media_real_stats(sf_dir: str):
    from tokenzip.multimodal import q_media_real_stats

    return q_media_real_stats(sf_dir)




_FP_EXPR = (
    "substr(md5(array_to_string(list_sort(list_distinct("
    "string_split(text, ' '))), ' ')), 1, 16)"
)




def _pack_sql(glob: str) -> str:
    from tokenzip.training import pack_stats_sql

    return pack_stats_sql(glob)


def _pack_emit_sql(glob: str) -> str:
    from tokenzip.training import pack_emit_sql

    return pack_emit_sql(glob)


def _filtered_sql(glob: str) -> str:
    from tokenzip.queries import filtered_decompress_sql

    return filtered_decompress_sql(glob)


def _doc_range_sql(glob: str) -> str:
    from tokenzip.queries import doc_range_decompress_sql

    return doc_range_decompress_sql(glob)


def _doc_point_sql(glob: str) -> str:
    from tokenzip.queries import doc_point_decompress_sql

    return doc_point_decompress_sql(glob)


def _compacted_sql(glob: str) -> str:
    from tokenzip.queries import compacted_roundtrip_sql

    return compacted_roundtrip_sql(glob)


def _vocab_sql(glob: str) -> str:
    from tokenzip.training import vocab_topk_sql

    return vocab_topk_sql(glob)


def _bigram_sql(glob: str) -> str:
    from tokenzip.training import bigram_topk_sql

    return bigram_topk_sql(glob)


def _df_sql(glob: str) -> str:
    from tokenzip.training import df_topk_sql

    return df_topk_sql(glob)


def _split_sql(glob: str) -> str:
    from tokenzip.training import split_stats_sql

    return split_stats_sql(glob)


def _table_sql() -> str:
    from tokenzip.table import table_roundtrip_events_sql

    return table_roundtrip_events_sql()


def _table_where_sql() -> str:
    from tokenzip.table import table_where_events_sql

    return table_where_events_sql()


def _table_nulls_sql() -> str:
    from tokenzip.table import table_nulls_roundtrip_sql

    return table_nulls_roundtrip_sql()


def _table_agg_sql() -> str:
    from tokenzip.table import table_agg_pushdown_sql

    return table_agg_pushdown_sql()


def _table_emb_sql() -> str:
    from tokenzip.table import table_roundtrip_embeddings_sql

    return table_roundtrip_embeddings_sql()


def _mixture_sql(glob: str) -> str:
    from tokenzip.training import mixture_sample_sql

    return mixture_sample_sql(glob)


def _decontam_sql() -> str:
    from tokenzip.training import decontamination_sql

    return decontamination_sql()


def _media_real_sql() -> str:
    from tokenzip.multimodal import media_real_sql

    return media_real_sql()


def _distinct_sql(glob: str) -> str:
    from tokenzip.sketch import distinct_tokens_sql

    return distinct_tokens_sql(glob)


def _bottomk_sql(glob: str) -> str:
    from tokenzip.training import sample_bottomk_sql

    return sample_bottomk_sql(glob)


def _seqlen_sql(glob: str) -> str:
    from tokenzip.training import seqlen_quantiles_sql

    return seqlen_quantiles_sql(glob)


def oracle_sql() -> dict[str, str]:
    from tokenzip import oracles as _O

    glob = _corpus_glob(_ORACLE_SF)
    zz = "CASE WHEN t >= 0 THEN 2*CAST(t AS BIGINT) ELSE -2*CAST(t AS BIGINT)-1 END"

    return {
        "compression_totals": f"""
WITH z AS (
  SELECT {zz} AS zz
  FROM (SELECT unnest(tokens) AS t FROM read_parquet('{glob}'))
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM read_parquet('{glob}')) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN zz < 128 THEN 1 WHEN zz < 16384 THEN 2
                     WHEN zz < 2097152 THEN 3 WHEN zz < 268435456 THEN 4
                     ELSE 5 END) AS BIGINT) AS leb128_bytes,
       CAST(1 AS BIGINT) AS bound_ok
FROM z
""",
        "fingerprint_by_source": f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT {_FP_EXPR}) AS BIGINT) AS n_distinct
FROM documents GROUP BY source ORDER BY source
""",
        "compression_by_codec": _O.compression_by_codec_sql(glob),
        "pack_stats_by_source": _pack_sql(glob),
        "pack_emit_by_source": _pack_emit_sql(glob),
        "filtered_decompress": _filtered_sql(glob),
        "doc_range_decompress": _doc_range_sql(glob),
        # same range oracle through a cluster_by='doc_id' layout sink
        "clustered_range_decompress": _doc_range_sql(glob),
        "doc_point_decompress": _doc_point_sql(glob),
        "compacted_roundtrip": _compacted_sql(glob),
        "vocab_topk": _vocab_sql(glob),
        # grouped mode: most frequent token per source, ties to smaller id
        "top_token_by_source": _top_token_sql(glob),
        # Zipf audit: decimal-digit frequency-of-frequencies, integer-only
        "token_freq_histogram": _freq_hist_sql(glob),
        "vocab_topk_mg": _vocab_sql(glob),
        "bigram_topk_mg": _bigram_sql(glob),
        "df_topk_mg": _df_sql(glob),
        "split_stats_by_source": _split_sql(glob),
        "table_roundtrip_events": _table_sql(),
        "table_where_events": _table_where_sql(),
        "table_where_strings": _table_where_str_sql(),
        "table_nulls_roundtrip": _table_nulls_sql(),
        "table_agg_pushdown": _table_agg_sql(),
        "table_roundtrip_embeddings": _table_emb_sql(),
        "mixture_sample_stats": _mixture_sql(glob),
        "decontamination_by_source": _decontam_sql(),
        "lang_id_confusion": _O.lang_id_sql(),
        # HLL sketch vs exact distinct: the exact column is DuckDB's own
        # COUNT(DISTINCT); the sketch column is a pinned constant that the
        # SQL self-audits to within 5% of that exact count (a drifted pin
        # returns zero rows -> red row count, never a silent match)
        "distinct_tokens_by_source": _distinct_sql(glob),
        "sample_bottomk_by_source": _bottomk_sql(glob),
        "seqlen_quantiles_by_source": _seqlen_sql(glob),
        "media_features_by_source": _O.media_sql(),
        "media_real_stats": _media_real_sql(),
        "boundary_roundtrip": _O.boundary_sql(),
        "dedup_minhash": _O.minhash_sql(),
        # exact inverted-index n-gram Jaccard: the SAME oracle as minhash —
        # the two pipelines compute the identical ground truth by different
        # distributed strategies (LSH-approximate-with-exact-verify vs
        # exact postings join), a built-in cross-check
        "dedup_jaccard": _O.minhash_sql(),
        # connected components over the same dup pairs: recursive closure
        "dup_clusters": _dup_clusters_sql(),
        # keep-min-per-cluster dedup accounting per source
        "dedup_keep_stats": _keep_stats_sql(),
        "dedup_simhash": _O.simhash_sql(),
        # time-keyed relational operators over the events/orders views
        "events_window_agg": _O.events_window_sql(),
        "events_asof_orders": _O.events_asof_sql(),
        "events_range_orders": _O.events_range_sql(),
        "events_sessions": _sessions_sql(),
        "top_orders_by_nation": _top_orders_sql(),
        "orders_without_lineitems": _anti_join_sql(),
        # bloom-filter semi-join: the SQL is the exact semi join; the Ray
        # side self-audits the bloom (zero false negatives, fpr < 5%)
        "lineitem_semijoin_bloom": _semijoin_bloom_sql(),
        "events_tumbling_agg": _events_tumbling_sql(),
        # sampled quantiles: oracle draws the IDENTICAL md5 bottom-k
        # sample; the Ray side additionally rank-certifies vs the full
        # table (DKW bound) before returning
        "price_quantiles_sampled": _price_quantiles_sql(),
        "repetition_by_source": _repetition_sql(),
        # large-x-large co-partitioned inner join (neither side broadcast)
        "order_revenue_by_priority": _order_revenue_sql(),
        "fk_integrity": _fk_integrity_sql(),
        "orders_by_nation": _orders_nation_sql(),
        # integer TF-IDF retrieval (idf cleared of halves; pure int on both)
        "tfidf_topk": _tfidf_sql(),
        # cross-source exact-content contamination (shared fingerprints)
        "cross_source_dups": _cross_dups_sql(),
        # GROUP BY ROLLUP from one scan: coarser levels fold from finest
        "revenue_rollup": _rollup_sql(),
        # GROUP BY CUBE: all four grouping sets from the same identity
        "lineitem_cube": _cube_sql(),
        # window FRAME (ROWS 2 PRECEDING): per-user peak 3-event spend
        "user_peak_window": _peak_window_sql(),
        # TPC-H Q17 shape: correlated per-part avg via integer cross-multiply
        "small_qty_revenue": _small_qty_sql(),
        # exact NTILE deciles from a sparse histogram — no global sort
        "order_price_deciles": _deciles_sql(),
        # LAG window: per-user inter-arrival gaps, deterministic tie-break
        "user_gap_stats": _user_gaps_sql(),
        # argmax over a computed aggregate: each nation's top customer
        "top_customer_by_nation": _top_customer_sql(),
        # PIVOT: hour-of-day x event_type count matrix as wide columns
        "events_hourly_pivot": _hourly_pivot_sql(),
        # percent-of-total (SUM() OVER ()): integer basis points
        "nation_revenue_share": _revenue_share_sql(),
        # funnel self-join: window-bounded view->purchase conversion
        "funnel_view_purchase": _funnel_sql(),
        # salted two-phase aggregate == plain groupby (skew primitive)
        "lineitem_qty_salted": _qty_salted_sql(),
        # week-1 retention cohorts (first-event week, returns next week)
        "retention_cohorts": _retention_sql(),
        # TPC-H Q3 shape: filters pushed to both reads, join, top-k
        "shipping_priority": _shipping_sql(),
        # k-means census: self-auditing pin gated on exact COUNT(*)
        "embedding_kmeans_sizes": _kmeans_sql(),
        # TPC-H Q13 shape: LEFT-JOIN order-count distribution, zero bucket
        # from customer row count minus distinct ordering customers
        "customer_order_dist": _custdist_sql(),
        # TPC-H Q18 shape: distributed HAVING, tail-only join-back
        "large_orders": _large_orders_sql(),
        # TPC-H Q4 shape: EXISTS as a co-partitioned semi join
        "order_priority_exists": _priority_exists_sql(),
        # TPC-H Q10 shape: returns revenue top-k, k-row dimension probe
        "returned_top_customers": _returned_topk_sql(),
        # window over aggregate: monthly running revenue per priority
        "cumulative_revenue": _cumrev_sql(),
        # TPC-H Q22 shape: exact-integer scalar avg + anti join
        "idle_high_balance": _idle_high_sql(),
        # TPC-H Q5 shape: two chained co-partitioned joins, region filter
        "local_supplier_volume": _q5_sql(),
        # set op: pairwise source vocab INTERSECT via bitmask census
        "vocab_overlap": _vocab_overlap_sql(glob),
        # set op: per-source vocab EXCEPT-all-others, same census
        "vocab_unique_by_source": _vocab_unique_sql(glob),
        # heterogeneous union: jsonl+csv+parquet must equal the corpus
        "multi_format_union_stats": _multi_union_sql(glob),
        # incompressibility outliers: worst LEB128 bytes per 1k tokens
        "incompressible_topk": _incompressible_sql(glob),
        # skew-isolation compress (doc-hash groupby shuffle) is lossless
        "shuffled_compress_stats": _recode_sql(glob),
        # CDC corpus diff: FULL OUTER JOIN classification per source
        "corpus_diff_stats": _corpus_diff_sql(glob),
        # sequential pattern: view->click->purchase chain within windows
        "funnel_three_step": _funnel3_sql(),
        # exact rolling 7-day distinct users via interval diffs
        "rolling_active_users": _rolling_wau_sql(),
        # market-basket support: users performing BOTH of each type pair
        "event_type_affinity": _affinity_sql(),
        # set-similarity coefficients (integer basis points) off the census
        "vocab_jaccard": _vocab_jaccard_sql(glob),
        # ORDER BY ... LIMIT through Ray's native all-to-all sort
        "longest_docs": _longest_docs_sql(glob),
        # deterministic epoch-shuffle writer: salted-md5 global order,
        # head-k recomputed from the WRITTEN range-disjoint files
        "shuffle_head_stats": _shuffle_head_sql(glob),
        # run-length census per source (the RLE codec's premise, exact)
        "token_run_stats": _token_run_sql(glob),
        # TPC-H Q16 shape: COUNT(DISTINCT) per attribute combo
        "supplier_variety": _supplier_variety_sql(),
        # pure-Arrow-kernel text census (count_substring; no regex)
        "marker_counts_by_lang": _marker_counts_sql(),
        # ALL quantifier per join group (min==max over segments)
        "single_month_orders": _single_month_sql(),
        # LAG-window duplicate suppression census per event type
        "events_dedup_lag": _dedup_lag_sql(),
        # exact-integer regression sufficient statistics per flag
        "qty_price_suffstats": _suffstats_sql(),
        # semi-structured: one RE2 kernel extracts the props int field
        "props_field_stats": _props_stats_sql(),
        # codec migration: legacy LEB128 sink recoded to auto, content
        # decoded from the RECODED sink (bit-identity through two sinks)
        "recode_stats": _recode_sql(glob),
        "fused_decode_stats": _recode_sql(glob),
        # targeted deletion: bloom/zone-pruned selective rewrite; the
        # decoded survivor rollup must equal the corpus minus the salted
        # md5 'del:' rule set
        "sink_delete_roundtrip": _sink_delete_sql(glob),
        # MERGE: latest-wins replace-or-insert through delete + append
        "sink_upsert_roundtrip": _sink_upsert_sql(glob),
        # standalone integrity check: fsck totals vs corpus counts, ok = 1
        "sink_fsck_stats": _sink_fsck_sql(glob),
        # substring-level dedup census: exact 16-token block duplication
        "dup_block_census": _dup_block_sql(glob),
        # exact-integer 3-sigma length outliers (isqrt thresholds vs the
        # HUGEINT squared rule — no float sigma on either engine)
        "length_outliers_by_source": _length_outliers_sql(glob),
        # pairwise unigram-distribution drift, exact integer TV numerator
        "vocab_tv_distance": _vocab_tv_sql(glob),
        # robust dispersion: median/MAD/outliers off one bounded histogram
        "seqlen_mad_by_source": _seqlen_mad_sql(glob),
        # end-to-end curation composition: quality -> dedup -> mixture
        "curation_funnel": _curation_funnel_sql(),
        # incremental append: half-then-all compress == one-shot corpus
        "append_roundtrip": _recode_sql(glob),
        # predicate deletion on a generic-table sink (NOT BETWEEN oracle)
        "table_delete_roundtrip": _table_delete_sql(),
        # zero-decode DROP COLUMN (chunk-row surgery, payload untouched)
        "table_drop_column_roundtrip": _table_drop_col_sql(),
        # zero-decode ADD COLUMN DEFAULT (constant blob synthesized per chunk)
        "table_add_column_roundtrip": _table_add_col_sql(),
        # codec analytics: LEB128 bytes/kilotoken per length-decile bucket
        "ratio_by_length_bucket": _ratio_by_bucket_sql(glob),
        # TPC-H Q6 shape: all-filter aggregate, the scan-speed floor
        "forecast_revenue": _forecast_revenue_sql(),
        # TPC-H Q14 shape: promo share numerator/denominator, broadcast part
        "promo_revenue": _promo_revenue_sql(),
        # TPC-H Q15 shape: windowed argmax supplier off supplier-sized partials
        "top_supplier": _top_supplier_sql(),
        # TPC-H Q19 shape: disjunctive predicates compiled to a part bitmask
        "brand_qty_revenue": _brand_qty_revenue_sql(),
        # TPC-H Q7 shape: two-nation volume by ship year, two co-partitioned hops
        "volume_shipping": _volume_shipping_sql(),
        # TPC-H Q8 shape: market-share numerator/denominator per order year
        "market_share": _market_share_sql(),
        # TPC-H Q9 shape: nation x order-year profit rollup
        "nation_profit": _nation_profit_sql(),
        "events_asof_orders_salted": _O.events_asof_sql(),
        "events_range_orders_salted": _O.events_range_sql(),
        "order_revenue_by_priority_salted": _order_revenue_sql(),
        "pricing_summary": _pricing_sql(),
        "jsonl_ingest_stats": _jsonl_sql(),
        "csv_ingest_stats": _csv_sql(),
        # metadata-only sink aggregate: pure chunks never decode
        "sink_stats_pushdown": _sink_stats_sql(glob),
        # projection pushdown: token payload neither read nor decoded
        "sink_projection_stats": _sink_projection_sql(glob),
        # recall-pinned oracle: the IVF result is deterministic (fixed
        # corpus + seeded k-means on a bounded sample + float64 matmul), so
        # the sf0.01 recall is a constant the engine must reproduce exactly
        # (pin lives in analysis.EMB_TOPK_IVF_PIN; `python -m tokenzip pins`)
        "embedding_topk_ivf": _O.embedding_topk_ivf_sql(),
        # embedding-cosine near-dup: pairs with cos >= 2/5 in float64 on
        # both engines (shared builder — also used by tests/test_analysis.py)
        "dedup_embedding": _O.embedding_dedup_sql(),
        # IVF-bucketed scale path: self-auditing pin — DuckDB recomputes
        # the exact pair set and gates the pinned found constants on it
        "dedup_embedding_ivf": _O.embedding_dedup_ivf_sql(),
        "roundtrip_by_source": f"""
WITH tok AS (
  SELECT doc_id, CAST(SUM(CAST(t AS BIGINT)) AS BIGINT) AS tv
  FROM (SELECT doc_id, unnest(tokens) AS t FROM read_parquet('{glob}'))
  GROUP BY doc_id
)
SELECT b.source AS source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_equal,
       CAST(SUM(b.n_tok) AS BIGINT) AS sum_n_tok,
       CAST(COALESCE(SUM(tok.tv), 0) AS BIGINT) AS sum_token_values
FROM read_parquet('{glob}') b LEFT JOIN tok USING (doc_id)
GROUP BY b.source ORDER BY source
""",
        # sink join verifies the same invariant end-to-end THROUGH the
        # written chunks — oracle is identical by construction
        "sink_roundtrip_join": f"""
WITH tok AS (
  SELECT doc_id, CAST(SUM(CAST(t AS BIGINT)) AS BIGINT) AS tv
  FROM (SELECT doc_id, unnest(tokens) AS t FROM read_parquet('{glob}'))
  GROUP BY doc_id
)
SELECT b.source AS source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_equal,
       CAST(SUM(b.n_tok) AS BIGINT) AS sum_n_tok,
       CAST(COALESCE(SUM(tok.tv), 0) AS BIGINT) AS sum_token_values
FROM read_parquet('{glob}') b LEFT JOIN tok USING (doc_id)
GROUP BY b.source ORDER BY source
""",
        "token_stats_by_source": f"""
WITH base AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN n_tok = len(tokens) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ntok_match
  FROM read_parquet('{glob}') GROUP BY source
),
z AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(MIN(t) AS BIGINT) AS min_token,
         CAST(MAX(t) AS BIGINT) AS max_token,
         CAST(SUM({zz}) AS BIGINT) AS sum_zigzag,
         CAST(SUM(CASE WHEN zz < 128 THEN 1 WHEN zz < 16384 THEN 2
                       WHEN zz < 2097152 THEN 3 WHEN zz < 268435456 THEN 4
                       ELSE 5 END) AS BIGINT) AS leb128_bytes
  FROM (SELECT source, t, {zz} AS zz
        FROM (SELECT source, unnest(tokens) AS t FROM read_parquet('{glob}')))
  GROUP BY source
)
SELECT base.source AS source, n_docs, n_tokens, min_token, max_token,
       sum_zigzag, leb128_bytes, n_ntok_match
FROM base JOIN z USING (source) ORDER BY source
""",
        "dedup_exact": """
WITH h AS (SELECT doc_id, source, md5(text) AS h FROM documents),
k AS (SELECT h, MIN(doc_id) AS kept FROM h GROUP BY h)
SELECT d.source AS source,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents d2
         WHERE d2.source = d.source) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(d.doc_id) AS BIGINT) AS sum_kept_ids
FROM h d JOIN k ON d.doc_id = k.kept
GROUP BY d.source ORDER BY source
""",
        "embedding_topk": """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
),
scored AS (
  SELECT vec_id,
         list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)) AS cos
  FROM embeddings
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10
""",
        "token_counts_by_lang": """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]| +')))
            AS BIGINT) AS n_re_tokens
FROM documents GROUP BY lang ORDER BY lang
""",
        "text_quality_by_lang": """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
       CAST(SUM(len(list_filter(string_split(text, ' '),
                    w -> w IN ('the','a','and','of','to')))) AS BIGINT)
         AS sum_stopwords
FROM documents GROUP BY lang ORDER BY lang
""",
        "intcol_roundtrip_lineitem": """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_orderkey,
       CAST(SUM(l_partkey) AS BIGINT) AS sum_partkey,
       CAST(SUM(l_suppkey) AS BIGINT) AS sum_suppkey
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
        "events_ts_roundtrip": """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
FROM events GROUP BY event_type ORDER BY event_type
""",
    }
