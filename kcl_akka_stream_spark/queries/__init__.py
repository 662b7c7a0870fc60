"""Query library: every entry is a named (Spark callable, DuckDB oracle SQL)
pair consumed by __spark_entry__.py -- the driver runs both at sf0.01 and
hash-compares results (row count + schema + order-insensitive value hash).

Conventions that make cross-engine hashing exact:
- every computed column is aliased identically in Spark and SQL;
- money/double sums aggregate in DECIMAL(18,2) then cast to double (exact in
  both engines regardless of partial-agg order);
- ratio/cosine outputs are single IEEE ops or rounded to 6 dp;
- timestamps leave as formatted strings; arrays leave as joined strings;
- every top-k has a unique tiebreaker.
"""

from kcl_akka_stream_spark.queries.registry import ORACLES, QUERIES

# Importing the modules populates the registries.
from kcl_akka_stream_spark.queries import core  # noqa: E402,F401
from kcl_akka_stream_spark.queries import reference_ops  # noqa: E402,F401
from kcl_akka_stream_spark.queries import pipeline  # noqa: E402,F401
from kcl_akka_stream_spark.queries import streaming_q  # noqa: E402,F401

#: Samplers that take the first N registry entries (the driver's
#: correctness gate records 50) must see a REPRESENTATIVE slice, not just
#: whichever module imported first.  The sample ROTATES each round
#: (VERDICT r5 #2): rounds 1-5 never sampled 43 of the 131 queries, so
#: round 6 front-loads exactly the never-before-sampled names (plus this
#: round's new queries) after the flagship; previously-green entries fill
#: the remainder in their original registration order.
_PRIORITY = [
    "q1_pricing_summary",
    # -- never sampled in CORRECTNESS_r01..r05 --
    "j_null_skew_bypass",
    "j_null_safe",
    "text_fingerprint",
    "sim_topk_bruteforce",
    "sim_topk_ivf_nprobe",
    "emb_near_dup",
    "emb_near_dup_lsh",
    "multimodal_resize",
    "sink_keyed_ordered",
    "multimodal_frame_sample",
    "text_token_bpe",
    "sample_weighted",
    "sample_stratified",
    "corpus_vocab_topk",
    "text_rolling_fingerprint",
    "dedup_boilerplate_segments",
    "pipeline_rebalance_langs",
    "cluster_kmeans_assign",
    "pipeline_export_manifest",
    "agg_cms_merged",
    "text_langid_confusion",
    "pipeline_adaptive_length_filter",
    "emb_near_dup_block_report",
    "pipeline_incremental_dedup",
    "diag_key_skew",
    "emb_lang_centroids",
    "sink_partitioned_roundtrip",
    "pipeline_compact_shards",
    "dedup_simhash_pairs",
    "udf_pandas_vowel_density",
    "dedup_containment_pairs",
    "text_winnow_pairs",
    "agg_kmv_error_report",
    "agg_hist_median",
    "dedup_savings_report",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_checkpoint_frontier",
    "stream_committed_sink",
    "stream_quality_filter",
    "stream_kmv_merge",
    "stream_cms_merge",
    "stream_static_enrich",
    # -- new this round --
    "sim_topk_ivf_prebuilt",
    "dedup_ngram_jaccard_capped",
    "u_except",
    "j_anti",
    "q4_order_priority",
    "q12_priority_shipping",
    "q19_discounted_revenue",
    "q13_customer_distribution",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q22_global_sales_opportunity",
    "pipeline_tfidf_topk",
    "sink_zorder_roundtrip",
    "stream_dedup_watermarked",
    "stream_hist_merge",
    "pipeline_snapshot_diff",
    "dedup_edit_verified",
    "agg_approx_quantile_report",
    "agg_conditional_funcs",
    "agg_corr_exact",
    "pipeline_chunk_docs",
    "sink_jsonl_roundtrip",
    "pipeline_train_val_split",
    "text_oov_report",
    "j_cogroup_interval_counts",
    "q21_suppliers_kept_waiting",
    "q15_top_supplier",
    "q11_important_supplier_value",
    "emb_random_projection",
    "dedup_semantic",
    "dedup_semantic_auto",
    "pipeline_source_cap",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q20_excess_inventory_suppliers",
    "q2_min_cost_supplier",
    "arrow_doc_stats",
    "udtf_token_runs",
    "j_lateral_topk",
    "scalar_variant_extract",
    "stream_left_outer_join",
    "stream_cdc_upsert",
    "text_unigram_logprob",
    "pipeline_bpe_top_pairs",
    "graph_pagerank_topk",
    "w_rolling_range_frame",
    "agg_outlier_zscore",
    "sink_csv_roundtrip",
    "pipeline_split_leakage_safe",
    "agg_unpivot_brand_metrics",
    "u_except_all",
    "u_intersect_all",
    "source_python_datasource",
    "stream_python_datasource",
    "sink_pyds_manifest_roundtrip",
    "stream_session_dynamic_gap",
    "udaf_grouped_median",
    "stream_chained_window_agg",
    "stream_pyds_pipeline_manifest",
    "arrow_lang_stats",
]


def _reorder() -> None:
    pri = [n for n in _PRIORITY if n in QUERIES]
    order = pri + [n for n in QUERIES if n not in set(pri)]
    q = {n: QUERIES[n] for n in order}
    o = {n: ORACLES[n] for n in order if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
