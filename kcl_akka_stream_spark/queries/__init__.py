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
#: (VERDICT r5 #2, r6 #2, r7 #3): after round 7, exactly 18 of the 201
#: registry names had never appeared in a driver CORRECTNESS sample --
#: the 11 round-7 additions plus 7 older entries that sat past the 50-row
#: cutoff (set difference over CORRECTNESS_r01..r07).  Round 8
#: front-loads all 18 after the flagship, then round-8 NEW queries (so
#: they are driver-verified the round they land), then rotation fill from
#: the longest-unsampled previously-green names.
_PRIORITY = [
    "q1_pricing_summary",
    # -- the final 18 never driver-sampled in CORRECTNESS_r01..r07 --
    "pipeline_bloom_dedup",
    "stream_bloom_dedup",
    "sink_orc_roundtrip",
    "w_ewma_time_decay",
    "text_bigram_logprob",
    "agg_kmv_set_ops",
    "stream_kmv_set_ops",
    "graph_triangle_count",
    "graph_clustering_coeff",
    "graph_ppr_topk",
    "sim_ivf_recall_report",
    "arrow_lang_stats",
    "sink_pyds_manifest_roundtrip",
    "stream_chained_window_agg",
    "stream_pyds_pipeline_manifest",
    "stream_python_datasource",
    "stream_session_dynamic_gap",
    "udaf_grouped_median",
    # -- new in round 8 (driver-verified the round they land) --
    "dedup_minhash_calibration",
    "pipeline_rollup_incremental",
    "pipeline_dataset_card",
    "w_cumulative_distinct",
    "agg_winsorized_stats",
    "j_interval_overlap",
    "emb_pq_assign",
    "sim_topk_pq_adc",
    "agg_approx_distinct_report",
    "stream_rollup_incremental",
    "sim_topk_ivf_pq",
    "pipeline_scd2_history",
    "agg_power_sums",
    "stream_moments_merge",
    "graph_degree_stats",
    "w_top_paths",
    "scalar_url_funcs",
    "multimodal_phash_pairs",
    "j_scd2_point_in_time",
    "text_hashing_vectorizer",
    "dedup_url_canonical",
    "sim_topk_ivf_pq_prebuilt",
    "pipeline_scd2_incremental",
    "stream_scd2_merge",
    "agg_mode_exact",
    "w_inter_event_gap_stats",
    "pipeline_mixture_weights",
    "agg_entropy_report",
    "w_retention_cohorts",
    "agg_gini_report",
    "text_novelty_report",
    "pipeline_curriculum_order",
    "agg_mad_outliers",
    "graph_link_prediction",
    "graph_label_propagation",
    "pipeline_perplexity_buckets",
    "pipeline_dedup_keep_best",
    "pipeline_shard_rendezvous",
    "stream_topk_per_window",
    "agg_bitmap_distinct",
    "stream_bitmap_merge",
    "graph_kcore",
    "sim_matryoshka_report",
    "j_asof_forward",
    "scalar_bitwise_funcs",
    "graph_bfs_distance",
    "text_vocab_stats",
    "pipeline_quality_funnel",
    "scalar_array_funcs",
    "w_login_streaks",
    "j_asof_tolerance",
    "sample_reservoir_merge",
    "stream_reservoir_merge",
    "w_time_weighted_avg",
    "j_asof_nearest",
    "agg_itemset_pairs",
    "pipeline_embedding_drift",
    "pipeline_padding_efficiency",
    "w_session_attribution",
    "agg_ab_test_report",
    "w_wow_change",
    "agg_cms_error_report",
    "sim_knn_classify",
    "pipeline_repeated_ngram_ratio",
    "w_rolling_distinct_users",
    "agg_markov_transitions",
    "graph_weighted_paths",
    "dedup_minhash_incremental",
    # -- rotation fill: longest-unsampled previously-green names --
    "q3_shipping_priority",
    "q4_order_priority",
    "q12_priority_shipping",
    "q18_large_volume_customers",
    "j_orders_customer",
    "j_broadcast_star",
    "j_semi",
    "j_anti",
    "j_full_outer",
    "j_asof",
    "j_range_bucket",
    "j_salted_skew",
    "j_null_safe",
    "j_null_skew_bypass",
    "agg_group_by_key",
    "agg_dedup_group_by_key",
    "agg_counts",
    "agg_shard_stats",
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_pivot_event_types",
    "w1_shard_order",
    "w_global_topn",
    "w_rank_funcs",
    "w_sessionize",
    "w_funnel_conversion",
    "w_gap_fill_hourly",
    "checkpoint_frontier",
    "remove_reprocessed",
    "u_union_merge",
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
