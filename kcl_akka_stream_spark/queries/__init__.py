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

#: Fixed anchor subset (VERDICT r15 #2): PERF_r15's per-query
#: round-over-round comparison came back empty (n_common=0) because the
#: 50-query correctness sample rotates FULLY each round -- two
#: consecutive samples shared only the flagship.  These anchors are
#: PERMANENT members of ``_PRIORITY`` (flagship + one per operator
#: family), pinned by tests/test_bench_stdout.py, so every pair of
#: consecutive driver correctness records shares at least these keys and
#: the driver's per-query gate is never empty.  Do NOT rotate them out.
ANCHORS = [
    "q1_pricing_summary",        # flagship (relational core)
    "agg_group_by_key",          # agg family
    "w_topk_per_group",          # window family
    "j_asof",                    # join family
    "dedup_minhash_lsh_capped",  # dedup family (production twin)
    "sim_topk_ivf_pq",           # sim family (full IVF-PQ serving path)
    "emb_near_dup",              # embedding family
    "text_quality",              # text family
    "graph_pagerank_topk",       # graph family
    "pipeline_clean_corpus",     # pipeline composition family
    "stream_tumbling_agg",       # streaming-twin family
    "multimodal_features",       # multimodal family
]

#: Samplers that take the first N registry entries (the driver's
#: correctness gate records 50) must see a REPRESENTATIVE slice, not just
#: whichever module imported first.  The sample ROTATES each round
#: (VERDICT r5 #2 .. r14 #1), EXCEPT the fixed ``ANCHORS`` block above
#: (VERDICT r15 #2).  Round-16 rebuild: 12 anchors + ALL 13 round-15
#: names never driver-sampled in CORRECTNESS_r01..r15 (waves 85-97) + 25
#: fill ordered by longest-unsampled (last driver round ascending, then
#: alphabetical; computed from CORRECTNESS_r*.json) = exactly 50.  New
#: queries would append AFTER this block -- r16 is an optimization round,
#: none land.
_PRIORITY = ANCHORS + [
    # -- the 13 round-15 names never driver-sampled (waves 85-97) --
    "text_pii_scan",
    "text_repetition_flags",
    "agg_chao1_richness",
    "agg_pr_auc",
    "text_brier_decomposition",
    "sample_pps_systematic",
    "w_cusum_drift",
    "text_mattr",
    "emb_effective_rank",
    "agg_wilcoxon_signed_rank",
    "multimodal_gif_header",
    "agg_runs_test",
    "w_record_extremes",
    # -- rotation fill: 25 longest-unsampled (last-sampled round asc, then name) --
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "scalar_variant_extract",
    "sink_csv_roundtrip",
    "sink_jsonl_roundtrip",
    "sink_zorder_roundtrip",
    "source_python_datasource",
    "stream_cdc_upsert",
    "stream_dedup_watermarked",
    "stream_hist_merge",
    "stream_left_outer_join",
    "text_oov_report",
    "text_unigram_logprob",
    "u_except_all",
    "u_intersect_all",
    "udtf_token_runs",
    "w_rolling_range_frame",
    "agg_approx_distinct_report",
    "agg_entropy_report",
    "agg_gini_report",
    "agg_kmv_set_ops",
    "agg_mode_exact",
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
