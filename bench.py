"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line on stdout: {"metric": ..., "value": total_steady_sec,
"unit": "sec", "n_queries": N, "cold_total": sec, "sf": ...}.  The
per-query breakdown ({name: steady_sec}, {name: cold_sec}, anti-pattern
baseline timings, fixture byte fingerprints) goes to a stderr
"# detail" line -- the stdout object is fixed-size scalars only, so the
driver's bounded tail capture can never truncate it (rounds 5 and 6 both
lost their official perf record to an oversized stdout line).  The same
detail record is also APPENDED as one JSON line to BENCH_DETAIL.jsonl
next to this file (VERDICT r8 #5), so per-query history survives in-repo
and round-over-round diffs never depend on re-runs.

Two timing columns per query (VERDICT r4: a 48s->2.4s "win" and a
0.8s->6.8s regression were both invisible to a single post-warmup
median):

- ``cold``  -- the FIRST execution in this JVM: codegen compilation,
  HotSpot C2 warmup of interpreted expressions, Python/Arrow worker
  spawn.  At 100 TB every fresh executor pays this, so a query whose
  cold time is many times its steady time is a scale bug even when the
  steady median looks good.  Shared infra (JVM, Arrow workers) does warm
  progressively across the cold pass, so later entries understate their
  true fresh-JVM cost -- the column is a per-round tripwire, not an
  absolute measurement.
- ``queries`` -- steady-state: per-query warmup, then median-of-3
  (single-pass local timings vary ~2x with JVM/GC noise; r1/r2 identical
  code measured 27.1s vs 15.1s).

``data_bytes`` fingerprints the fixture files so a timing swing caused
by driver-side testdata regeneration (the whole r4 story) is
distinguishable from a plan change.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kcl_akka_stream_spark.session import get_session

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "j_broadcast_star",
    "j_asof",
    "j_salted_skew",
    "agg_group_by_key",
    "agg_salted_skew",
    "w_topk_per_group",
    # reference semantics
    "checkpoint_frontier",
    # dedup family -- the capped variants are the 100 TB scale paths
    # (bounded fan-out)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_simhash",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_verified",
    "dedup_semantic_auto",
    # similarity search
    "sim_topk_bruteforce",
    "sim_topk_vectorized",
    "sim_topk_ivf",
    "sim_topk_ivf_prebuilt",
    "sim_topk_lsh",
    "emb_near_dup",
    "emb_near_dup_lsh_capped",
    # text analysis + multimodal
    "text_quality",
    "text_langid",
    "multimodal_features",
    # end-to-end pipeline composition + corpus export
    "pipeline_clean_corpus",
    "text_redact_pii",
    "pipeline_pack_tokens",
    "pipeline_decontaminate",
    # quality gate + corpus curation (round-3 additions)
    "text_quality_flags",
    "dedup_boilerplate_segments",
    "pipeline_rebalance_langs",
    "pipeline_source_cap",
    "sample_per_stratum",
    # sketches + clustering + quantization
    "agg_cms_heavy_hitters",
    "agg_kmv_distinct",
    "cluster_kmeans_step",
    "emb_quantize_int8",
    # decision-support joins
    "q3_shipping_priority",
    "q4_order_priority",
    "q12_priority_shipping",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q13_customer_distribution",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q22_global_sales_opportunity",
    "q21_suppliers_kept_waiting",
    "q15_top_supplier",
    "q11_important_supplier_value",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q20_excess_inventory_suppliers",
    # keyword extraction + multi-dim layout + ops tooling (round-6 additions)
    "pipeline_tfidf_topk",
    "sink_zorder_roundtrip",
    "dedup_edit_verified",
    "pipeline_snapshot_diff",
    "agg_approx_quantile_report",
    # end-to-end curation composite
    "pipeline_export_manifest",
    # LM scoring, tokenizer training, graph, outliers (round-6 wave 5)
    "text_unigram_logprob",
    "pipeline_bpe_top_pairs",
    "graph_pagerank_topk",
    "agg_outlier_zscore",
    "w_rolling_range_frame",
    # extension seams
    "arrow_doc_stats",
    "udtf_token_runs",
    "j_lateral_topk",
    "scalar_variant_extract",
    # round-7 additions: bloom-pruned incremental dedup, ORC roundtrip,
    # exact EWMA, bigram LM, sketch set algebra, triangles, ANN recall
    "pipeline_bloom_dedup",
    "sink_orc_roundtrip",
    "w_ewma_time_decay",
    "text_bigram_logprob",
    "agg_kmv_set_ops",
    "graph_triangle_count",
    "graph_clustering_coeff",
    "graph_ppr_topk",
    "sim_ivf_recall_report",
    # round-8 additions: dedup/ANN acceptance contracts, incremental
    # rollup, dataset card, robust stats, interval overlap, PQ encode+ADC
    "dedup_minhash_calibration",
    "pipeline_rollup_incremental",
    "pipeline_dataset_card",
    "w_cumulative_distinct",
    "agg_winsorized_stats",
    "j_interval_overlap",
    "emb_pq_assign",
    "sim_topk_pq_adc",
    "agg_approx_distinct_report",
    # round-8 wave 3: full IVF-PQ serving, SCD2 history, exact moment
    # states, degree diagnostics, path mining, URL parsing
    "sim_topk_ivf_pq",
    "pipeline_scd2_history",
    "agg_power_sums",
    "graph_degree_stats",
    "w_top_paths",
    "scalar_url_funcs",
    # round-8 wave 4: binary-payload near-dup, SCD2 serving, feature
    # hashing, URL canonicalization
    "multimodal_phash_pairs",
    "j_scd2_point_in_time",
    "text_hashing_vectorizer",
    "dedup_url_canonical",
    "sim_topk_ivf_pq_prebuilt",
    "pipeline_scd2_incremental",
    "agg_mode_exact",
    "w_inter_event_gap_stats",
    # round-8 wave 6: mixture apportionment, diversity entropy,
    # retention cohorts, inequality
    "pipeline_mixture_weights",
    "agg_entropy_report",
    "w_retention_cohorts",
    "agg_gini_report",
    "text_novelty_report",
    "pipeline_curriculum_order",
    # round-8 wave 8: robust outliers, link prediction, communities,
    # perplexity buckets, representative selection, HRW sharding
    "agg_mad_outliers",
    "graph_link_prediction",
    "graph_label_propagation",
    "pipeline_perplexity_buckets",
    "pipeline_dedup_keep_best",
    "pipeline_shard_rendezvous",
    # round-8 wave 9: exact mergeable bitmap distinct, k-core, matryoshka
    # retrieval audit, forward as-of, bitwise scalars
    "agg_bitmap_distinct",
    "graph_kcore",
    "sim_matryoshka_report",
    "j_asof_forward",
    "scalar_bitwise_funcs",
    # round-8 wave 10: BFS blast radius, Zipf vocab card, curation funnel
    "graph_bfs_distance",
    "text_vocab_stats",
    "pipeline_quality_funnel",
    "scalar_array_funcs",
    "w_login_streaks",
    "j_asof_tolerance",
    # round-8 wave 13: mergeable reservoir sample, TWA, nearest as-of,
    # brand co-occurrence, centroid drift, padding audit
    "sample_reservoir_merge",
    "w_time_weighted_avg",
    "j_asof_nearest",
    "agg_itemset_pairs",
    "pipeline_embedding_drift",
    "pipeline_padding_efficiency",
    # round-8 wave 14: attribution matrix, A/B readout, WoW trend, CMS
    # acceptance contract, kNN classify
    "w_session_attribution",
    "agg_ab_test_report",
    "w_wow_change",
    "agg_cms_error_report",
    "sim_knn_classify",
    # round-8 wave 15: Gopher repetition gate, rolling distinct actives,
    # Markov transition matrix
    "pipeline_repeated_ngram_ratio",
    "w_rolling_distinct_users",
    "agg_markov_transitions",
    # round-8 wave 16: bounded Bellman-Ford, incremental LSH dedup
    "graph_weighted_paths",
    "dedup_minhash_incremental",
    # round-8 wave 17: exact bitmap set algebra, SPC anomaly gate, regex
    # surface, Rocchio classification, Poisson bootstrap CI
    "agg_bitmap_set_ops",
    "w_anomaly_trailing_zscore",
    "scalar_regex_funcs",
    "sim_centroid_classify",
    "agg_bootstrap_ci",
    # round-9 wave 18: weighted median, Pearson stats, DP counts, cosine
    # range search, RAKE keywords
    "agg_weighted_median",
    "agg_pearson_corr",
    "agg_dp_noised_counts",
    "sim_range_search",
    "text_rake_keywords",
    # round-9 wave 19: HITS, seasonality matrix, calendar lag features
    "graph_hits_topk",
    "w_seasonality_profile",
    "w_lag_features",
    # round-9 wave 20: mergeable quantile contract, assortativity, T5 spans
    "agg_bucket_quantile_contract",
    "graph_degree_assortativity",
    "pipeline_span_corruption",
    # round-9 wave 21: KL drift monitor, hard negatives, percent-rank norm
    "agg_histogram_kl_drift",
    "pipeline_hard_negatives",
    "w_percent_rank_normalize",
    # round-9 wave 22: map-function scalar surface
    "scalar_map_funcs",
    # round-9 wave 23: tokenizer fertility, Benford data-quality audit
    "text_tokenizer_fertility",
    "agg_benford_deviation",
    # the remaining TPC-H trio -- all 22 decision-support queries headline
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    # streaming representative
    "stream_tumbling_agg",
    # round-10 wave 24: KS drift (+streaming twin), Gini, CUSUM changepoint,
    # entropy profile, MIPS serving, corpus density/charset cards, prefix
    # dedup blocker, cross-language vocab overlap
    "agg_ks_drift",
    "stream_ks_merge",
    "agg_gini_concentration",
    "w_cusum_changepoint",
    "agg_entropy_profile",
    "sim_mips_topk",
    "pipeline_tokens_per_byte",
    "text_charset_profile",
    "dedup_prefix_digest",
    "text_lang_vocab_jaccard",
    # round-10 wave 25: association tests, rank fusion, order-aware ANN
    # acceptance, reciprocity (+ streaming entropy twin)
    "agg_mutual_information",
    "agg_chi_square_independence",
    "sim_rrf_fusion",
    "sim_ndcg_eval",
    "graph_reciprocity",
    "stream_entropy_merge",
    # round-10 wave 26: heavy-tail index, conditional recency, sorted-
    # neighborhood blocking, streaming MI twin
    "agg_hill_tail_index",
    "w_time_since_event",
    "dedup_sorted_neighborhood",
    "stream_mi_merge",
    # round-10 wave 27: LSH recall contract, error-safe scalar surface
    "sim_lsh_recall_report",
    "scalar_try_funcs",
    # round-10 wave 28: OHLC bars, regression-residual outliers
    "w_ohlc_bars",
    "agg_ols_residual_outliers",
    # round-10 wave 29: lag-1 autocorrelation, lattice-merge OHLC twin
    "agg_autocorr_lag1",
    "stream_ohlc_merge",
    # round-10 wave 30: PMI collocations, day-of-week decomposition
    "text_pmi_collocations",
    "w_seasonal_decompose",
    # round-11 wave 31: containment dedup, rank drift, Welch A/B,
    # temperature mixture, epoch shuffle, readability
    "dedup_containment_verified",
    "agg_mann_whitney",
    "agg_welch_ttest",
    "pipeline_mixture_temperature",
    "corpus_epoch_shuffle",
    "text_readability",
    # round-11 wave 32: rule attribution, binary magic sniff, robust
    # trimmed mean, gaps-and-islands streaks
    "pipeline_filter_attribution",
    "multimodal_magic_sniff",
    "agg_trimmed_mean",
    "w_streaks",
    # round-11 wave 33: PSI drift, Hamilton apportionment, top-k lattice twin
    "agg_psi_drift",
    "pipeline_token_apportionment",
    "stream_topk_merge",
    # round-11 wave 34: Markov transitions, posting-list boolean
    # retrieval, clustering inertia acceptance
    "w_markov_transitions",
    "text_boolean_retrieval",
    "cluster_inertia_report",
    # round-11 wave 35: cascade accounting, embedding dim QA, user capping
    "pipeline_dedup_cascade_report",
    "emb_dim_stats",
    "sample_user_cap",
    # round-11 wave 36: session-interval lattice twin, null-safe join
    "stream_session_merge",
    "j_null_safe_eq",
    # round-11 wave 37: BM25 ranking, dedup threshold calibration
    "text_bm25_topk",
    "dedup_threshold_sweep",
    # round-11 wave 38: quantile normalization
    "agg_quantile_normalize",
    # round-11 wave 39: Neyman allocation, Jensen-Shannon divergence
    "sample_neyman_allocation",
    "text_js_divergence",
    # round-11 wave 40: LSH band sweep, modularity acceptance, Simpson
    "dedup_band_config_sweep",
    "graph_modularity_report",
    "agg_simpson_diversity",
    # round-11 wave 41: Bloom FPR acceptance, edit scalars, outage gaps
    "dedup_bloom_fpr_report",
    "scalar_edit_funcs",
    "w_max_silence",
    # round-11 wave 42: hourly volume anomaly, Zipf slope fit
    "w_volume_anomaly",
    "text_zipf_slope",
    # round-12 wave 43: SCD2 acceptance contract, container-header census
    "scd2_consistency_report",
    "multimodal_wav_header",
    "multimodal_mp4_header",
    # round-12 wave 44: MinHash-LSH decontamination twin + coverage report
    "pipeline_decontaminate_fuzzy",
    # round-12 wave 45: PNG dims census, DSIR importance resampling
    "multimodal_png_dims",
    "sample_dsir",
    # round-12 wave 46: CC chaining acceptance, exact-substring coverage
    "dedup_chain_audit",
    "dedup_span_coverage",
    # round-12 wave 47: minhash signature min-lattice (19th family)
    "stream_minhash_merge",
    # round-12 wave 48: Min-K% Prob memorization screen
    "text_min_k_prob",
    # round-12 wave 49: k-anonymity / l-diversity release gate
    "privacy_k_anonymity_report",
    # round-12 wave 50: ANN index freshness (base IVF + brute delta)
    "sim_ivf_delta_serving",
    # round-12 wave 51: exact half-life trending leaderboard
    "w_trending_decay",
    # round-12 wave 52: stupid-backoff held-out LM gate
    "text_backoff_lm_score",
    # round-12 wave 53: Cohen's kappa annotation agreement
    "agg_cohens_kappa",
    # round-12 wave 54: MMR diversified re-ranking
    "sim_mmr_rerank",
    # round-12 wave 55: math scalar family
    "scalar_math_funcs",
    # round-12 wave 56: span-level decontamination accounting
    "pipeline_decontaminate_spans",
    # round-13 wave 57: JPEG SOF walk + MP3 frame census (big-five complete)
    "multimodal_jpeg_dims",
    "multimodal_mp3_header",
    # round-13 wave 58: model-based quality scorer (hashed NB log-odds)
    "text_quality_model_scores",
    "text_quality_model_report",
    # round-13 wave 59: greedy k-center diversity selection
    "sample_kcenter_diverse",
    # round-13 wave 60: Bloom OR-lattice (20th mergeable family)
    "stream_bloom_merge",
    # round-13 wave 61: exact rank statistics
    "agg_spearman_corr",
    "agg_kendall_tau",
    # round-13 wave 62: robust trend + unseen-mass estimate
    "agg_theil_sen",
    "text_good_turing",
    # round-13 wave 63: DoReMi-lite excess-loss domain reweighting
    "pipeline_doremi_weights",
    # round-13 wave 64: winnowing/MOSS local fingerprints
    "dedup_winnowing",
    # round-13 wave 65: int8 two-stage serving + recall contract
    "sim_topk_int8_rescore",
    "sim_int8_recall_report",
    # round-13 wave 66: association effect size + semantic outlier triage
    "agg_cramers_v",
    "emb_centroid_outliers",
    # round-13 wave 67: TextRank keywords (graph iterations over text)
    "text_textrank_keywords",
    # round-13 wave 68: robust location + coreset weights
    "agg_hodges_lehmann",
    "sample_kcenter_weights",
    # round-13 wave 69: calendar scalar family
    "scalar_calendar_funcs",
    # round-13 wave 70: quartile fences + term burstiness
    "agg_tukey_fences",
    "text_burstiness",
    # round-13 wave 71: Rocchio pseudo-relevance feedback
    "sim_rocchio_expansion",
    # round-14 wave 72: mergeable quantile summary (21st state family)
    "stream_quantile_merge",
    # round-14 wave 73: HyperLogLog (batch + 22nd state family)
    "agg_hll_estimate",
    "stream_hll_merge",
    # round-14 wave 74: AMS F2 self-join-size sketch (batch + 23rd family)
    "agg_f2_sketch",
    "stream_f2_merge",
    # round-14 wave 75: threshold-free quality-model acceptance
    "text_quality_model_auc",
    # round-14 wave 76: Kneser-Ney smoothed bigram LM
    "text_kneser_ney",
    # round-14 wave 77: content-defined chunking dedup (Rabin anchors)
    "dedup_cdc_chunks",
    # round-14 wave 78: isotonic (PAV) score calibration
    "text_quality_model_calibration",
    # round-14 wave 79: Dirichlet-smoothed query likelihood
    "text_dirichlet_ql",
    # round-14 wave 80: PPJoin prefix-filtering similarity join
    "dedup_prefix_filter_pairs",
    # round-14 wave 81: weight-of-evidence / information value
    "agg_woe_iv",
    # round-14 wave 82: Hilbert-curve layout sink
    "sink_hilbert_layout",
    # round-14 wave 83: exact-integer power-iteration PC1
    "emb_power_iteration_pc1",
    # round-14 wave 84: Heaps'-law 3-gram vocabulary-growth fit
    "text_heaps_law",
    # round-15 wave 85: PII census + redaction sizing
    "text_pii_scan",
    # round-15 wave 86: within-doc repetition flags (Gopher class)
    "text_repetition_flags",
    # round-15 wave 87: Chao1 unseen-vocabulary richness
    "agg_chao1_richness",
    # round-15 wave 88: exact tie-corrected average precision
    "agg_pr_auc",
    # round-15 wave 89: Murphy decomposition of the Brier score
    "text_brier_decomposition",
    # round-15 wave 90: systematic PPS sampling on distributed_cumsum
    "sample_pps_systematic",
    # round-15 wave 91: CUSUM drift via the prefix-min identity
    "w_cusum_drift",
    # round-15 wave 92: moving-average type-token ratio
    "text_mattr",
    # round-15 wave 93: participation-ratio effective rank
    "emb_effective_rank",
    # round-15 wave 94: Wilcoxon signed-rank paired test
    "agg_wilcoxon_signed_rank",
    # round-15 wave 95: GIF header census (6th container parser)
    "multimodal_gif_header",
    # round-15 wave 96: Wald-Wolfowitz runs test (serial randomness)
    "agg_runs_test",
    # round-15 wave 97: record-breaking extremes vs harmonic expectation
    "w_record_extremes",
]

# Labeled anti-pattern baselines (VERDICT r6 #3): kept deliberately as
# quadratic contrast twins of their capped/auto production paths, but NOT
# part of the headline total -- their cost is a property of the documented
# anti-pattern, not of the engine.  Timed in a separate pass, reported
# only on the stderr detail line.
BASELINES = [
    "dedup_ngram_jaccard",  # uncapped quadratic shingle-join baseline
    "dedup_semantic",       # frozen-k SemDeDup (quadratic per cluster)
    "emb_near_dup_lsh",     # frozen lsh_dims=4 (SCALE_PROBE: 19x at 10x --
                            # block sizes grow with corpus under frozen
                            # dims); capped twin is the headline path
]


def _noop_write(df) -> None:
    # noop sink materializes every output column (count() would let
    # Catalyst prune the computed projections away).
    df.write.format("noop").mode("overwrite").save()


def _calibrate(spark, sf_dir: str, reps: int = 3) -> float:
    """Contention tripwire (VERDICT r7 #2): a FIXED workload -- the
    region.parquet count plus a 20M-row in-memory integer aggregation
    across 32 tasks -- whose cost depends only on the host, never on the
    query set.  Timed at the start AND end of the run; an inflated
    calibration marks the whole record as environment-contended (the r7
    driver record was uniformly 2-4x inflated with nothing in the record
    to distinguish that from a real regression).  Median of 3 at the
    endpoints and the interleaved mid-run segment probes (VERDICT r13
    #2) alike; reps=1 remains available for ad-hoc cheap probes."""
    times = []
    for _ in range(reps):
        t0 = time.time()
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).collect()
        times.append(time.time() - t0)
    return round(sorted(times)[len(times) // 2], 3)


#: Calibration threshold separating idle from contended runs on this
#: host, applied to the END calibration only: the START calibration runs
#: right after session creation and rides JVM/codegen warmup (every
#: trusted-idle record in history starts at 0.41-0.63 s), while the END
#: value reflects the environment the timed queries actually saw --
#: measured idle ends at <= ~0.29 s, the r7 contended record's
#: calibrations were uniformly 2-4x higher.  VERDICT r11 #4: the final
#: r11 record ended at 0.292 s (under the old 0.35) yet carried ~10-15%
#: uniform drift vs the best idle record -- 0.29 demonstrably coexists
#: with visible contention, so the threshold tightens to 0.30: records
#: ending above it are flagged.  When several records exist, the round's
#: number is chosen by :func:`elect_record` (VERDICT r14 #1), NOT by the
#: lowest end calibration alone -- see that function's docstring for the
#: current rule and why the end-cal proxy was demoted to a tiebreaker.
CONTENDED_CAL_SEC = 0.30

#: VERDICT r13 #2: the r13 driver record carried a 32.5 s mid-run
#: contention burst (12 dedup/sim queries inflated 2-9x) that BOTH
#: start/end calibrations missed (0.379 / 0.204, under threshold) -- a
#: transient burst is invisible to endpoint probes.  The steady pass now
#: interleaves a GC-settled median-of-3 calibration probe every
#: SEGMENT_EVERY queries; any segment probe above SEGMENT_CAL_SEC marks
#: the record contended.  Mid-run probes still ride adjacent-query JVM
#: state the endpoints never see, so the segment threshold sits above
#: CONTENDED_CAL_SEC -- it exists to catch 2-4x bursts like r13's, not
#: to re-litigate the endpoint rule.
SEGMENT_EVERY = 25
SEGMENT_CAL_SEC = 0.45

#: Retime rule (VERDICT r13 #2, second half): a steady median more than
#: RETIME_FACTOR x its own cross-record median (idle records only, same
#: sf, from BENCH_DETAIL.jsonl) is re-measured once and the MINIMUM of
#: the two medians is recorded -- a transient burst cannot survive two
#: separated median-of-3 measurements.  The absolute floor keeps
#: sub-second noise (0.05 -> 0.12 s) from triggering pointless re-runs.
#: VERDICT r15 #6 tightened the factor 2.0 -> 1.5: the r15 32-core record
#: carried position-correlated bursts the segments missed (backoff 2.64 s
#: at 32c vs 0.93 s at 8c -- a ~1.9x inflation invisible to the 2x rule),
#: and the retime count now rides the one-line stdout JSON (n_retimed) so
#: burst-repair activity is visible in the official record.
RETIME_FACTOR = 1.5
RETIME_FLOOR_SEC = 0.5


def contended_flag(
    cal_start: float, cal_end: float, segments: list[float] | None = None
) -> bool:
    """True when the record ran on a contended host: END calibration over
    threshold (START rides JVM warmup and never counts), OR any mid-run
    segment probe over its own threshold -- the r13 failure mode where a
    transient burst sits entirely between two clean endpoints."""
    if cal_end > CONTENDED_CAL_SEC:
        return True
    return any(s > SEGMENT_CAL_SEC for s in (segments or []))


#: Tie window for :func:`elect_record`: totals within 0.5% of each other
#: are indistinguishable at this host's run-to-run jitter (six clean r14
#: records on identical plans bracketed 0.818-0.901 s/q, ~10% spread),
#: so only then does the end calibration break the tie.
ELECT_TIE_REL = 0.005


def elect_record(records: list[dict]) -> dict | None:
    """Record-of-record election (VERDICT r14 #1): pick the round's
    official bench number from the candidate records.

    The r12-r14 rule ("lowest end calibration wins") twice elected the
    SLOWER of two median-equivalent records (r14: D 256.9 s over C
    247.6 s with per-query median ratio 1.004; F 252.4 s over E 233.9 s
    at median 1.068) -- the end calibration measures the host at one
    instant AFTER the run, not the run itself.  With mid-run segment
    probes now instrumented, cleanliness is a GATE, not a ranking:

    1. eligible = records that are NOT contended (end calibration <=
       CONTENDED_CAL_SEC and every segment probe <= SEGMENT_CAL_SEC)
       and that cover the FULL headline (n_queries == the max over
       candidates -- a partial re-run cannot beat a full record).
    2. elect the LOWEST total among eligible records.
    3. the end calibration breaks ties only: totals within
       ELECT_TIE_REL of the best are a tie -> lowest cal_end wins.

    Each record dict carries ``total`` (sec), ``cal_start``, ``cal_end``,
    ``segments`` (list of mid-run probe seconds), ``n_queries``.
    Returns the elected record, or None when no record is eligible
    (all contended / empty input) -- re-run on an idle host instead of
    shipping a flagged number."""
    if not records:
        return None
    full = max(r.get("n_queries", 0) for r in records)
    eligible = [
        r
        for r in records
        if r.get("n_queries", 0) == full
        and not contended_flag(
            r.get("cal_start", 0.0),
            r.get("cal_end", float("inf")),
            r.get("segments"),
        )
    ]
    if not eligible:
        return None
    best_total = min(r["total"] for r in eligible)
    tied = [
        r
        for r in eligible
        if r["total"] <= best_total * (1.0 + ELECT_TIE_REL)
    ]
    return min(tied, key=lambda r: (r.get("cal_end", float("inf")), r["total"]))


def history_medians(detail_path: str, sf: float | None) -> dict[str, float]:
    """Per-query cross-record steady medians from BENCH_DETAIL.jsonl,
    using only records at the same sf that were NOT flagged contended.
    Empty dict (no retiming) when the file is missing or no clean record
    exists -- the rule needs history to compare against."""
    import statistics

    by_query: dict[str, list[float]] = {}
    try:
        with open(detail_path) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("contended") or rec.get("sf") != sf:
                    continue
                for name, sec in (rec.get("queries") or {}).items():
                    by_query.setdefault(name, []).append(float(sec))
    except OSError:
        return {}
    return {n: statistics.median(v) for n, v in by_query.items()}


def needs_retime(measured: float, hist_median: float | None) -> bool:
    """A steady median this far above its own cross-record history is a
    suspected transient burst, not a plan change -- re-measure it."""
    if hist_median is None or measured < RETIME_FLOOR_SEC:
        return False
    return measured > RETIME_FACTOR * hist_median


def record_identity(
    repo_dir: str,
    cal_start: float,
    cal_end: float,
    cal_segments: list[float] | None = None,
) -> dict:
    """Self-describing BENCH_DETAIL record identity (VERDICT r9 #3): git
    sha, UTC wall timestamp, a round hint (SPARK_GRAFT_ROUND env when the
    driver sets it, else inferred as 1 + the highest BENCH_r{N}.json
    already committed -- bench runs before the driver writes the new
    record), and an idle/contended flag from the calibration tripwire."""
    try:
        import subprocess

        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=repo_dir, capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        sha = None
    round_hint = os.environ.get("SPARK_GRAFT_ROUND")
    if round_hint is None:
        import re as _re

        seen = [
            int(m.group(1))
            for f in os.listdir(repo_dir)
            if (m := _re.fullmatch(r"BENCH_r(\d+)\.json", f))
        ]
        round_hint = str(max(seen) + 1) if seen else None
    return {
        "sha": sha,
        "round": int(round_hint) if round_hint else None,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "contended": contended_flag(cal_start, cal_end, cal_segments),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import TABLE_NAMES

    spark = get_session("bench")
    # Warm the JVM + parquet footers with a trivial action so the cold
    # column measures the queries, not session startup.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    cal_start = _calibrate(spark, sf_dir)

    # Cold pass: first execution of each query in this JVM, timed.
    cold: dict[str, float] = {}
    for name in HEADLINE + BASELINES:
        # drop cached relations left by earlier queries (some operators
        # cache eagerly) so each query is timed against its own working set
        spark.catalog.clearCache()
        t0 = time.time()
        _noop_write(QUERIES[name](spark, sf_dir))
        cold[name] = round(time.time() - t0, 3)
        print(f"# cold {name}: {cold[name]:.3f}s", file=sys.stderr)

    # Steady pass: per-query warmup immediately before timing (C2 JIT
    # needs a few million evaluations to compile interpreted expression
    # call sites; the cold pass above is too far removed to cover it),
    # then median-of-3.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.jsonl"
    )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    hist = history_medians(detail_path, float(sf) if sf else None)

    def _steady_median(fn):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        _noop_write(fn(spark, sf_dir))
        times = []
        for _ in range(3):
            t0 = time.time()
            _noop_write(fn(spark, sf_dir))
            times.append(time.time() - t0)
        return round(sorted(times)[1], 3), times

    per_query: dict[str, float] = {}
    baselines: dict[str, float] = {}
    cal_segments: list[float] = []
    retimed: dict[str, list[float]] = {}
    for i, name in enumerate(HEADLINE + BASELINES):
        fn = QUERIES[name]
        # nudge GC between queries so accumulated garbage from earlier plans
        # is not collected inside someone else's timed section, and drop
        # cached relations so no query's timed runs fight earlier queries'
        # resident blocks for storage memory (within-query cache reuse
        # across the warmup + 3 timed runs is preserved)
        med, times = _steady_median(fn)
        # VERDICT r13 #2: a median >2x its own cross-record idle history
        # is a suspected transient burst -- re-measure once, keep the min
        # (baselines are excluded: their anti-pattern timings are the
        # product, not a contention signal)
        if name not in BASELINES and needs_retime(med, hist.get(name)):
            med2, _ = _steady_median(fn)
            retimed[name] = [med, med2]
            print(
                f"# retime {name}: {med:.3f}s > {RETIME_FACTOR}x history "
                f"median {hist[name]:.3f}s -> re-measured {med2:.3f}s",
                file=sys.stderr,
            )
            med = min(med, med2)
        target = baselines if name in BASELINES else per_query
        target[name] = med
        print(f"# {name}: {target[name]:.3f}s (runs: "
              f"{', '.join(f'{t:.3f}' for t in times)})", file=sys.stderr)
        # interleaved contention probe (VERDICT r13 #2): every
        # SEGMENT_EVERY queries, a GC-settled median-of-3 of the fixed
        # workload -- a mid-run burst invisible to the start/end
        # endpoints shows up here and flags the record.  GC first so the
        # probe measures the host, not the previous query's garbage.
        if (i + 1) % SEGMENT_EVERY == 0:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            seg = _calibrate(spark, sf_dir)
            cal_segments.append(seg)
            print(f"# cal-segment after {i + 1} queries: {seg:.3f}s",
                  file=sys.stderr)

    data_bytes = {}
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            data_bytes[t] = os.path.getsize(p)

    total = round(sum(per_query.values()), 3)
    cal_end = _calibrate(spark, sf_dir)
    # Detail record (per-query steady + cold times, anti-pattern baseline
    # timings, fixture byte sizes) goes to stderr.  stdout carries ONLY
    # the tiny summary object (VERDICT r6 #1: rounds 5 AND 6 both came
    # back parsed:null because the per-query dict grew past the driver's
    # 2,000-char tail capture -- at 75 headline queries the queries dict
    # alone was 2,367 bytes).  summary_line() is the single source of
    # truth; tests/test_bench_stdout.py asserts it stays under 1 KB no
    # matter how large HEADLINE grows.  Printed LAST so a tail capture
    # always sees a complete JSON object.
    print(
        "# detail "
        + json.dumps(
            {
                "queries": per_query,
                "cold": cold,
                "baselines": baselines,
                "data_bytes": data_bytes,
            }
        ),
        file=sys.stderr,
    )
    headline_cold = {k: v for k, v in cold.items() if k not in BASELINES}
    # Persist the full per-query detail IN-REPO (VERDICT r8 #5): the
    # driver's 2 KB stdout tail capture truncates the 140+-query dict, so
    # round-over-round per-query comparison previously required judge
    # re-runs.  One JSON line appended per bench invocation -- the file is
    # the durable per-query history; the stderr detail line stays for
    # humans watching the run.
    detail_record = {
        **record_identity(
            os.path.dirname(os.path.abspath(__file__)),
            cal_start,
            cal_end,
            cal_segments,
        ),
        "sf": float(sf) if sf else None,
        "n_queries": len(per_query),
        "total_steady_sec": total,
        "cold_total_sec": round(sum(headline_cold.values()), 3),
        "calibration_start_sec": cal_start,
        "calibration_end_sec": cal_end,
        "cal_segments": cal_segments,
        "retimed": retimed,
        "queries": per_query,
        "cold": cold,
        "baselines": baselines,
        "data_bytes": data_bytes,
    }
    with open(detail_path, "a") as fh:
        fh.write(json.dumps(detail_record, sort_keys=True) + "\n")
    print(
        summary_line(
            per_query, headline_cold, sf, cal_start, cal_end, cal_segments,
            n_retimed=len(retimed),
        )
    )


def summary_line(
    per_query: dict,
    cold: dict,
    sf: str,
    cal_start: float = 0.0,
    cal_end: float = 0.0,
    cal_segments: list[float] | None = None,
    n_retimed: int = 0,
) -> str:
    """The ONE stdout JSON line.  Fixed-size: aggregate scalars only --
    never a per-query collection, so growth of HEADLINE cannot overflow
    the driver's bounded tail capture again.  ``calibration_*_sec`` are
    the fixed-workload tripwire times (start / end of the run);
    ``calibration_seg_max_sec`` is the WORST interleaved mid-run probe
    (VERDICT r13 #2) -- compare them round-over-round to tell host
    contention (including transient bursts the endpoints miss) from
    plan regressions.  ``n_retimed`` (VERDICT r15 #6) counts queries
    whose first steady median tripped the retime rule -- a high count
    means the record visibly repaired burst-inflated entries."""
    return json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": round(sum(per_query.values()), 3),
            "unit": "sec",
            "n_queries": len(per_query),
            "cold_total": round(sum(cold.values()), 3),
            "calibration_start_sec": cal_start,
            "calibration_end_sec": cal_end,
            "calibration_seg_max_sec": (
                max(cal_segments) if cal_segments else None
            ),
            "n_retimed": n_retimed,
            "sf": float(sf) if sf else None,
        }
    )


if __name__ == "__main__":
    main()
