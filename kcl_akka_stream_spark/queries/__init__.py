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
#: (VERDICT r5 #2 .. r12 #1).  Round-13 rebuild: flagship + ALL 18
#: round-12 names never driver-sampled (waves 43-56, promised by this
#: file's own r12 comment and VERDICT r12 "Next round" #1) + 31 fill
#: ordered by longest-unsampled (last driver round ascending, then
#: alphabetical; computed from CORRECTNESS_r*.json) = exactly 50.  New
#: round-13 queries append AFTER this block and rotate into the r14
#: sample; each is judge-gated via tools/check_correctness.py the session
#: it lands.
_PRIORITY = [
    "q1_pricing_summary",
    # -- the 18 round-12 names never driver-sampled (waves 43-56) --
    "scd2_consistency_report",
    "multimodal_wav_header",
    "multimodal_mp4_header",
    "multimodal_png_dims",
    "pipeline_decontaminate_fuzzy",
    "pipeline_decontaminate_spans",
    "sample_dsir",
    "dedup_chain_audit",
    "dedup_span_coverage",
    "stream_minhash_merge",
    "text_min_k_prob",
    "privacy_k_anonymity_report",
    "sim_ivf_delta_serving",
    "w_trending_decay",
    "text_backoff_lm_score",
    "agg_cohens_kappa",
    "sim_mmr_rerank",
    "scalar_math_funcs",
    # -- rotation fill: 31 longest-unsampled (last sampled r5/r6) --
    "sim_topk_lsh",
    "sim_topk_vectorized",
    "sink_bucketed_join_roundtrip",
    "stream_dedup",
    "stream_stream_join",
    "stream_tumbling_agg",
    "text_langid",
    "text_quality",
    "text_quality_flags",
    "text_redact_pii",
    "u_intersect",
    "u_union_merge",
    "w_sessionize",
    "agg_cms_merged",
    "agg_hist_median",
    "agg_kmv_error_report",
    "cluster_kmeans_assign",
    "corpus_vocab_topk",
    "dedup_boilerplate_segments",
    "dedup_containment_pairs",
    "dedup_ngram_jaccard_capped",
    "dedup_savings_report",
    "dedup_simhash_pairs",
    "diag_key_skew",
    "emb_lang_centroids",
    "emb_near_dup",
    "emb_near_dup_block_report",
    "emb_near_dup_lsh",
    "j_anti",
    "j_null_safe",
    "j_null_skew_bypass",
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
