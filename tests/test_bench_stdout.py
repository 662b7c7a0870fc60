"""The bench stdout line must stay small enough for the driver's bounded
tail capture (~2,000 chars).  Rounds 5 and 6 both produced
``BENCH_r{N}.json parsed: null`` because the stdout JSON carried per-query
dicts that grew with the headline set (2,367 bytes at 75 queries).  The
invariant locked here: ``bench.summary_line`` emits fixed-size scalars
only, under 1,000 bytes REGARDLESS of how many queries feed it.
"""

from __future__ import annotations

import json
import os

import bench


def test_bench_stdout_is_tiny_even_with_huge_headline():
    # Simulate a headline set 10x the current size: the summary must not
    # grow with it.
    per_query = {f"query_name_{i:04d}": 1.234 for i in range(1000)}
    cold = {f"query_name_{i:04d}": 9.876 for i in range(1000)}
    line = bench.summary_line(per_query, cold, "0.1", 0.123, 0.456)
    assert len(line.encode()) < 1000, (
        f"bench stdout line is {len(line.encode())} bytes; the driver tail "
        "capture truncates past ~2000 and the official record comes back "
        "parsed:null (r5, r6)"
    )
    obj = json.loads(line)
    # The required driver keys, and NO per-query collection.
    assert obj["metric"] == "headline_queries_total_runtime"
    assert obj["unit"] == "sec"
    assert isinstance(obj["value"], float)
    assert obj["n_queries"] == 1000
    assert "queries" not in obj
    # the contention tripwire scalars (VERDICT r7 #2) ride the same line
    assert obj["calibration_start_sec"] == 0.123
    assert obj["calibration_end_sec"] == 0.456
    for v in obj.values():
        assert not isinstance(v, (dict, list))


def test_headline_set_excludes_documented_antipatterns():
    # VERDICT r6 #3 + r7 #4: the repo documents dedup_ngram_jaccard
    # (uncapped), dedup_semantic (frozen-k) and emb_near_dup_lsh (frozen
    # lsh_dims=4 -- SCALE_PROBE's 19x-at-10x row) as anti-pattern
    # baselines; they must not sit in the headline total they exist to
    # contrast.  Membership pinned BOTH ways.
    expected_baselines = {
        "dedup_ngram_jaccard",
        "dedup_semantic",
        "emb_near_dup_lsh",
    }
    assert set(bench.BASELINES) == expected_baselines
    for name in expected_baselines:
        assert name not in bench.HEADLINE
    # their production twins DO stay headline
    assert "dedup_ngram_jaccard_capped" in bench.HEADLINE
    assert "dedup_semantic_auto" in bench.HEADLINE
    assert "emb_near_dup_lsh_capped" in bench.HEADLINE


def test_every_headline_query_is_registered():
    from kcl_akka_stream_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE + bench.BASELINES if n not in QUERIES]
    assert not missing, f"headline names not in registry: {missing}"


def test_norm_cell_is_looser_than_bit_exact():
    # VERDICT r6 #8: tools/check_correctness.py normalizes floats to 10
    # significant digits while the driver hashes without normalization.
    # This pins the exact masking window so the documented caveat cannot
    # silently drift: values differing at the 11th significant digit
    # compare EQUAL locally (the driver would see a mismatch), values
    # differing at the 10th do not.  Registry conventions therefore
    # require query floats to be single-IEEE-op or rounded in-query.
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_correctness",
        os.path.join(os.path.dirname(__file__), "..", "tools", "check_correctness.py"),
    )
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    a = 0.12345678911  # differs from b at the 11th significant digit
    b = 0.12345678914  # (both round to the same 10-sig-digit string)
    assert a != b
    assert cc._norm_cell(a) == cc._norm_cell(b)  # local gate: masked
    c = 0.1234567891  # differs at the 10th significant digit
    d = 0.1234567892
    assert cc._norm_cell(c) != cc._norm_cell(d)  # local gate: caught


def test_priority_rotation_names_all_registered():
    # The driver's 50-row correctness sample takes the first N registry
    # entries after _PRIORITY reordering; a typo in _PRIORITY silently
    # shrinks the front-loaded never-sampled set (the _reorder helper
    # drops unknown names rather than failing).  Pin every name.
    from kcl_akka_stream_spark.queries import QUERIES, _PRIORITY

    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    # and the rotation really front-loads: the first 50 sampled entries
    # must include ALL 18 round-12 names never driver-sampled in
    # CORRECTNESS_r01..r12 (VERDICT r12 "Next round" #1's acceptance bar),
    # plus exactly 31 rotation-fill names -- 1 flagship + 18 + 31 == 50
    assert len(_PRIORITY) == 50
    first50 = set(list(QUERIES)[:50])
    never_sampled = set(_PRIORITY[1:19])
    assert len(never_sampled) == 18
    # pin every wave-43..56 name so a partial rotation is caught
    for name in (
        "scd2_consistency_report",        # wave 43
        "multimodal_wav_header",          # wave 43
        "multimodal_mp4_header",          # wave 43
        "pipeline_decontaminate_fuzzy",   # wave 44
        "multimodal_png_dims",            # wave 45
        "sample_dsir",                    # wave 45
        "dedup_chain_audit",              # wave 46
        "dedup_span_coverage",            # wave 46
        "stream_minhash_merge",           # wave 47
        "text_min_k_prob",                # wave 48
        "privacy_k_anonymity_report",     # wave 49
        "sim_ivf_delta_serving",          # wave 50
        "w_trending_decay",               # wave 51
        "text_backoff_lm_score",          # wave 52
        "agg_cohens_kappa",               # wave 53
        "sim_mmr_rerank",                 # wave 54
        "scalar_math_funcs",              # wave 55
        "pipeline_decontaminate_spans",   # wave 56
    ):
        assert name in never_sampled, name
    assert never_sampled <= first50, sorted(never_sampled - first50)


def test_bench_record_identity_fields():
    # VERDICT r9 #3: BENCH_DETAIL.jsonl records must be self-describing
    # (round, sha, contended flag) -- four r9 records were
    # distinguishable only by order.
    import bench

    # start value deliberately above threshold: START rides JVM warmup
    # and must NOT trip the flag; only the END calibration counts
    ident = bench.record_identity(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        0.55, 0.20,
    )
    assert ident["sha"] and len(ident["sha"]) >= 7
    # this repo carries BENCH_r01..r09, so the inferred round is >= 10
    assert ident["round"] >= 10
    assert ident["contended"] is False
    assert ident["ts"].endswith("Z")
    contended = bench.record_identity("/", 0.50, 0.48)
    assert contended["contended"] is True


def test_parse_plan_tree_and_narrow_map_flagging(spark, sf_dir):
    # The spread tripwire (VERDICT r9 #5): a raw explode over a
    # single-file scan flags; the same explode behind spread() passes.
    from pyspark.sql import functions as F

    from kcl_akka_stream_spark.plans.hygiene import (
        narrow_expensive_maps,
        spread,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = F.explode(F.split("text", " ")).alias("tok")
    flags = narrow_expensive_maps(docs.select("doc_id", toks))
    assert flags and flags[0]["node"] == "Generate"
    assert flags[0]["scan_partitions"] <= 2
    assert narrow_expensive_maps(spread(docs).select("doc_id", toks)) == []
