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
    line = bench.summary_line(per_query, cold, "0.1", 0.123, 0.456,
                              n_retimed=7)
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
    # VERDICT r15 #6: the retime count rides the official stdout record
    assert obj["n_retimed"] == 7
    for v in obj.values():
        assert not isinstance(v, (dict, list))


def test_midrun_contention_burst_flags_record():
    # VERDICT r13 #2: the r13 driver record carried a 32.5s transient
    # burst (12 queries inflated 2-9x) with BOTH endpoint calibrations
    # under threshold (0.379 start / 0.204 end) -- endpoint probes cannot
    # see a mid-run burst.  The synthetic case: clean endpoints, one hot
    # interleaved segment -> contended.
    assert bench.contended_flag(0.379, 0.204, [0.21, 0.95, 0.19]) is True
    # clean endpoints + clean segments -> idle
    assert bench.contended_flag(0.45, 0.22, [0.21, 0.25, 0.19]) is False
    # the old endpoint rule still applies (END over threshold)
    assert bench.contended_flag(0.20, 0.48, []) is True
    # START alone never counts (rides JVM warmup)
    assert bench.contended_flag(0.60, 0.20, None) is False
    # segment threshold is its own constant, looser than the endpoint
    # median-of-3 threshold (single-rep probes ride more noise)
    assert bench.SEGMENT_CAL_SEC > bench.CONTENDED_CAL_SEC
    # and record_identity carries the flag through
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ident = bench.record_identity(repo, 0.379, 0.204, [0.21, 0.95])
    assert ident["contended"] is True


def test_retime_rule_and_history_medians(tmp_path):
    # >1.5x the cross-record idle median AND above the absolute floor
    # (VERDICT r15 #6 tightened the factor from 2.0: the r15 record's
    # position-correlated ~1.9x bursts sat under the old threshold)
    assert bench.RETIME_FACTOR == 1.5
    assert bench.needs_retime(3.0, 1.0) is True
    assert bench.needs_retime(1.6, 1.0) is True       # caught at 1.5x now
    assert bench.needs_retime(1.4, 1.0) is False      # under the factor
    assert bench.needs_retime(0.4, 0.1) is False      # under the floor
    assert bench.needs_retime(3.0, None) is False     # no history
    # history_medians: contended records and other-sf records excluded
    p = tmp_path / "BENCH_DETAIL.jsonl"
    recs = [
        {"sf": 0.1, "contended": False, "queries": {"qa": 1.0, "qb": 2.0}},
        {"sf": 0.1, "contended": False, "queries": {"qa": 3.0}},
        {"sf": 0.1, "contended": True, "queries": {"qa": 99.0}},
        {"sf": 0.01, "contended": False, "queries": {"qa": 50.0}},
    ]
    p.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    med = bench.history_medians(str(p), 0.1)
    assert med == {"qa": 2.0, "qb": 2.0}
    assert bench.history_medians(str(tmp_path / "missing.jsonl"), 0.1) == {}


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
    from kcl_akka_stream_spark.queries import ANCHORS, QUERIES, _PRIORITY

    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    # VERDICT r15 #2: the fixed anchor subset is PERMANENT -- it leads
    # _PRIORITY every round so consecutive driver correctness samples
    # always share per-query keys (PERF_r15 had n_common=0).  Membership
    # pinned exactly: rotating one out silently re-opens the hole.
    assert _PRIORITY[: len(ANCHORS)] == ANCHORS
    assert ANCHORS == [
        "q1_pricing_summary",        # flagship
        "agg_group_by_key",          # agg
        "w_topk_per_group",          # window
        "j_asof",                    # join
        "dedup_minhash_lsh_capped",  # dedup
        "sim_topk_ivf_pq",           # sim
        "emb_near_dup",              # embedding
        "text_quality",              # text
        "graph_pagerank_topk",       # graph
        "pipeline_clean_corpus",     # pipeline
        "stream_tumbling_agg",       # streaming twin
        "multimodal_features",       # multimodal
    ]
    # and the rotation really front-loads: the first 50 sampled entries
    # must include ALL 13 round-15 names never driver-sampled in
    # CORRECTNESS_r01..r15 (waves 85-97) -- 12 anchors + 13 + 25 fill == 50
    assert len(_PRIORITY) == 50
    first50 = set(list(QUERIES)[:50])
    never_sampled = set(_PRIORITY[len(ANCHORS): len(ANCHORS) + 13])
    assert len(never_sampled) == 13
    # pin every wave-85..97 name so a partial rotation is caught
    for name in (
        "text_pii_scan",            # wave 85
        "text_repetition_flags",    # wave 86
        "agg_chao1_richness",       # wave 87
        "agg_pr_auc",               # wave 88
        "text_brier_decomposition", # wave 89
        "sample_pps_systematic",    # wave 90
        "w_cusum_drift",            # wave 91
        "text_mattr",               # wave 92
        "emb_effective_rank",       # wave 93
        "agg_wilcoxon_signed_rank", # wave 94
        "multimodal_gif_header",    # wave 95
        "agg_runs_test",            # wave 96
        "w_record_extremes",        # wave 97
    ):
        assert name in never_sampled, name
    assert set(_PRIORITY) <= first50, sorted(set(_PRIORITY) - first50)


def test_elect_record_rule():
    # VERDICT r14 #1: the old "lowest end calibration wins" proxy twice
    # elected the SLOWER of two median-equivalent records.  The new rule:
    # cleanliness (end-cal + every segment + full headline) is a GATE,
    # lowest TOTAL wins, end-cal breaks ties only.  The two r14 misfires
    # are the regression fixtures (real values from BENCH_DETAIL.jsonl).
    import bench

    def rec(total, cal_end, nq=286, segments=None, cal_start=0.45):
        return {
            "total": total,
            "cal_start": cal_start,
            "cal_end": cal_end,
            "segments": segments if segments is not None else [0.2] * 11,
            "n_queries": nq,
        }

    # r14 D-vs-C: old rule elected D (cal 0.178) over C; new rule: C.
    c = rec(247.608, 0.201, nq=285)
    d = rec(256.918, 0.178, nq=285)
    assert bench.elect_record([c, d]) is c
    # r14 F-vs-E: old rule elected F (cal 0.204) over E; new rule: E.
    e = rec(233.928, 0.251)
    f = rec(252.380, 0.204)
    assert bench.elect_record([e, f]) is e
    # cleanliness gates: a contended end-cal OR a dirty segment makes a
    # faster record ineligible, even at a huge total advantage
    fast_dirty_cal = rec(200.0, 0.31)
    assert bench.elect_record([fast_dirty_cal, f]) is f
    fast_dirty_seg = rec(200.0, 0.20, segments=[0.2] * 10 + [0.46])
    assert bench.elect_record([fast_dirty_seg, f]) is f
    # partial headline cannot beat a full record
    fast_partial = rec(150.0, 0.20, nq=200)
    assert bench.elect_record([fast_partial, f]) is f
    # tie (within 0.5%): end calibration breaks it
    t1 = rec(250.00, 0.25)
    t2 = rec(250.80, 0.15)  # 0.32% slower -> tie -> lower cal wins
    assert bench.elect_record([t1, t2]) is t2
    # beyond the tie window the total decides regardless of cal
    t3 = rec(253.00, 0.10)
    assert bench.elect_record([t1, t3]) is t1
    # all contended -> None (re-run, don't ship a flagged number)
    assert bench.elect_record([rec(200.0, 0.40)]) is None
    assert bench.elect_record([]) is None


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
