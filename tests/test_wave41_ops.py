"""Wave-41 evidence pack: Bloom FPR acceptance, edit-distance scalars,
max-silence outage detector."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_bloom_fpr_accounting_and_theory(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries.pipeline import _BLOOM_K, _BLOOM_M

    r = QUERIES["dedup_bloom_fpr_report"](spark, sf_dir).collect()[0]
    # accounting identities
    assert r.n_candidates == r.n_known + r.n_false_pos
    assert 0 <= r.n_known <= r.n_candidates <= r.n_incoming
    assert r.n_false_pos > 0  # m=1024 is sized so the fp channel is live
    # measured FPR divides by the true-negative opportunity set
    assert r.fpr_measured_ppm == math.floor(
        r.n_false_pos * 1_000_000 / (r.n_incoming - r.n_known)
    )
    # theory within a generous binomial band of measured (the contract
    # is "same order of magnitude", not equality -- the gate red-flags a
    # broken position hash, which lands orders off)
    assert 0 < r.fpr_theory_ppm < 1_000_000
    n_trials = r.n_incoming - r.n_known
    p = r.fpr_theory_ppm / 1_000_000
    sigma = math.sqrt(n_trials * p * (1 - p))
    assert abs(r.n_false_pos - n_trials * p) < 5 * sigma + 3


def test_bloom_fpr_no_false_negatives(spark, sf_dir):
    # every truly-known incoming doc must be bloom_candidate = 1 --
    # the no-false-negative guarantee the pruning correctness rests on.
    from kcl_akka_stream_spark.operators.dedup import bloom_prune_known
    from kcl_akka_stream_spark.queries.pipeline import _BLOOM_K, _BLOOM_M
    from kcl_akka_stream_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    existing = (
        docs.filter(F.col("doc_id") % 3 != 0)
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    incoming = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.md5("text").alias("digest")
    )
    flagged = bloom_prune_known(incoming, existing, m_bits=_BLOOM_M, k_hashes=_BLOOM_K)
    missed = flagged.filter(
        (F.col("is_known") == 1) & (F.col("bloom_candidate") == 0)
    ).count()
    assert missed == 0


def test_edit_funcs_hand_checked(spark):
    import kcl_akka_stream_spark.queries.pipeline as P  # noqa: F401
    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [(1, "en", "abcde")], "doc_id long, lang string, text string"
    )
    orig = C.tbl
    C.tbl = lambda s, sfd, name: docs if name == "documents" else orig(s, sfd, name)
    try:
        r = QUERIES["scalar_edit_funcs"](spark, "unused").collect()[0]
    finally:
        C.tbl = orig
    assert r.sum_lev_reverse == 4  # abcde -> edcba: 4 substitutions
    assert r.sum_lev_translate == 2  # a,e -> A,E
    assert r.sum_pad_len == 20 + 24
    assert r.sum_repeat_len == 10


def test_max_silence_hand_checked(spark):
    import datetime

    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES

    t0 = datetime.datetime(2026, 1, 1)
    # gaps: 10s, 100s, 10s -> max 100s of 120s span
    offs = [0, 10, 110, 120]
    ev = spark.createDataFrame(
        [(i, "t", 1.0, t0 + datetime.timedelta(seconds=s)) for i, s in enumerate(offs)],
        "event_id long, event_type string, value double, ts timestamp",
    )
    orig = C.tbl
    C.tbl = lambda s, sfd, name: ev if name == "events" else orig(s, sfd, name)
    try:
        r = QUERIES["w_max_silence"](spark, "unused").collect()[0]
    finally:
        C.tbl = orig
    assert (r.n_gaps, r.max_gap_us, r.span_us) == (3, 100_000_000, 120_000_000)
    assert r.max_gap_share_ppm == 100_000_000 * 1_000_000 // 120_000_000


def test_volume_anomaly_hand_checked(spark):
    # hourly counts [10,10,10,10,100]: median 10, deviations
    # [0,0,0,0,90], MAD 0 -> the 100-hour is anomalous (dev > 0).
    import datetime

    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for h in range(5):
        n = 100 if h == 4 else 10
        for _ in range(n):
            rows.append((eid, "t", 1.0, t0 + datetime.timedelta(hours=h, seconds=eid % 60)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts timestamp"
    )
    orig = C.tbl
    C.tbl = lambda s, sfd, name: ev if name == "events" else orig(s, sfd, name)
    try:
        r = QUERIES["w_volume_anomaly"](spark, "unused").collect()[0]
    finally:
        C.tbl = orig
    assert (r.n_hours, r.median_hourly, r.mad_hourly) == (5, 10, 0)
    assert (r.n_anomalous_hours, r.max_hourly) == (1, 100)


def test_zipf_slope_recovers_exact_power_law(spark):
    # synthetic exact Zipf corpus: term_i appears floor(1200 / i) times
    # for i = 1..100 -> slope must recover ~ -1 (within integer-rounding
    # slack of the frozen logs + floored counts).
    import kcl_akka_stream_spark.queries.pipeline as P
    from kcl_akka_stream_spark.queries import QUERIES

    text = []
    for i in range(1, 101):
        text.extend([f"term{i:03d}"] * (1200 // i))
    docs = spark.createDataFrame(
        [(1, "en", " ".join(text))], "doc_id long, lang string, text string"
    )
    orig = P.tbl
    P.tbl = lambda s, sfd, name: docs if name == "documents" else orig(s, sfd, name)
    try:
        r = QUERIES["text_zipf_slope"](spark, "unused").collect()[0]
    finally:
        P.tbl = orig
    assert r.n_terms == 100
    assert -1_050_000 < r.zipf_slope_micro < -950_000  # ~ -1.0


def test_zipf_slope_fixture_is_negative(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    for r in QUERIES["text_zipf_slope"](spark, sf_dir).collect():
        assert r.zipf_slope_micro < 0  # counts decay with rank, always
        assert r.n_terms > 10
