"""Wave-31 evidence pack: containment dedup, Mann-Whitney U, Welch t,
temperature mixture, epoch shuffle, readability -- hand-checked values
and contract pins (the oracle gate covers cross-engine equality; these
pin the MATH against tiny knowable inputs)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_containment_catches_subset_jaccard_misses(spark):
    # A short doc pasted inside a long one: containment == 1.0 while
    # Jaccard is small -- the pair the Jaccard gate ships.
    from kcl_akka_stream_spark.operators.dedup import (
        verify_candidate_containment,
        verify_candidate_jaccard,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    cont = verify_candidate_containment(docs, cands, k=3, threshold=0.8).collect()
    assert len(cont) == 1
    r = cont[0]
    assert r.containment == 1.0  # every shingle of the short doc is in the long
    assert r.n_common == r.n_a < r.n_b  # direction: A inside B
    jac = verify_candidate_jaccard(docs, cands, k=3, threshold=0.5).collect()
    assert jac == []  # the Jaccard gate misses exactly this pair


def test_mann_whitney_extremes_and_ties(spark, tmp_path):
    # A entirely below B -> u2 = 0 (AUC 0); A entirely above -> AUC 1e6;
    # all-equal values -> pure ties: u2 = na*nb, AUC exactly 0.5e6.
    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES

    def run(rows):
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        orig = C.tbl
        C.tbl = lambda s, sfd, name: ev if name == "events" else orig(s, sfd, name)
        try:
            return {r.event_type: r for r in QUERIES["agg_mann_whitney"](spark, "unused").collect()}
        finally:
            C.tbl = orig

    # half 0 (even ids) low, half 1 (odd ids) high
    low_high = [(0, "t", 1.0), (2, "t", 2.0), (1, "t", 9.0), (3, "t", 8.0)]
    r = run(low_high)["t"]
    assert (r.na, r.nb, r.u2, r.auc_ppm) == (2, 2, 0, 0)
    r = run([(0, "t", 9.0), (2, "t", 8.0), (1, "t", 1.0), (3, "t", 2.0)])["t"]
    assert (r.u2, r.auc_ppm) == (2 * 2 * 2, 1_000_000)
    r = run([(0, "t", 5.0), (2, "t", 5.0), (1, "t", 5.0), (3, "t", 5.0)])["t"]
    assert (r.u2, r.auc_ppm) == (2 * 2, 500_000)  # u2 = na*nb on pure ties


def test_welch_t_matches_pure_python(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    out = {r.event_type: r for r in QUERIES["agg_welch_ttest"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", F.expr("cast(floor(value*100+0.5) as bigint)").alias("x")
    ).collect()
    by = {}
    for r in ev:
        by.setdefault(r.event_type, ([], []))[r.event_id % 2].append(r.x)
    for etype, (a, b) in by.items():
        n1, n2 = len(a), len(b)
        m1, m2 = sum(a) / n1, sum(b) / n2
        v1 = (sum(x * x for x in a) - sum(a) ** 2 / n1) / (n1 - 1)
        v2 = (sum(x * x for x in b) - sum(b) ** 2 / n2) / (n2 - 1)
        t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
        got = out[etype]
        assert (got.n1, got.n2) == (n1, n2)
        assert abs(got.t_stat - t) < 2e-6, (etype, got.t_stat, t)


def test_temperature_mixture_boosts_low_resource(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["pipeline_mixture_temperature"](spark, sf_dir).collect()
    assert len(rows) >= 2
    total_raw = sum(r.raw_share_ppm for r in rows)
    total_sampled = sum(r.sampled_share_ppm for r in rows)
    # floor-per-row: totals land in (1e6 - n_rows, 1e6]
    assert 1_000_000 - len(rows) < total_raw <= 1_000_000
    assert 1_000_000 - len(rows) < total_sampled <= 1_000_000
    smallest = min(rows, key=lambda r: r.n_docs)
    largest = max(rows, key=lambda r: r.n_docs)
    if smallest.n_docs < largest.n_docs:  # fixture langs are not uniform
        assert smallest.boost_ppm > 0  # low-resource slice up-sampled
        assert largest.boost_ppm < 0  # high-resource slice down-sampled
    # boost is defined as the share delta
    for r in rows:
        assert r.boost_ppm == r.sampled_share_ppm - r.raw_share_ppm


def test_epoch_shuffle_is_deterministic_and_epoch_distinct(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    a = {(r.epoch, r.shard): r for r in QUERIES["corpus_epoch_shuffle"](spark, sf_dir).collect()}
    b = {(r.epoch, r.shard): r for r in QUERIES["corpus_epoch_shuffle"](spark, sf_dir).collect()}
    assert a.keys() == b.keys() and len(a) == 16  # 2 epochs x 8 shards
    for k in a:  # reproducible: same permutation both runs
        assert a[k].perm_checksum == b[k].perm_checksum
        assert a[k].first_key == b[k].first_key
    n_docs = load_table(spark, sf_dir, "documents").count()
    for e in (0, 1):
        assert sum(r.n_docs for (ep, _), r in a.items() if ep == e) == n_docs
    # epochs are DIFFERENT permutations: at least one shard checksum differs
    assert any(
        a[(0, s)].perm_checksum != a[(1, s)].perm_checksum for s in range(8)
    )


def test_readability_hand_checked(spark, tmp_path):
    import kcl_akka_stream_spark.queries.pipeline as P
    from kcl_akka_stream_spark.queries import QUERIES

    # "hello world. go!" -> words 3, sentences 2, vowel runs: e-o-o-o -> 5?
    # hello: e, o (2 runs); world: o (1); go: o (1) -> 4 syllable runs
    docs = spark.createDataFrame(
        [(1, "en", "hello world. go!")], "doc_id long, lang string, text string"
    )
    orig = P.tbl
    P.tbl = lambda s, sfd, name: docs if name == "documents" else orig(s, sfd, name)
    try:
        r = QUERIES["text_readability"](spark, "unused").collect()[0]
    finally:
        P.tbl = orig
    assert (r.words, r.sents, r.sylls) == (3, 2, 4)
    expected = math.floor(
        (206.835 - 1.015 * (3 / 2) - 84.6 * (4 / 3)) * 1_000_000
    )
    assert r.flesch_micro == expected
