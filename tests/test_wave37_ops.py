"""Wave-37 evidence pack: BM25 ranking and the dedup threshold sweep."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_bm25_hand_checked_tiny_corpus(spark):
    # 3 docs; hand-compute the Robertson BM25 for the frozen query.
    import kcl_akka_stream_spark.queries.pipeline as P
    from kcl_akka_stream_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [
            (1, "merge sort scan"),          # all three terms, dl 3
            (2, "merge merge merge filter"), # tf_merge 3, dl 4
            (3, "no relevant words here"),   # no terms, dl 4
        ],
        "doc_id long, text string",
    )
    orig = P.tbl
    P.tbl = lambda s, sfd, name: docs if name == "documents" else orig(s, sfd, name)
    try:
        rows = {r.doc_id: r.score_micro for r in QUERIES["text_bm25_topk"](spark, "unused").collect()}
    finally:
        P.tbl = orig

    n, avgdl = 3, 11 / 3
    def idf_micro(df):
        return round(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1_000_000)
    def term(idf_m, tf, dl):
        return idf_m * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
    d1 = round(
        term(idf_micro(2), 1, 3) + term(idf_micro(1), 1, 3) + term(idf_micro(1), 1, 3)
    )
    d2 = round(term(idf_micro(2), 3, 4))
    assert rows == {1: d1, 2: d2}  # doc 3 scores 0 -> excluded
    assert rows[1] > rows[2]  # covering all terms beats repeating one
    # saturation: tf 3 of one term scores LESS than 3 distinct-term hits
    assert d2 < d1


def test_bm25_topk_is_take_ordered(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    df = QUERIES["text_bm25_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts
    rows = df.collect()
    assert len(rows) == 20
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0


def test_threshold_sweep_is_monotone_and_anchored(spark, sf_dir):
    from kcl_akka_stream_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_lsh_buckets,
        verify_candidate_jaccard,
    )
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    rows = {r.threshold_ppm: r.n_pairs for r in QUERIES["dedup_threshold_sweep"](spark, sf_dir).collect()}
    assert sorted(rows) == [500_000, 600_000, 700_000, 800_000, 900_000]
    # survival curve is non-increasing in the threshold
    vals = [rows[t] for t in sorted(rows)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    # anchored: the 0.5 bucket equals the verified pair count
    docs = load_table(spark, sf_dir, "documents")
    pairs = verify_candidate_jaccard(
        docs,
        minhash_candidate_pairs(
            minhash_lsh_buckets(docs, num_hashes=8, bands=4, k=3)
        ),
        k=3,
        threshold=0.5,
    ).count()
    assert rows[500_000] == pairs > 0


def test_quantile_normalize_hand_checked(spark):
    # reference half (even ids): values 10, 20, 30, 40 cents;
    # target half (odd ids): 100, 200, 300, 400 -- each target value
    # sits at rank i/4, so it maps EXACTLY onto the reference's i-th
    # value: 100->10, 200->20, 300->30, 400->40.
    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES

    rows = []
    for i, v in enumerate([10, 20, 30, 40]):
        rows.append((2 * i, "t", v / 100.0))       # reference (even)
    for i, v in enumerate([100, 200, 300, 400]):
        rows.append((2 * i + 1, "t", v / 100.0))   # target (odd)
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    orig = C.tbl
    C.tbl = lambda s, sfd, name: ev if name == "events" else orig(s, sfd, name)
    try:
        r = QUERIES["agg_quantile_normalize"](spark, "unused").collect()[0]
    finally:
        C.tbl = orig
    assert (r.n_target_values, r.n_target_rows) == (4, 4)
    assert r.sum_mapped_cents == 10 + 20 + 30 + 40
    assert (r.min_mapped, r.max_mapped) == (10, 40)


def test_quantile_normalize_mapped_range_inside_reference(spark, sf_dir):
    # every mapped value must be drawn from the reference half's value
    # set -- so the mapped min/max sit inside the reference min/max.
    import pyspark.sql.functions as F

    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    out = {r.event_type: r for r in QUERIES["agg_quantile_normalize"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    ref = {
        r.event_type: r
        for r in ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(
            F.min(F.expr("cast(floor(value*100+0.5) as bigint)")).alias("lo"),
            F.max(F.expr("cast(floor(value*100+0.5) as bigint)")).alias("hi"),
        )
        .collect()
    }
    for et, r in out.items():
        assert ref[et].lo <= r.min_mapped <= r.max_mapped <= ref[et].hi
