"""Round-9 wave-21 operators: KL drift monitor, hard-negative mining,
percent-rank normalization."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _kl(spark, rows):
    # replicate the query's smoothed-KL shape on a hand-built
    # (grp, half, bin) table: half 0 = P, half 1 = Q
    df = spark.createDataFrame(rows, "g string, half int, bin long")
    ha = df.filter(F.col("half") == 0).groupBy("g", "bin").agg(
        F.count(F.lit(1)).alias("a")
    )
    hb = df.filter(F.col("half") == 1).groupBy("g", "bin").agg(
        F.count(F.lit(1)).alias("bc")
    )
    j = ha.join(hb, ["g", "bin"], "full_outer").select(
        "g",
        "bin",
        (F.coalesce("a", F.lit(0)) + 1).alias("a1"),
        (F.coalesce("bc", F.lit(0)) + 1).alias("b1"),
    )
    tw = Window.partitionBy("g")
    t = j.withColumn("na", F.sum("a1").over(tw)).withColumn(
        "nb", F.sum("b1").over(tw)
    )
    term = F.round(
        F.log(
            (F.col("a1").cast("double") * F.col("nb"))
            / (F.col("b1").cast("double") * F.col("na"))
        )
        * 1e6,
        0,
    ).cast("long")
    return t.groupBy("g").agg(
        F.sum(F.col("a1") * term).cast("long").alias("kl_num")
    ).collect()[0].kl_num


def test_kl_zero_on_identical_halves(spark):
    rows = [("g", h, b) for h in (0, 1) for b in [1, 1, 2, 3, 3, 3]]
    assert _kl(spark, rows) == 0


def test_kl_positive_on_shifted_halves(spark):
    # P concentrated on bin 1, Q on bin 9 -> strongly positive KL
    rows = [("g", 0, 1)] * 20 + [("g", 1, 9)] * 20
    assert _kl(spark, rows) > 0


def test_hard_negatives_exclude_same_label(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries.registry import tbl

    emb = tbl(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = QUERIES["pipeline_hard_negatives"](spark, sf_dir).collect()
    assert len(out) == 25  # 5 queries x top-5
    for r in out:
        assert labels[r.q_id] != labels[r.n_id]
        assert r.n_id != r.q_id


def test_hard_negatives_are_hardest(spark, sf_dir):
    # the rank-1 hard negative must score >= every other different-label
    # candidate for that query (spot-check one query via brute force)
    from kcl_akka_stream_spark.operators.similarity import range_search
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries.registry import tbl

    out = {
        (r.q_id, r.rank): r
        for r in QUERIES["pipeline_hard_negatives"](spark, sf_dir).collect()
    }
    emb = tbl(spark, sf_dir, "embeddings")
    q0 = emb.filter(F.col("vec_id") == 0)
    label0 = q0.collect()[0].label
    # all different-label cosines for query 0, via the exact range op at
    # threshold -1 (everything)
    allc = {
        r.n_id: r.cos_sim
        for r in range_search(emb, q0, threshold=-1.0).collect()
    }
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    best_diff = max(v for k, v in allc.items() if labels[k] != label0)
    assert out[(0, 1)].cos_sim == best_diff


def test_percent_rank_bounds_and_ties(spark):
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(
        [(1, "t", 100), (2, "t", 200), (3, "t", 200), (4, "t", 400)],
        "event_id long, event_type string, cents long",
    )
    out = {
        r.event_id: r.pr_micro
        for r in df.select(
            "event_id",
            F2.expr(
                "(rank() OVER (PARTITION BY event_type ORDER BY cents) - 1)"
                " * 1000000 div greatest(count(1) OVER (PARTITION BY"
                " event_type) - 1, 1)"
            ).alias("pr_micro"),
        ).collect()
    }
    assert out[1] == 0
    assert out[2] == out[3] == 1_000_000 // 3  # ties share a rank
    assert out[4] == 1_000_000


# ---------------------------------------------------------------------------
# wave 22: map surface + KL histogram state merge law
# ---------------------------------------------------------------------------


def test_map_funcs_round_trip(spark):
    df = spark.createDataFrame([(1, "click", 42, 7.9)],
                               "event_id long, event_type string, user_id long, value double")
    m = F.expr(
        "str_to_map(concat('t:', event_type, ',u:', cast(user_id as string),"
        " ',v:', cast(cast(floor(value) as bigint) as string)), ',', ':')"
    )
    r = df.select(
        F.size(m).alias("n"),
        F.element_at(m, "t").alias("t"),
        F.expr(
            "map_contains_key(str_to_map(concat('t:', event_type, ',u:',"
            " cast(user_id as string), ',v:', cast(cast(floor(value) as"
            " bigint) as string)), ',', ':'), 'z')"
        ).alias("z"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("ks"),
    ).collect()[0]
    assert (r.n, r.t, r.z, r.ks) == (3, "click", False, "t,u,v")


def test_kl_histogram_state_merges_before_smoothing(spark):
    # the streamable state is the RAW (half, bin) count; smoothing must
    # happen after the merge.  Fold two splits, merge by addition, and
    # check it equals the direct histogram -- then check that smoothing
    # per-split would NOT (the +1 prior would double-count).
    df = spark.createDataFrame(
        [("t", i % 2, (i * 3) % 5, i) for i in range(100)],
        "g string, half int, bin long, i long",
    )

    def hist(d):
        return {
            (r.g, r.half, r.bin): r.c
            for r in d.groupBy("g", "half", "bin")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    direct = hist(df)
    # split by ROW RANGE so the same (half, bin) keys appear in BOTH
    # splits (a bin-disjoint split would trivially hide the
    # double-smoothing bug this test exists to pin)
    h1 = hist(df.filter(F.col("i") < 50))
    h2 = hist(df.filter(F.col("i") >= 50))
    merged: dict = {}
    for h in (h1, h2):
        for k, v in h.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == direct
    smoothed_split = {k: v + 1 for k, v in merged.items()}
    smoothed_direct = {k: v + 1 for k, v in direct.items()}
    double_smoothed = {}
    for h in (h1, h2):
        for k, v in h.items():
            double_smoothed[k] = double_smoothed.get(k, 0) + v + 1
    assert smoothed_split == smoothed_direct
    assert double_smoothed != smoothed_direct  # the bug the split avoids


# ---------------------------------------------------------------------------
# wave 23: fertility arithmetic + Benford law constants
# ---------------------------------------------------------------------------


def test_fertility_hand_checked(spark):
    from kcl_akka_stream_spark.operators.text import bpe_tokens

    df = spark.createDataFrame(
        [("en", "hello world it's fine")], "lang string, text string"
    )
    r = df.select(
        F.size(bpe_tokens(F.col("text"))).alias("n_bpe"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_ws"),
    ).collect()[0]
    # 4 whitespace words; BPE splits the apostrophe clitic: it + 's
    assert r.n_ws == 4
    assert r.n_bpe == 5


def test_benford_expected_shares_sum_to_million(spark):
    import math

    ppm = [round(math.log10(1 + 1 / d) * 1e6) for d in range(1, 10)]
    assert sum(ppm) == 1_000_000  # the law is a complete distribution
    assert ppm[0] == 301030  # digit 1 ~ 30.1%


def test_benford_digit_extraction(spark):
    df = spark.createDataFrame(
        [(1, 0.01), (2, 93.47), (3, 7.0)], "id long, value double"
    )
    out = {
        r.id: r.d
        for r in df.select(
            "id",
            F.substring(
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("long")
                .cast("string"),
                1,
                1,
            )
            .cast("long")
            .alias("d"),
        ).collect()
    }
    assert out == {1: 1, 2: 9, 3: 7}
