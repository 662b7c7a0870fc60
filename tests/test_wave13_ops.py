"""Round-8 wave-13 operators: mergeable bottom-k reservoir, time-weighted
average, nearest as-of join, co-occurrence pairs, integer centroids."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# hash_bottom_k: merge law + idempotence
# ---------------------------------------------------------------------------


def _sample_set(df):
    return {(r.g, r.i) for r in df.collect()}


def test_hash_bottom_k_merge_equals_direct(spark):
    from kcl_akka_stream_spark.operators.sampling import hash_bottom_k

    rows = [("a", i) for i in range(40)] + [("b", i) for i in range(100, 125)]
    df = spark.createDataFrame(rows, ["g", "i"])
    direct = _sample_set(hash_bottom_k(df, "g", "i", 5, seed="t"))
    # fold per arbitrary part, then merge the survivors
    parted = df.withColumn("part", F.pmod(F.col("i"), F.lit(3)))
    states = hash_bottom_k(
        parted, "g", "i", 5, seed="t", part_cols=["part"]
    ).drop("part")
    merged = _sample_set(hash_bottom_k(states, "g", "i", 5, seed="t"))
    assert merged == direct
    assert all(len([1 for g, _ in direct if g == s]) == 5 for s in ("a", "b"))


def test_hash_bottom_k_idempotent_under_replay(spark):
    from kcl_akka_stream_spark.operators.sampling import hash_bottom_k

    rows = [("a", i) for i in range(30)]
    df = spark.createDataFrame(rows, ["g", "i"])
    direct = _sample_set(hash_bottom_k(df, "g", "i", 4, seed="t"))
    # replay half the rows twice (at-least-once delivery) -- the operator
    # itself absorbs the duplicates (ADVICE r8: no caller-side .distinct())
    replayed = df.unionAll(df.filter(F.col("i") < 15))
    again = _sample_set(hash_bottom_k(replayed, "g", "i", 4, seed="t"))
    assert again == direct
    # and merging a stale state with itself changes nothing
    s = hash_bottom_k(df, "g", "i", 4, seed="t")
    twice = _sample_set(hash_bottom_k(s.unionAll(s), "g", "i", 4, seed="t"))
    assert twice == direct


def test_hash_bottom_k_fewer_rows_than_k(spark):
    from kcl_akka_stream_spark.operators.sampling import hash_bottom_k

    df = spark.createDataFrame([("a", 1), ("a", 2)], ["g", "i"])
    assert _sample_set(hash_bottom_k(df, "g", "i", 10)) == {("a", 1), ("a", 2)}


# ---------------------------------------------------------------------------
# time_weighted_avg: LOCF weighting, hand-checked
# ---------------------------------------------------------------------------


def test_time_weighted_avg_locf(spark):
    from kcl_akka_stream_spark.operators.windows import time_weighted_avg

    # key u: value 100 cents for 10s, then 300 cents for 30s, then final
    # observation (zero holding time). TWA = (100*10 + 300*30)/40 = 250.
    rows = [
        ("u", "2024-01-01 00:00:00", 100, 1),
        ("u", "2024-01-01 00:00:10", 300, 2),
        ("u", "2024-01-01 00:00:40", 999, 3),
        ("v", "2024-01-01 00:00:00", 500, 4),  # single event: NULL twa
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "c", "o"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "c", "o"
    )
    out = {r.k: r for r in time_weighted_avg(df, "k", "ts", "c", "o").collect()}
    assert out["u"].n_events == 3
    assert out["u"].span_us == 40_000_000
    assert out["u"].twa_cents == 250
    assert out["v"].n_events == 1
    assert out["v"].span_us is None or out["v"].span_us == 0
    assert out["v"].twa_cents is None


def test_time_weighted_avg_simultaneous_events_zero_weight(spark):
    from kcl_akka_stream_spark.operators.windows import time_weighted_avg

    # two events share a timestamp: the first gets zero duration (its
    # value never "held"), result is driven by the second
    rows = [
        ("u", "2024-01-01 00:00:00", 100, 1),
        ("u", "2024-01-01 00:00:00", 200, 2),
        ("u", "2024-01-01 00:00:10", 0, 3),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "c", "o"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "c", "o"
    )
    out = time_weighted_avg(df, "k", "ts", "c", "o").collect()[0]
    assert out.twa_cents == 200


# ---------------------------------------------------------------------------
# asof_join_nearest: direction choice + tie rule
# ---------------------------------------------------------------------------


def _nearest(spark, left_rows, right_rows):
    from kcl_akka_stream_spark.operators.joins import asof_join_nearest

    left = spark.createDataFrame(left_rows, ["lid", "k", "ts"]).select(
        "lid", "k", F.col("ts").cast("timestamp").alias("ts")
    )
    right = spark.createDataFrame(right_rows, ["k", "ts", "rid"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "rid"
    )
    out = asof_join_nearest(left, right, "k", "ts", "ts", ["rid"])
    return {r.lid: (r.rid, r.asof_dist_us) for r in out.collect()}


def test_nearest_prefers_closer_side(spark):
    got = _nearest(
        spark,
        [(1, "k", "2024-01-01 00:00:10")],
        [("k", "2024-01-01 00:00:04", 100), ("k", "2024-01-01 00:00:13", 200)],
    )
    assert got[1] == (200, 3_000_000)  # forward at 3s beats backward at 6s


def test_nearest_equidistant_takes_backward(spark):
    got = _nearest(
        spark,
        [(1, "k", "2024-01-01 00:00:10")],
        [("k", "2024-01-01 00:00:05", 100), ("k", "2024-01-01 00:00:15", 200)],
    )
    assert got[1] == (100, 5_000_000)


def test_nearest_equal_ts_is_distance_zero(spark):
    got = _nearest(
        spark,
        [(1, "k", "2024-01-01 00:00:10")],
        [("k", "2024-01-01 00:00:10", 100), ("k", "2024-01-01 00:00:11", 200)],
    )
    assert got[1] == (100, 0)


def test_nearest_no_right_rows_yields_nulls(spark):
    got = _nearest(
        spark,
        [(1, "k", "2024-01-01 00:00:10"), (2, "other", "2024-01-01 00:00:10")],
        [("k", "2024-01-01 00:00:09", 100)],
    )
    assert got[1] == (100, 1_000_000)
    assert got[2] == (None, None)


# ---------------------------------------------------------------------------
# cooccurrence_pairs: basket-local supports
# ---------------------------------------------------------------------------


def test_cooccurrence_pairs_supports(spark):
    from kcl_akka_stream_spark.operators.aggregations import cooccurrence_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "a"),  # duplicate item in basket counts once
        (3, "b"),
    ]
    df = spark.createDataFrame(rows, ["b", "i"])
    got = {
        (r.item1, r.item2): r.support
        for r in cooccurrence_pairs(df, "b", "i").collect()
    }
    assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}


# ---------------------------------------------------------------------------
# integer_centroids: exactness + partitioning independence
# ---------------------------------------------------------------------------


def test_integer_centroids_exact_and_partition_independent(spark):
    from kcl_akka_stream_spark.operators.similarity import integer_centroids

    rows = [
        ("a", [0.5, -0.25]),
        ("a", [1.5, 0.75]),
        ("b", [-1.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "g string, embedding array<float>")
    out = {
        (r.g, r.pos): (r.n, r.sq, r.cq)
        for r in integer_centroids(df, ["g"]).collect()
    }
    # a/pos0: q = 500000, 1500000 -> sq 2000000, cq 1000000
    assert out[("a", 0)] == (2, 2_000_000, 1_000_000)
    # a/pos1: q = floor(-250000+0.5) = -250000... floor(-249999.5)? exact
    # float -0.25 -> -250000 + 0.5 -> floor = -250000; 0.75 -> 750000
    assert out[("a", 1)] == (2, 500_000, 250_000)
    assert out[("b", 0)] == (1, -1_000_000, -1_000_000)
    # odd negative sum: floor division toward -inf (cross-engine rule)
    df2 = spark.createDataFrame(
        [("c", [-0.25]), ("c", [-0.5])], "g string, embedding array<float>"
    )
    out2 = {r.pos: r.cq for r in integer_centroids(df2, ["g"]).collect()}
    assert out2[0] == -375_000  # (-750000)/2 exact; floor no-op here
    # partition independence
    rep = integer_centroids(df.repartition(7), ["g"])
    out_rep = {(r.g, r.pos): (r.n, r.sq, r.cq) for r in rep.collect()}
    assert out_rep == out


def test_integer_centroids_floor_division_negative(spark):
    from kcl_akka_stream_spark.operators.similarity import integer_centroids

    # sum -1.0 + (-0.000001): sq = -1000001, n=2 -> floor(-500000.5) = -500001
    df = spark.createDataFrame(
        [("c", [-1.0]), ("c", [-0.000001])], "g string, embedding array<float>"
    )
    out = {r.pos: r.cq for r in integer_centroids(df, ["g"]).collect()}
    assert out[0] == -500_001


# ---------------------------------------------------------------------------
# padding efficiency invariants on the fixture
# ---------------------------------------------------------------------------


def test_padding_efficiency_invariants(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["pipeline_padding_efficiency"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bucket_cap % 64 == 0 and r.bucket_cap > 0
        assert r.sum_tokens <= r.padded_tokens
        assert r.padded_tokens - r.sum_tokens < 64 * r.n_docs
        assert 0 <= r.waste_ppm < 1_000_000
