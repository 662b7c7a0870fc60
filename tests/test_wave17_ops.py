"""Round-8 wave-17 operators (evidence pack, VERDICT r8 #2): bitmap set
algebra, Poisson bootstrap, nearest-centroid classification, trailing
z-score gate, regex scalar surface -- plus the round-9 ADVICE fixes
(bitmap empty-state zeros, cooccurrence basket cap, rendezvous salt
validation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bitmap_set_ops: hand-checked algebra + empty-state contract (ADVICE r8)
# ---------------------------------------------------------------------------


def test_bitmap_set_ops_hand_checked(spark):
    from kcl_akka_stream_spark.operators.sketches import (
        bitmap_set_ops,
        bitmap_state,
    )

    # a = {0..9, 100}, b = {5..14} -> and = {5..9} (5), or = 16
    a = spark.createDataFrame(
        [(i,) for i in list(range(10)) + [100]], "user_id long"
    )
    b = spark.createDataFrame([(i,) for i in range(5, 15)], "user_id long")
    row = bitmap_set_ops(
        bitmap_state(a, None, "user_id"), bitmap_state(b, None, "user_id")
    ).collect()[0]
    assert (row.n_a, row.n_b, row.n_and, row.n_or) == (11, 10, 5, 16)
    assert (row.n_a_only, row.n_b_only) == (6, 5)
    assert row.jaccard_ppm == 5 * 1_000_000 // 16


def test_bitmap_set_ops_empty_states_all_zero(spark):
    # ADVICE r8: two empty states must return ONE all-zero row (not
    # all-NULL); jaccard_ppm alone is NULL (0/0 undefined).
    from kcl_akka_stream_spark.operators.sketches import (
        bitmap_set_ops,
        bitmap_state,
    )

    empty = spark.createDataFrame([], "user_id long")
    s = bitmap_state(empty, None, "user_id")
    rows = bitmap_set_ops(s, s).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_a, r.n_b, r.n_and, r.n_or, r.n_a_only, r.n_b_only) == (
        0,
        0,
        0,
        0,
        0,
        0,
    )
    assert r.jaccard_ppm is None


def test_bitmap_set_ops_one_side_empty(spark):
    from kcl_akka_stream_spark.operators.sketches import (
        bitmap_set_ops,
        bitmap_state,
    )

    a = spark.createDataFrame([(i,) for i in range(7)], "user_id long")
    empty = spark.createDataFrame([], "user_id long")
    r = bitmap_set_ops(
        bitmap_state(a, None, "user_id"), bitmap_state(empty, None, "user_id")
    ).collect()[0]
    assert (r.n_a, r.n_b, r.n_and, r.n_or) == (7, 0, 0, 7)
    assert r.jaccard_ppm == 0


# ---------------------------------------------------------------------------
# poisson_bootstrap_weights: determinism + truncation + mean
# ---------------------------------------------------------------------------


def test_poisson_bootstrap_weights_deterministic_and_bounded(spark):
    from kcl_akka_stream_spark.operators.sampling import (
        poisson_bootstrap_weights,
    )

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    w1 = poisson_bootstrap_weights(df, "id", b=8)
    # weights are ints in [0, 4] (truncated Poisson(1))
    bad = w1.filter((F.col("w") < 0) | (F.col("w") > 4)).count()
    assert bad == 0
    # every (id, b) pair appears exactly once
    assert w1.count() == 500 * 8
    # partitioning-independence: same weights regardless of layout
    h1 = w1.groupBy().agg(F.sum(F.col("w") * F.col("id") * (F.col("b") + 1))).collect()[0][0]
    h2 = (
        poisson_bootstrap_weights(df.repartition(7), "id", b=8)
        .groupBy()
        .agg(F.sum(F.col("w") * F.col("id") * (F.col("b") + 1)))
        .collect()[0][0]
    )
    assert h1 == h2
    # mean weight ~ Poisson(1) truncated at 4 => ~0.996; loose envelope
    mean = w1.agg(F.avg("w")).collect()[0][0]
    assert 0.9 < mean < 1.1


def test_poisson_bootstrap_weights_b_is_exact(spark):
    import pytest as _pytest

    from kcl_akka_stream_spark.operators.sampling import (
        poisson_bootstrap_weights,
    )

    df = spark.createDataFrame([(1,), (2,)], "id long")
    out = poisson_bootstrap_weights(df, "id", b=4)
    assert sorted(r.b for r in out.filter(F.col("id") == 1).collect()) == [0, 1, 2, 3]
    # the 4-slices-per-digest layout requires b % 4 == 0 -- loud, not off-by-one
    with _pytest.raises(ValueError):
        poisson_bootstrap_weights(df, "id", b=3)


# ---------------------------------------------------------------------------
# nearest_centroid_classify: hand-checked separable clusters
# ---------------------------------------------------------------------------


def test_nearest_centroid_classify_separable(spark):
    from kcl_akka_stream_spark.operators.similarity import (
        nearest_centroid_classify,
    )

    # two axis-aligned clusters: label x along dim 0, label y along dim 1
    train = spark.createDataFrame(
        [
            (0, "x", [1.0, 0.1]),
            (2, "x", [0.9, 0.0]),
            (4, "y", [0.0, 1.0]),
            (6, "y", [0.1, 0.9]),
        ],
        "vec_id long, label string, embedding array<double>",
    )
    test = spark.createDataFrame(
        [(1, "x", [1.0, 0.0]), (3, "y", [0.05, 1.1]), (5, "x", [0.8, 0.2])],
        "vec_id long, label string, embedding array<double>",
    )
    pred = {
        r.vec_id: r.pred_label
        for r in nearest_centroid_classify(train, test).collect()
    }
    assert pred == {1: "x", 3: "y", 5: "x"}


def test_nearest_centroid_tie_breaks_to_smallest_label(spark):
    from kcl_akka_stream_spark.operators.similarity import (
        nearest_centroid_classify,
    )

    # identical centroids for two labels -> equal score -> smallest label
    train = spark.createDataFrame(
        [(0, "b", [1.0, 1.0]), (2, "a", [1.0, 1.0])],
        "vec_id long, label string, embedding array<double>",
    )
    test = spark.createDataFrame(
        [(1, "b", [1.0, 1.0])],
        "vec_id long, label string, embedding array<double>",
    )
    assert nearest_centroid_classify(train, test).collect()[0].pred_label == "a"


# ---------------------------------------------------------------------------
# trailing z-score gate: synthetic spike flagged, warm-up masked
# ---------------------------------------------------------------------------


def test_trailing_zscore_flags_spike_not_warmup(spark):
    # Reproduce the query's gate on a hand-built daily series: 8 calm days
    # with slight jitter (nonzero variance) then a 10x spike.  The first 4
    # days lack n_trail >= 4 history and must never flag.
    from pyspark.sql import Window

    xs = [100, 101, 99, 100, 102, 98, 100, 101, 1000]
    daily = spark.createDataFrame(
        [("e", f"2024-01-{d + 1:02d}", x) for d, x in enumerate(xs)],
        "event_type string, day string, x long",
    ).withColumn("day", F.to_date("day"))
    tw = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    t = (
        daily.withColumn("n_trail", F.count(F.lit(1)).over(tw))
        .withColumn("s1", F.sum("x").over(tw))
        .withColumn("s2", F.sum(F.col("x") * F.col("x")).over(tw))
    )
    dev = F.col("n_trail") * F.col("x") - F.col("s1")
    var9 = 9 * (F.col("n_trail") * F.col("s2") - F.col("s1") * F.col("s1"))
    out = t.select(
        "day",
        F.when((F.col("n_trail") >= 4) & (dev * dev > var9), 1)
        .otherwise(0)
        .alias("is_anomaly"),
    ).collect()
    flags = {str(r.day): r.is_anomaly for r in out}
    assert flags["2024-01-09"] == 1  # the spike
    assert sum(flags.values()) == 1  # and nothing else


# ---------------------------------------------------------------------------
# regex query surface: non-vacuous on the fixture
# ---------------------------------------------------------------------------


def test_scalar_regex_funcs_non_vacuous(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    out = QUERIES["scalar_regex_funcs"](spark, sf_dir).limit(500).collect()
    assert out
    # extraction really fires: every row has a first number and a URL
    assert all(r.first_num != "" for r in out)
    assert all(r.url.startswith("https://ex") for r in out)
    # the match test splits (both 0s and 1s present at fixture scale)
    assert {r.high_rating for r in out} == {0, 1}
    # global replace really masked every digit run in the prefix
    assert all(not any(c.isdigit() for c in r.masked_prefix) for r in out)


# ---------------------------------------------------------------------------
# cooccurrence_pairs basket cap (VERDICT r8 #4)
# ---------------------------------------------------------------------------


def test_cooccurrence_cap_drops_only_oversized_baskets(spark):
    from kcl_akka_stream_spark.operators.aggregations import (
        cooccurrence_pairs,
    )

    # two small baskets + one pathological 30-item basket
    rows = (
        [("b1", f"i{k}") for k in range(3)]
        + [("b2", f"i{k}") for k in range(2, 6)]
        + [("hot", f"i{k}") for k in range(30)]
    )
    df = spark.createDataFrame(rows, "b string, i string")
    uncapped = {
        (r.item1, r.item2): r.support
        for r in cooccurrence_pairs(df, "b", "i").collect()
    }
    capped = {
        (r.item1, r.item2): r.support
        for r in cooccurrence_pairs(df, "b", "i", max_basket_size=10).collect()
    }
    small_only = {
        (r.item1, r.item2): r.support
        for r in cooccurrence_pairs(
            df.filter(F.col("b") != "hot"), "b", "i"
        ).collect()
    }
    # capped == uncapped minus the oversized basket's contribution
    assert capped == small_only
    assert sum(uncapped.values()) == sum(capped.values()) + 30 * 29 // 2
    # cap larger than every basket is a no-op
    nocap = {
        (r.item1, r.item2): r.support
        for r in cooccurrence_pairs(df, "b", "i", max_basket_size=64).collect()
    }
    assert nocap == uncapped


# ---------------------------------------------------------------------------
# rendezvous_shard salt validation (ADVICE r8)
# ---------------------------------------------------------------------------


def test_rendezvous_shard_rejects_injectable_salt(spark):
    from kcl_akka_stream_spark.operators.layout import rendezvous_shard

    for bad in ["a'b", 'a"b', "a\\b", "", "a b", "a;b"]:
        with pytest.raises(ValueError):
            rendezvous_shard("cast(x as string)", 4, bad)
    with pytest.raises(ValueError):
        rendezvous_shard("cast(x as string)", 0, "ok")
    # a clean salt still works end-to-end
    df = spark.createDataFrame([(i,) for i in range(20)], "x long")
    out = df.select(rendezvous_shard("cast(x as string)", 4, "v1.0|r9").alias("s"))
    shards = {r.s for r in out.collect()}
    assert shards <= set(range(4)) and len(shards) > 1
