"""Round-9 wave-18 operators: exact weighted median, Pearson sufficient
statistics, deterministic DP-noised counts, cosine range search, RAKE
keyword extraction."""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# weighted_median: hand-checked CDF pick
# ---------------------------------------------------------------------------


def test_weighted_median_hand_checked(spark):
    from kcl_akka_stream_spark.operators.aggregations import weighted_median

    # g=a: values 10(w1), 20(w1), 30(w10) -> total 12, half 6 -> median 30
    # g=b: values 1(w2), 2(w2)            -> total 4, 2*cw(1)=4 >= 4 -> 1
    rows = [("a", 10, 1), ("a", 20, 1), ("a", 30, 10), ("b", 1, 2), ("b", 2, 2)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {r.g: (r.total_w, r.wmedian) for r in weighted_median(df, "g", "v", "w").collect()}
    assert got == {"a": (12, 30), "b": (4, 1)}


def test_weighted_median_unit_weights_match_lower_median(spark):
    from kcl_akka_stream_spark.operators.aggregations import weighted_median

    df = spark.createDataFrame(
        [("g", v, 1) for v in [5, 1, 9, 3, 7, 11]], "g string, v long, w long"
    )
    # even count, lower median of sorted [1,3,5,7,9,11] = 5
    assert weighted_median(df, "g", "v", "w").collect()[0].wmedian == 5


# ---------------------------------------------------------------------------
# pearson_stats: exact r on constructed lines
# ---------------------------------------------------------------------------


def test_pearson_perfect_and_inverse(spark):
    from kcl_akka_stream_spark.operators.aggregations import pearson_stats

    rows = [("up", x, 2 * x + 3) for x in range(10)] + [
        ("down", x, 100 - 5 * x) for x in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in pearson_stats(df, "g", "x", "y").collect()}
    assert got["up"].corr_r == 1.0
    assert got["down"].corr_r == -1.0
    assert got["up"].beta_micro == 2_000_000
    assert got["down"].beta_micro == -5_000_000


def test_pearson_constant_y_is_null(spark):
    from kcl_akka_stream_spark.operators.aggregations import pearson_stats

    df = spark.createDataFrame(
        [("g", x, 7) for x in range(5)], "g string, x long, y long"
    )
    r = pearson_stats(df, "g", "x", "y").collect()[0]
    assert r.corr_r is None  # zero variance -> undefined, not a crash
    assert r.n == 5 and r.sy == 35


# ---------------------------------------------------------------------------
# pseudo_dp_noised_counts: determinism + bounded noise + nonnegativity + required seed
# ---------------------------------------------------------------------------


def test_pseudo_dp_noised_counts_deterministic_and_bounded(spark):
    from kcl_akka_stream_spark.operators.sampling import pseudo_dp_noised_counts

    rows = [(f"t{i % 4}",) for i in range(400)]
    df = spark.createDataFrame(rows, "g string")
    a = {r.g: r.n_noised for r in pseudo_dp_noised_counts(df, "g", seed="dp").collect()}
    b = {r.g: r.n_noised for r in pseudo_dp_noised_counts(df, "g", seed="dp").collect()}
    assert a == b  # seeded noise: same answer every run
    # truncated geometric noise is within [-8, 8] and counts stay >= 0
    for g, n in a.items():
        assert abs(n - 100) <= 8
        assert n >= 0
    # a different seed moves at least one group (noise really applied)
    c = {r.g: r.n_noised for r in pseudo_dp_noised_counts(df, "g", seed="dp2").collect()}
    assert c != a or any(v != 100 for v in a.values())


def test_pseudo_dp_noised_counts_clamps_small_groups(spark):
    from kcl_akka_stream_spark.operators.sampling import pseudo_dp_noised_counts

    # single-row groups: noise could push below zero; the clamp holds
    df = spark.createDataFrame([(f"g{i}",) for i in range(50)], "g string")
    assert all(r.n_noised >= 0 for r in pseudo_dp_noised_counts(df, "g", seed="dp").collect())


# ---------------------------------------------------------------------------
# range_search: hand-checked radius semantics
# ---------------------------------------------------------------------------


def test_range_search_threshold_boundary(spark):
    from kcl_akka_stream_spark.operators.similarity import range_search

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),   # cos with q = 1.0
            (2, [1.0, 1.0]),   # cos ~ 0.707107
            (3, [0.0, 1.0]),   # cos = 0.0
            (4, [-1.0, 0.0]),  # cos = -1.0
        ],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = {r.n_id for r in range_search(corpus, q, threshold=0.5).collect()}
    assert got == {1, 2}
    # the query never matches itself even at cos=1
    corpus2 = corpus.union(q)
    got2 = {r.n_id for r in range_search(corpus2, q, threshold=0.5).collect()}
    assert 0 not in got2


# ---------------------------------------------------------------------------
# RAKE: hand-checked degree/frequency scoring
# ---------------------------------------------------------------------------


def test_rake_scores_hand_checked(spark):
    from kcl_akka_stream_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "The quick brown fox and the lazy dog!")],
        "doc_id long, text string",
    )
    got = {r.phrase: (r.n_occurrences, r.score_micro) for r in rake_keywords(df).collect()}
    # "quick brown fox": each word deg=3 freq=1 -> 3e6; phrase = 9e6
    # "lazy dog": each word deg=2 freq=1 -> 2e6; phrase = 4e6
    assert got == {
        "quick brown fox": (1, 9_000_000),
        "lazy dog": (1, 4_000_000),
    }


def test_rake_degree_accumulates_across_phrases(spark):
    from kcl_akka_stream_spark.operators.text import rake_keywords

    # "deep learning" twice and "deep dive" once: deep deg=2+2+2=6 freq=3
    # -> 2e6; learning deg=4 freq=2 -> 2e6; dive deg=2 freq=1 -> 2e6.
    df = spark.createDataFrame(
        [(1, "deep learning and deep learning for the deep dive")],
        "doc_id long, text string",
    )
    got = {r.phrase: (r.n_occurrences, r.score_micro) for r in rake_keywords(df).collect()}
    assert got["deep learning"] == (2, 4_000_000)
    assert got["deep dive"] == (1, 4_000_000)


def test_rake_phrases_bounded_by_max_words(spark):
    from kcl_akka_stream_spark.operators.text import rake_phrases

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    # a 5-word content run exceeds max_words=3 -> no phrases at all
    assert rake_phrases(df, max_words=3).count() == 0
    assert rake_phrases(df, max_words=5).count() == 1


def test_pseudo_dp_seed_is_required():
    # ADVICE r9 (medium): a hardcoded public default seed invites
    # treating the output as private.  The seed is now a REQUIRED
    # argument -- calling without one is a TypeError at bind time.
    import inspect

    from kcl_akka_stream_spark.operators.sampling import (
        pseudo_dp_noised_counts,
    )

    sig = inspect.signature(pseudo_dp_noised_counts)
    assert sig.parameters["seed"].default is inspect.Parameter.empty
