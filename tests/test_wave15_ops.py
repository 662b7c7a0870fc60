"""Round-8 wave-15 queries: repetition gate, rolling distinct actives,
Markov transitions — invariants beyond the oracle gate."""

from pyspark.sql import functions as F


def test_repeated_ngram_ratio_bounds_and_construction(spark):
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries.registry import tbl

    # hand-built docs via a temp view is overkill: check on the operator
    # expression directly with a tiny DataFrame mirroring the query body
    from kcl_akka_stream_spark.operators.text import tokens

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # 7 grams: abc(3) bca(2) cab(2) -> 3 distinct
            (2, "x y z w"),             # 2 grams, both unique
            (3, "q q"),                 # <3 tokens: excluded
        ],
        ["doc_id", "text"],
    )
    t = docs.select("doc_id", tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 3
    )
    grams = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2),"
                " i -> concat_ws(' ', slice(t, i, 3)))"
            )
        ).alias("g"),
    )
    gc = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("cnt"))
    out = {
        r.doc_id: r
        for r in gc.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("max_cnt"),
        )
        .collect()
    }
    assert out[1].n_grams == 7 and out[1].n_distinct == 3 and out[1].max_cnt == 3
    assert out[2].n_grams == 2 and out[2].n_distinct == 2
    assert 3 not in out


def test_rolling_distinct_wau_bounds_dau(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["w_rolling_distinct_users"](spark, sf_dir).collect()
    assert rows
    by_day = {r.day: r for r in rows}
    days = sorted(by_day)
    for r in rows:
        # WAU over a window containing the day can never be below DAU
        assert r.wau7 >= r.dau > 0
    # WAU7 of a day must not exceed the sum of the 7 contributing DAUs
    for i, d in enumerate(days):
        window = [by_day[x] for x in days[max(0, i - 6): i + 1]]
        assert by_day[d].wau7 <= sum(x.dau for x in window)


def test_markov_transitions_rows_normalize(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["agg_markov_transitions"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    per_from = defaultdict(list)
    for r in rows:
        assert r.n > 0 and 0 <= r.prob_ppm <= 1_000_000
        per_from[r.from_type].append(r)
    for ft, rs in per_from.items():
        total_ppm = sum(r.prob_ppm for r in rs)
        # integer truncation loses at most (k-1) ppm units per row group
        assert 1_000_000 - len(rs) < total_ppm <= 1_000_000
