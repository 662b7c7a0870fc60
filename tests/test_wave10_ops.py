"""Round-8 wave-10 operators: multi-source BFS, vocab stats, quality funnel."""

import pytest
from pyspark.sql import functions as F


def test_bfs_distance_multi_source_min_hops(spark):
    from kcl_akka_stream_spark.operators.graph import bfs_distance

    # path 1-2-3-4-5 plus seed 10 attached to 4: distances are the MIN
    # over both sources
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    out = {r.node: r.dist for r in bfs_distance(edges, [1, 10], 3).collect()}
    assert out == {1: 0, 10: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_distance_rounds_bound_reach(spark):
    from kcl_akka_stream_spark.operators.graph import bfs_distance

    und = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    out = {r.node: r.dist for r in bfs_distance(edges, [1], 2).collect()}
    # node 4 is 3 hops away -> absent at rounds=2
    assert out == {1: 0, 2: 1, 3: 2}
    with pytest.raises(ValueError):
        bfs_distance(edges, [], 2)


def test_vocab_stats_counts_hapax_and_head_mass(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = {r.lang: r for r in QUERIES["text_vocab_stats"](spark, sf_dir).collect()}
    for lang, r in rows.items():
        assert 0 < r.n_vocab <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_vocab
        assert 0 < r.top100_mass_micro <= 1_000_000


def test_quality_funnel_is_monotone(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = sorted(
        QUERIES["pipeline_quality_funnel"](spark, sf_dir).collect(),
        key=lambda r: r.stage,
    )
    assert [r.stage_name for r in rows] == [
        "ingest",
        "length",
        "gopher",
        "exact_dedup",
    ]
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs <= a.n_docs
        assert b.n_tokens <= a.n_tokens
    assert rows[0].n_docs > 0


def test_login_streaks_islands_logic(spark):
    from kcl_akka_stream_spark.queries.registry import tbl  # noqa: F401
    import datetime

    from kcl_akka_stream_spark.queries import QUERIES  # noqa: F401
    from pyspark.sql import Window

    # build directly: user 1 active days 1,2,3, 7,8; user 2 day 5 only
    rows = [
        (1, datetime.date(2024, 1, d)) for d in (1, 2, 3, 7, 8)
    ] + [(2, datetime.date(2024, 1, 5))]
    days = spark.createDataFrame(rows, ["user_id", "d"])
    isl = days.withColumn(
        "island",
        F.expr("date_sub(d, row_number() OVER (PARTITION BY user_id ORDER BY d))"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("s")
    )
    wb = Window.partitionBy("user_id").orderBy(F.col("len").desc(), "s")
    best = {
        r.user_id: (r.len, str(r.s))
        for r in runs.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert best[1] == (3, "2024-01-01")
    assert best[2] == (1, "2024-01-05")


def test_asof_tolerance_nulls_stale_matches(spark):
    import datetime

    from kcl_akka_stream_spark.operators.joins import asof_join

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + datetime.timedelta(minutes=mins)

    left = spark.createDataFrame(
        [(1, ts(0), "fresh"), (1, ts(200), "stale")], ["k", "t", "tag"]
    )
    right = spark.createDataFrame(
        [(1, ts(-30), 99)], ["k", "t", "v"]
    ).select("k", "t", "v", F.col("t").alias("vt"))
    j = asof_join(left, right, "k", "t", "t", ["v", "vt"])
    within = F.col("vt") >= F.col("t") - F.expr("INTERVAL 1 HOUR")
    out = {
        r.tag: r.v
        for r in j.select("tag", F.when(within, F.col("v")).alias("v")).collect()
    }
    assert out["fresh"] == 99     # 30 min stale -> within tolerance
    assert out["stale"] is None   # 230 min stale -> nulled
