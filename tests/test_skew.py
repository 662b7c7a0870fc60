"""Salting operators: result-identical to unsalted forms, and the salt
actually spreads a hot key over multiple reducer groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from kcl_akka_stream_spark.operators.skew import _row_salt, salted_aggregate, salted_join


def test_salted_aggregate_matches_plain(spark):
    rows = [("hot", i) for i in range(500)] + [("cold", i) for i in range(7)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r.k: (r.n, r.total)
        for r in salted_aggregate(df, ["k"], sums={"v": "total"}, count_alias="n").collect()
    }
    assert got == {"hot": (500, sum(range(500))), "cold": (7, sum(range(7)))}


def test_salt_spreads_hot_key(spark):
    df = spark.createDataFrame([("hot", i) for i in range(200)], "k string, v long")
    n_distinct = df.select(_row_salt(df, 16).alias("s")).distinct().count()
    assert n_distinct > 8  # one hot key fans out over most of the salt range


def test_salted_join_matches_plain(spark):
    fact = spark.createDataFrame([(1, i) for i in range(100)] + [(2, 0)], "fk long, v long")
    dim = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "fk long, name string")
    salted = salted_join(fact, dim, on="fk", n_salts=4)
    plain = fact.join(dim, on="fk")
    assert salted.count() == plain.count() == 101
    assert sorted(salted.columns) == sorted(plain.columns)
    got = salted.groupBy("name").count().collect()
    assert {r.name: r["count"] for r in got} == {"a": 100, "b": 1}


def test_aqe_splits_skewed_join_partitions(spark):
    # The AQE complement to the manual salting operators: for joins the
    # optimizer CAN fix at runtime, a hot key must trigger the skew-join
    # split (SortMergeJoin(skew=true) + an "AQEShuffleRead ... skewed"
    # reader) instead of serializing the whole hot partition through one
    # task.  Thresholds are lowered to fixture scale; the executed plan
    # is inspected AFTER the action -- the adaptive final plan only
    # exists once the query ran.  Manual salting (agg_salted_skew /
    # j_salted_skew) remains the tool where AQE cannot help: skewed
    # AGGREGATION keys and broadcast-ineligible skewed builds.
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(0, 200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("payload")
        ).union(spark.range(1, 1000).selectExpr("id as k", "id as payload"))
        right = spark.range(0, 1000).selectExpr("id as k", "id*2 as dim")
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0][0] == 200_999  # hot key joins correctly
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
