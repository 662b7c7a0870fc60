"""Plan-hygiene tests: assert the physical plans the 100 TB posture demands
-- pushdown reaching the scan, small dims broadcast, no cartesian products,
CPU-heavy maps spread across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from kcl_akka_stream_spark.plans import (
    count_in_plan,
    has_broadcast_hash_join,
    has_cartesian_product,
    pushed_filters,
    spread,
)
from kcl_akka_stream_spark.queries import QUERIES


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = QUERIES["j_broadcast_star"](spark, sf_dir)
    assert has_broadcast_hash_join(df)
    assert not has_cartesian_product(df)


def test_projection_prunes_columns(spark, sf_dir):
    # A 2-column projection must not scan all 11 lineitem columns.
    from kcl_akka_stream_spark.queries.registry import tbl
    from kcl_akka_stream_spark.plans import physical_plan

    df = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = physical_plan(df)
    assert "l_extendedprice" not in plan


def test_no_cartesian_anywhere_in_headline(spark, sf_dir):
    for name in ["dedup_minhash_lsh", "dedup_ngram_jaccard", "sim_topk_bruteforce", "j_range_bucket"]:
        df = QUERIES[name](spark, sf_dir)
        assert not has_cartesian_product(df), name


def test_topn_uses_take_ordered(spark, sf_dir):
    df = QUERIES["w_global_topn"](spark, sf_dir)
    assert count_in_plan(df, r"TakeOrderedAndProject") > 0


def test_spread_only_when_underpartitioned(spark):
    few = spark.createDataFrame([(i,) for i in range(100)], "x long").coalesce(1)
    assert spread(few).rdd.getNumPartitions() >= 2
    many = spark.range(1000).repartition(64)
    assert spread(many).rdd.getNumPartitions() == 64
