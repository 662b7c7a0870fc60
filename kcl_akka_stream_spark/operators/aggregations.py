"""Aggregations / grouping (SURVEY §2.5, A1-A5).

The reference's test oracles (IT/MessageUtil.scala:9-61) define the
correctness semantics of the whole library: per-key ordered, at-least-once,
duplicates only as contiguous replay-from-checkpoint prefixes.  Here they are
first-class operators.  All aggregation is partial/final hash-agg via
Catalyst; group-by keys hash-partition, so the plan scales linearly in
executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_by_key(df: DataFrame, key_col: str, value_col: str, order_col: str) -> DataFrame:
    """A1 -- ``groupByKey``: Seq[(k,v)] -> per-key value list preserving
    arrival order and duplicates (IT/MessageUtil.scala:15-22; duplicate
    preservation proven IT/MessageUtilTest.scala:9-13).

    Spark's collect_list order is only deterministic within a sorted
    partition, so the order column is carried into structs and sorted
    explicitly -- deterministic at any parallelism.
    """
    return df.groupBy(key_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v")))),
            lambda s: s.getField("v"),
        ).alias("values")
    )


def dedup_and_group_by_key(df: DataFrame, key_col: str, value_col: str, order_col: str) -> DataFrame:
    """A2 -- ``dedupAndGroupByKey`` (IT/MessageUtil.scala:9-13): A1 then
    per-key replay-dedup.  The strict acceptance variant (throws on true
    reordering) lives in operators.replay.remove_reprocessed; this relational
    form keeps the first occurrence of each value in order.
    """
    first_seen = df.groupBy(key_col, value_col).agg(F.min(order_col).alias("__first_o"))
    return group_by_key(first_seen, key_col, value_col, "__first_o")


def counts(df: DataFrame, key_col: str) -> DataFrame:
    """A4 -- size / keyset-size / distinct counts
    (IT/KinesisSourceTest.scala:86,154-159)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.countDistinct(key_col).alias("n_keys"),
        F.approx_count_distinct(key_col).alias("approx_n_keys"),
    )


def shard_stats(df: DataFrame, shard_col: str, event_col: str, ok_value: str) -> DataFrame:
    """A5 -- stats counters grouped by shard-consumer id
    (IT/Inspectable.scala:95-106): per shard, total events and count of a
    given event class (e.g. checkpoint-acked vs throttled)."""
    return df.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col(event_col) == ok_value, 1)).alias("n_matching"),
    )
