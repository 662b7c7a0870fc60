"""Plan hygiene: partition spreading + physical-plan inspection.

The reference has no optimizer (SURVEY §4) -- Catalyst supplies pushdown,
pruning, join selection, AQE.  This module is the engine's guard rails on
top: assert the plan we *want* actually materialized (filters reached the
scan, small dims broadcast, no cartesian products), and fix the one thing
Catalyst won't: parallelism of CPU-heavy expressions over few-partition
inputs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition IF the input is under-partitioned.

    Local small-file reads land in 1 partition, serializing CPU-heavy
    per-row expressions (hashing, regex, vector math).  On a real cluster
    with many files this is a no-op; prefer tuning
    ``spark.sql.files.maxPartitionBytes`` for scans at scale -- this guard
    exists for the narrow-input case where the map cost dominates the
    one-off shuffle of the input."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def count_in_plan(df: DataFrame, pattern: str) -> int:
    return len(re.findall(pattern, physical_plan(df)))


def count_operator(df: DataFrame, op: str) -> int:
    """Count physical operators by their detail header ``(N) <op>`` --
    formatted explain prints each operator in the tree AND in the detail
    section, so a bare substring count double-counts."""
    return len(re.findall(rf"\(\d+\) {op}\b", physical_plan(df)))


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count of the plan (Exchange operators, incl. broadcast)."""
    return count_operator(df, "Exchange")


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return count_in_plan(df, r"BroadcastHashJoin") > 0


def has_cartesian_product(df: DataFrame) -> bool:
    return count_in_plan(df, r"CartesianProduct") > 0


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out
