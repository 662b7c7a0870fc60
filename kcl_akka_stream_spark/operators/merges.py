"""Merge / union / routing (SURVEY §2.4, U1-U4).

The reference's MergeHub fan-in (KinesisSource.scala:70-71) and static
``Source.combine(...)(Merge(_))`` (IT/KinesisTestComponents.scala:46) are
union-of-partitions; in Spark a multi-partition DataFrame is already merged,
and explicit merges are ``unionByName`` -- a zero-shuffle narrow op.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge(*dfs: DataFrame) -> DataFrame:
    """U1/U2 -- dynamic/static fan-in of N streams into one.

    ``unionByName`` is narrow (no shuffle): partitions concatenate, which is
    exactly the MergeHub semantics (interleaving unspecified, per-upstream
    order preserved within partitions).
    """
    if not dfs:
        raise ValueError("merge() needs at least one DataFrame")
    return reduce(lambda a, b: a.unionByName(b), dfs)


def demux_process_remux(df: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """U3 -- ``groupBy(key).detach ... mergeSubstreams``
    (IT/KinesisTestProducer.scala:37-46): demux by key, per-key ordered
    processing, remux.  Spark: hash-repartition on the key + sort within
    partitions -- per-key order restored without a global sort.
    """
    return df.repartition(F.col(key_col)).sortWithinPartitions(key_col, order_col)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """U4 -- multiset difference (test-assertion algebra,
    IT/KinesisSourceTest.scala:261-271)."""
    return left.exceptAll(right)


def intersect_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """U4 -- multiset intersection."""
    return left.intersectAll(right)
