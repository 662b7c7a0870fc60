"""Bucketed-table sink/source: shuffle-free co-located joins.

Beyond-reference extension (the reference has no storage layer at all --
payloads are opaque Kinesis blobs).  At 100 TB the single most effective
join optimization is not doing the shuffle: write both sides bucketed by
the join key with the same bucket count, and every subsequent equi-join
on that key is planned WITHOUT an Exchange on either side -- each task
zips bucket i with bucket i.  With ``sortBy`` the per-bucket sort is
pre-paid at write time too, so the sort-merge join degenerates to a
streaming merge of two sorted files.

This is the batch counterpart of the reference's per-shard ordering
guarantee (records within a shard arrive ordered; SURVEY §2.7 W1): the
bucket is the shard, the sortBy is the sequence order, and downstream
operators rely on the layout instead of re-establishing it.

Write path uses ``saveAsTable`` (bucket metadata lives in the catalog;
plain ``parquet(path)`` cannot record it) with an explicit ``path`` so
the data stays external and droppable.  Plan property is enforced by
tests/test_plans.py::test_bucketed_join_is_shuffle_free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed table (overwriting any previous
    definition).  ``n_buckets`` must match across tables that will join."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
