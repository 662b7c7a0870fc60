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

import re

from pyspark.sql import DataFrame, SparkSession

#: Plain unqualified identifier -- table names are interpolated into SQL
#: (DROP TABLE) and must never carry quoting/injection surface.
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(table: str) -> None:
    if not _IDENT.match(table):
        raise ValueError(
            f"invalid table identifier {table!r}: expected a plain "
            "[A-Za-z_][A-Za-z0-9_]* name (it is interpolated into SQL)"
        )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed table (overwriting any previous
    definition).  ``n_buckets`` must match across tables that will join --
    use ``assert_cobucketed`` to fail loudly on a mismatch instead of
    silently reintroducing the Exchange this module exists to eliminate."""
    _check_ident(table)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucket_count(spark: SparkSession, table: str) -> int | None:
    """Bucket count recorded in the catalog for ``table`` (None if the
    table is not bucketed)."""
    _check_ident(table)
    for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect():
        if r.col_name == "Num Buckets":
            return int(r.data_type)
    return None


def assert_cobucketed(spark: SparkSession, *tables: str) -> int:
    """Assert every table is bucketed with the SAME bucket count (the
    precondition for a shuffle-free co-located join) and return it."""
    counts = {t: bucket_count(spark, t) for t in tables}
    vals = set(counts.values())
    if None in vals or len(vals) != 1:
        raise ValueError(
            f"tables are not co-bucketed: {counts} -- a join between them "
            "would silently plan an Exchange; rewrite with matching "
            "bucketBy counts"
        )
    return vals.pop()


def drop_table(spark: SparkSession, table: str) -> None:
    _check_ident(table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
