"""Batch sources: the driver's parquet fixture tables.

Parquet via ``spark.read.parquet`` is the only file format the engine needs
(the reference has none -- payloads are opaque, state lives in DynamoDB via
KCL; SURVEY §2.1 file-format note).  Reads are declarative so Catalyst gets
predicate pushdown + column pruning into the scan for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Small dimension tables -- always broadcast-join these at any scale factor.
SMALL_DIMS = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark has no native
        # type for; read nanos as long and truncate to microseconds (same
        # truncation DuckDB applies).  Integer `div` keeps full precision --
        # a double division would round at 2^53.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the SQL API."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events fixture directly from its parquet file (the file
    source takes the path as a glob) -- no temp-dir copy.  Same
    nanos-to-micros handling as the batch loader."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # The file source needs a directory (or glob) -- a concrete file path
    # fails basePath validation, so glob the exact filename.
    glob_path = os.path.join(sf_dir, "events.[p]arquet")
    stream = spark.readStream.schema(schema).parquet(glob_path)
    if isinstance(schema["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream
