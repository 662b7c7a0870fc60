"""Structured Streaming queries exposed through the batch correctness gate.

Each callable runs a REAL streaming query (readStream -> transform ->
memory sink, driven to completion with processAllAvailable) and returns the
sink table -- so the DuckDB oracle checks end-to-end streaming semantics,
not a batch re-expression (SURVEY §2.9).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcl_akka_stream_spark.queries.registry import query, tbl


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


@query(
    "stream_tumbling_agg",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 -- tumbling event-time window over the envelope stream (absent in
    # the reference; Spark-native watermark+window).  Complete output mode ->
    # every window is emitted once the file stream drains.
    name = f"stream_agg_{uuid.uuid4().hex[:8]}"
    ev = tbl(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="kcl_spark_agg_")
    ev.write.mode("overwrite").parquet(tmp)  # file stream source needs a dir
    stream = spark.readStream.schema(ev.schema).parquet(tmp)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), (F.sum(_cents(F.col("value"))).cast("double") / F.lit(100.0)).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    try:
        q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "stream_dedup",
    """
    SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 at-least-once replay -> exactly-once via watermarked
    # dropDuplicates: the source directory holds TWO copies of every event
    # (a simulated replay-from-checkpoint); the streaming dedup must emit
    # each exactly once.
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    ev = tbl(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="kcl_spark_dedup_")
    try:
        ev.write.mode("overwrite").parquet(tmp)
        ev.write.mode("append").parquet(tmp)  # the replayed duplicates
        stream = spark.readStream.schema(ev.schema).parquet(tmp)
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
        q = deduped.writeStream.outputMode("append").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return (
            spark.table(name)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
