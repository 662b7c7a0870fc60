"""Structured Streaming pipeline assembly (SURVEY §2.9, §3.1-§3.3).

The reference's query lifecycle -- graph assembly, materialization, KCL
worker, per-shard sub-streams, graceful shutdown (KinesisSource.scala:63-95,
148-163) -- maps onto Structured Streaming's own runtime:

- ``Source`` blueprint      -> unresolved streaming DataFrame
- materialization (.run())  -> ``writeStream.start()``
- mat-value Future[Done]    -> ``StreamingQuery.awaitTermination()``
- KillSwitch.abort          -> query exception -> awaitTermination throws
- shardEnded drain+checkpoint / lease-lost replay -> epoch commit log +
  restart-from-checkpoint (tested in tests/test_streaming.py)

The file source stands in for Kinesis in tests (same envelope schema); a
real deployment swaps in the Kinesis connector options from
``ConsumerConfig.reader_options()`` (sources/kinesis.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcl_akka_stream_spark.envelope import ENVELOPE_SCHEMA


def envelope_file_stream(spark: SparkSession, directory: str, *, max_files_per_trigger: int | None = None) -> DataFrame:
    """S1-equivalent source: an envelope-schemed stream from a directory.

    ``maxFilesPerTrigger`` is the admission-control knob standing in for the
    reference's zero-buffer backpressure (KinesisSource.scala:190): the
    trigger paces ingestion instead of blocking a producer thread.
    """
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(directory)


def with_event_time_windows(
    df: DataFrame,
    *,
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "approximateArrivalTimestamp",
    key_col: str = "partitionKey",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation (absent in the
    reference -- SURVEY §2.9 'watermarks/windows: absent'; Spark built-in)."""
    win = F.window(ts_col, window_duration, slide) if slide else F.window(ts_col, window_duration)
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


def session_windows(
    df: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "approximateArrivalTimestamp",
    key_col: str = "partitionKey",
) -> DataFrame:
    """Watermarked session windows (session_window built-in)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


def dedup_within_watermark(
    df: DataFrame,
    *,
    watermark: str = "1 hour",
    ts_col: str = "approximateArrivalTimestamp",
    keys: list[str] | None = None,
) -> DataFrame:
    """At-least-once -> effectively-once: replay duplicates dropped inside
    the watermark horizon (the engine's answer to the reference's
    'duplicates only as contiguous replay' envelope)."""
    keys = keys or ["partitionKey", "sequenceNumber", "subSequenceNumber"]
    return df.withWatermark(ts_col, watermark).dropDuplicates(keys)


def start_to_memory(df: DataFrame, name: str, *, output_mode: str = "append", checkpoint_dir: str | None = None):
    """Materialize to an inspectable memory sink (S8 -- the reference's
    Inspectable.sink, IT/Inspectable.scala:19-53)."""
    writer = df.writeStream.outputMode(output_mode).format("memory").queryName(name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
