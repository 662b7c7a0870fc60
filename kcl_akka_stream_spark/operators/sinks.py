"""Sinks: the reference's producer-side surface.

- S7 key-ordered producer sink (IT/KinesisTestProducer.scala:29-53):
  ``groupBy(key).detach.mapAsync(1)(send).mergeSubstreams`` -- per-key
  serialized, ordered sends; materialized value = everything sent.
  Spark form: repartition by key + sortWithinPartitions -> each key's
  records land in exactly one output file, in order; the written dataset
  is the materialized "sent" manifest.
- S8 inspectable collecting sink (IT/Inspectable.scala:19-53): the memory
  sink (`streaming/pipeline.py::start_to_memory`) -- the streaming tests
  use it throughout.
- P6 mapAsync(parallelism=1) ordered effect (IT/KinesisTestProducer.scala:40-45):
  parallelism is the partition count here; within a partition the effect
  order is the sort order, exactly the per-key guarantee the reference's
  ``mapAsync(1)`` provides.

At 100 TB: one shuffle keyed by the routing key, then a streaming-friendly
sequential write per partition -- no driver collect anywhere; the manifest
stays distributed (read it back, don't .collect() it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyed_ordered_write(
    df: DataFrame,
    path: str,
    key_col: str,
    order_col: str,
    n_partitions: int | None = None,
) -> DataFrame:
    """Write ``df`` so each key's records are stored contiguously and in
    ``order_col`` order (the Kinesis per-partition-key ordering contract),
    then return the written dataset re-read -- the 'sent manifest'
    materialized value of the reference's producer sink."""
    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    (
        df.repartition(n, F.col(key_col))
        .sortWithinPartitions(key_col, order_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path)


def ordered_effect_per_key(df: DataFrame, key_col: str, order_col: str, effect_schema: str, fn):
    """P6: apply a (potentially side-effecting) Python function per key in
    strict ``order_col`` order -- ``applyInPandas`` gives one pandas frame
    per key; the function sees rows sorted, mirroring mapAsync(1) per
    substream.  Keys run in parallel across partitions, order holds within
    a key -- the exact guarantee of the reference's producer."""
    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf.sort_values(order_col, kind="mergesort"))

    return df.groupBy(key_col).applyInPandas(run, schema=effect_schema)


def compact_parquet_dir(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files.  Streaming sinks produce one file per
    partition per micro-batch; at 100 TB unmanaged, that layout destroys
    scan parallelism planning (one task per tiny file) and NameNode/listing
    cost.  Returns the number of output files.

    Round-robin repartition (not coalesce): coalesce would skip the shuffle
    but chains upstream partitioning into the write and can produce skewed
    file sizes; compaction explicitly wants evenly-sized files."""
    import math
    import os as _os

    df = spark.read.parquet(src_dir)
    disk_bytes = 0
    for root, _dirs, files in _os.walk(src_dir):
        for name in files:
            if name.endswith(".parquet"):
                disk_bytes += _os.path.getsize(_os.path.join(root, name))
    n_files = max(1, math.ceil(disk_bytes / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files


def keyed_ordered_stream_sink(path: str, key_col: str, order_col: str, n_partitions: int = 8):
    """S7, streaming form: a foreachBatch callback that appends every
    micro-batch keyed+ordered (repartition by key, sort within partitions).
    Per epoch, each key's records land contiguously and in order -- the
    per-partition-key send ordering of the reference's producer, with the
    epoch id carried so consumers can reconstruct the global per-key order
    as (epoch, file order)."""
    from pyspark.sql import functions as F

    def write(batch_df, epoch_id: int) -> None:
        (
            batch_df.withColumn("__epoch", F.lit(epoch_id))
            .repartition(n_partitions, F.col(key_col))
            .sortWithinPartitions(key_col, order_col)
            .write.mode("append")
            .parquet(path)
        )

    return write
