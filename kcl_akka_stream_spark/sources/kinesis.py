"""Kinesis streaming source adapter (SURVEY §2.1 S1-S6).

The real Kinesis connector (e.g. spark-sql-kinesis) is not bundled in this
environment; this module builds the reader and validates options so a
deployment with the connector jar on the classpath works unchanged, and
tests can assert the option mapping (the reference's worker-factory
injection seam, KinesisSource.scala:63-68, re-expressed as a format
parameter).

For the full source PROTOCOL without the jar, see
``sources/python_source.py``: a pure-Python Data Source (Spark 4 API)
implementing the paced micro-batch offset contract end-to-end with the
same per-shard partitioning -- the gate verifies it row-for-row
(source_python_datasource / stream_python_datasource).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kcl_akka_stream_spark.config import ConsumerConfig

DEFAULT_FORMAT = "aws-kinesis"


class KinesisConnectorMissing(RuntimeError):
    pass


def kinesis_stream(
    spark: SparkSession,
    config: ConsumerConfig,
    *,
    region: str | None = None,
    fmt: str = DEFAULT_FORMAT,
) -> DataFrame:
    """S1/S2 -- build the envelope stream from a Kinesis connector.

    Raises KinesisConnectorMissing when the connector jar is absent (this
    container); callers fall back to ``streaming.pipeline.envelope_file_stream``
    which yields the identical envelope schema.
    """
    reader = spark.readStream.format(fmt)
    for k, v in config.reader_options().items():
        reader = reader.option(k, v)
    if region:
        reader = reader.option("region", region)
    try:
        return reader.load()
    except Exception as e:  # connector not on classpath
        if "Failed to find" in str(e) or "DATA_SOURCE_NOT_FOUND" in str(e):
            raise KinesisConnectorMissing(
                f"streaming format {fmt!r} is not on the classpath; "
                "use streaming.pipeline.envelope_file_stream for local runs"
            ) from e
        raise
