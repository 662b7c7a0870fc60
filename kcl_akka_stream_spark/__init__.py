"""kcl_akka_stream_spark — a PySpark-native analytics/streaming engine with the
query and data-processing capabilities of StreetContxt/kcl-akka-stream.

The reference (/root/reference, read-only) wraps the AWS Kinesis Client Library
as an Akka Streams ``Source[KinesisRecord]`` with an out-of-order-safe
checkpoint tracker.  This package re-expresses that surface Spark-first:

- the record envelope  -> a fixed StructType (``envelope``)
- the combinator API   -> DataFrame/Spark-SQL built-ins (``operators``)
- the checkpoint tracker -> window queries + Structured Streaming commit log
  (``operators.checkpoint``, ``streaming``)
- the test oracles (groupByKey / removeReprocessed) -> first-class operators
  (``operators.aggregations``, ``operators.replay``)

Plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference delegates downstream.
"""

from kcl_akka_stream_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
