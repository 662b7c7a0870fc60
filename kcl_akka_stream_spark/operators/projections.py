"""Record-at-a-time transforms (SURVEY §2.2, P1-P6).

The reference's contract is "feed Source[KinesisRecord] into Akka
combinators"; its README/tests pin the exact surface.  All of them map onto
DataFrame built-ins -- JVM-side, whole-stage-codegen'd, no Python in the hot
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decode_payload(df: DataFrame, charset: str = "UTF-8") -> DataFrame:
    """P1 -- projection/decode: ``(partitionKey, data.utf8String)``.

    Reference usage: README.md:39-41,84-86 and
    IT/KinesisTestComponents.scala:84-89 (``extractKeyAndMessage``).
    """
    return df.select(
        F.col("partitionKey").alias("key"),
        F.decode(F.col("data"), charset).alias("message"),
    )


def decode_json_payload(df: DataFrame, schema: str) -> DataFrame:
    """P1 variant: decode the opaque payload as JSON with a user schema.

    The reference never inspects the payload (SURVEY §1.3); schema is
    user-supplied at decode time, exactly like Spark's Kafka/Kinesis pattern.
    """
    return df.withColumn("payload", F.from_json(F.decode(F.col("data"), "UTF-8"), schema))


def ack_passthrough(df: DataFrame) -> DataFrame:
    """P2 -- the ``markProcessed()`` side-effecting map (README.md:46-50).

    In Spark the at-least-once ack is the micro-batch epoch commit, so the
    data-op is identity; kept as a named operator for API parity.
    """
    return df.select("*")


def filter_bootstrap(df: DataFrame, key_col: str = "partitionKey", prefix: str = "bootstrap") -> DataFrame:
    """P3 -- predicate routing: drop bootstrap-keyed records, keep the rest
    (IT/KinesisTestComponents.scala:105-113 ``filterBootstrapMessages``)."""
    return df.filter(~F.col(key_col).startswith(prefix))


def flatten(df: DataFrame, array_col: str, out_col: str | None = None) -> DataFrame:
    """P4 -- ``mapConcat``: un-batch an array column record-by-record
    (KinesisSource.scala:191, README.md:45) via ``explode``."""
    out = out_col or array_col
    others = [c for c in df.columns if c != array_col]
    return df.select(*others, F.explode(F.col(array_col)).alias(out))


def grouped(df: DataFrame, n: int, order_col: str, group_col: str = "batch_id") -> DataFrame:
    """P5 -- ``grouped(n)``: fixed-size batching (README.md:43).

    Deterministic batch assignment by a monotone order column (the envelope's
    sequence number); collecting each batch into an array is then a plain
    groupBy.  At scale this is a single hash partition on batch_id.
    """
    return df.withColumn(group_col, F.floor(F.col(order_col) / F.lit(n)).cast("long"))
