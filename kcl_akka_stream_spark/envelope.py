"""The KinesisRecord envelope as a Spark schema + normalization helpers.

Reference: the single record type ``KinesisRecord``
(src/main/scala/com/contxt/kinesis/KinesisRecord.scala:12-20) -- a flat,
immutable 7-field row with an opaque binary payload.  Its
``fromMutableRecord`` constructor (KinesisRecord.scala:48-58) normalizes the
mutable KCL record, wrapping nullable Java fields.  Here the envelope is a
fixed ``StructType``; nullability carries the Option-ness; the per-record
``Promise[Done]`` ack channel (KinesisRecord.scala:21-37) has no data
equivalent -- Spark's micro-batch epoch commit acks a whole batch at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Fixed envelope schema (SURVEY §1.6).  Per-shard total order is
#: ``(sequenceNumber, subSequenceNumber)`` (KinesisRecord.scala:39-44).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType(), False),
        T.StructField("partitionKey", T.StringType(), False),
        T.StructField("explicitHashKey", T.StringType(), True),
        T.StructField("sequenceNumber", T.StringType(), False),
        T.StructField("subSequenceNumber", T.LongType(), True),
        T.StructField("approximateArrivalTimestamp", T.TimestampType(), False),
        T.StructField("encryptionType", T.StringType(), True),
    ]
)

ENVELOPE_COLUMNS = [f.name for f in ENVELOPE_SCHEMA.fields]


def normalize_envelope(df: DataFrame) -> DataFrame:
    """Coerce a raw source DataFrame into the canonical envelope.

    Mirrors ``KinesisRecord.fromMutableRecord`` (KinesisRecord.scala:48-58):
    missing optional fields become NULL columns; ``subSequenceNumber``
    defaults to 0 for non-KPL-aggregated records (KinesisRecordTest.scala:42).
    """
    cols = set(df.columns)
    out = df
    if "explicitHashKey" not in cols:
        out = out.withColumn("explicitHashKey", F.lit(None).cast("string"))
    if "subSequenceNumber" not in cols:
        out = out.withColumn("subSequenceNumber", F.lit(0).cast("long"))
    if "encryptionType" not in cols:
        out = out.withColumn("encryptionType", F.lit(None).cast("string"))
    out = (
        out.withColumn("data", F.col("data").cast("binary"))
        .withColumn("partitionKey", F.col("partitionKey").cast("string"))
        .withColumn("sequenceNumber", F.col("sequenceNumber").cast("string"))
        .withColumn("subSequenceNumber", F.col("subSequenceNumber").cast("long"))
        .withColumn("approximateArrivalTimestamp", F.col("approximateArrivalTimestamp").cast("timestamp"))
    )
    return out.select(*ENVELOPE_COLUMNS)


def events_as_envelope(events: DataFrame) -> DataFrame:
    """Map the driver's ``events`` fixture onto the envelope.

    ``user_id`` plays partitionKey (shard routing key), ``event_id`` plays
    sequenceNumber, ``ts`` the arrival timestamp, and the JSON ``props``
    string is the opaque payload (FIXTURES.md §4).
    """
    return normalize_envelope(
        events.select(
            F.encode(F.col("props"), "UTF-8").alias("data"),
            F.col("user_id").cast("string").alias("partitionKey"),
            F.col("event_id").cast("string").alias("sequenceNumber"),
            F.col("ts").alias("approximateArrivalTimestamp"),
        )
    )


#: Sequence numbers are decimal strings totally ordered per shard
#: (KinesisRecord.scala:16, README.md:100-102).  Order them numerically at
#: any width via (length, lexicographic) -- avoids DecimalType(38,0) overflow
#: for >38-digit Kinesis sequence numbers.
def seq_order_key(col: str = "sequenceNumber"):
    return [F.length(F.col(col)), F.col(col)]
