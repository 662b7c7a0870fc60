"""Envelope conversion golden tests -- T/KinesisRecordTest.scala parity
(SURVEY §5.1): normalization wraps missing optionals as NULL and defaults
subSequenceNumber to 0."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kcl_akka_stream_spark.envelope import ENVELOPE_COLUMNS, events_as_envelope, normalize_envelope


def test_normalize_minimal_record(spark):
    # KinesisRecordTest.scala:15-44 -- plain record: optionals absent.
    df = spark.createDataFrame(
        [("testData", "testPartitionKey", "123", datetime.datetime(2024, 1, 1))],
        "data string, partitionKey string, sequenceNumber string, approximateArrivalTimestamp timestamp",
    )
    out = normalize_envelope(df)
    assert out.columns == ENVELOPE_COLUMNS
    row = out.collect()[0]
    assert bytes(row.data) == b"testData"
    assert row.partitionKey == "testPartitionKey"
    assert row.sequenceNumber == "123"
    assert row.subSequenceNumber == 0  # default for non-KPL records (:42)
    assert row.explicitHashKey is None
    assert row.encryptionType is None


def test_normalize_kpl_aggregated_record(spark):
    # KinesisRecordTest.scala:46-86 -- KPL sub-sequence preserved.
    df = spark.createDataFrame(
        [("d", "pk", "ehk", "99", 7, datetime.datetime(2024, 1, 1), "KMS")],
        "data string, partitionKey string, explicitHashKey string, sequenceNumber string,"
        " subSequenceNumber long, approximateArrivalTimestamp timestamp, encryptionType string",
    )
    row = normalize_envelope(df).collect()[0]
    assert row.subSequenceNumber == 7
    assert row.explicitHashKey == "ehk"
    assert row.encryptionType == "KMS"


def test_events_as_envelope(spark, sf_dir):
    from kcl_akka_stream_spark.sources.batch import load_table

    ev = load_table(spark, sf_dir, "events")
    env = events_as_envelope(ev)
    assert env.columns == ENVELOPE_COLUMNS
    n = ev.count()
    assert env.count() == n
    # payload round-trips: decode(data) == props
    bad = env.join(
        ev, env.sequenceNumber == ev.event_id.cast("string")
    ).filter(F.decode(F.col("data"), "UTF-8") != F.col("props"))
    assert bad.count() == 0
