"""Reference-semantics operators as oracle-checked queries (SURVEY §2.3, §2.5).

These are the operators that carry the reference's actual delivery-guarantee
semantics: the envelope normalization, the checkpoint frontier, and the
replay-dedup acceptance scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcl_akka_stream_spark.envelope import events_as_envelope
from kcl_akka_stream_spark.operators.checkpoint import checkpoint_frontier
from kcl_akka_stream_spark.operators.projections import decode_payload
from kcl_akka_stream_spark.operators.replay import remove_reprocessed
from kcl_akka_stream_spark.queries.registry import query, tbl


@query(
    "envelope_decode",
    """
    SELECT CAST(user_id AS VARCHAR) AS key, props AS message FROM events
    """,
)
def envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P1 -- the README's extractKeyAndMessage (README.md:39-41): map the
    # events fixture onto the envelope, then decode (partitionKey, payload).
    env = events_as_envelope(tbl(spark, sf_dir, "events"))
    return decode_payload(env)


@query(
    "envelope_normalize",
    """
    SELECT CAST(user_id AS VARCHAR) AS partitionKey,
           CAST(event_id AS VARCHAR) AS sequenceNumber,
           CAST(0 AS BIGINT) AS subSequenceNumber,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS arrival_s,
           CAST(NULL AS VARCHAR) AS explicitHashKey,
           CAST(NULL AS VARCHAR) AS encryptionType
    FROM events
    """,
)
def envelope_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §1.1 -- fromMutableRecord normalization golden test
    # (KinesisRecord.scala:48-58; KinesisRecordTest.scala:15-44): optional
    # fields null, subSequenceNumber defaults to 0.
    env = events_as_envelope(tbl(spark, sf_dir, "events"))
    return env.select(
        "partitionKey",
        "sequenceNumber",
        "subSequenceNumber",
        F.date_format("approximateArrivalTimestamp", "yyyy-MM-dd HH:mm:ss").alias("arrival_s"),
        "explicitHashKey",
        "encryptionType",
    )


@query(
    "checkpoint_frontier",
    """
    WITH t AS (
      SELECT user_id AS shard_id, event_id AS seq,
             (event_type <> 'error') AS processed,
             sum(CASE WHEN event_type <> 'error' THEN 0 ELSE 1 END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS UNBOUNDED PRECEDING) AS unproc
      FROM events)
    SELECT shard_id,
           max(CASE WHEN unproc = 0 THEN seq END) AS frontier_seq,
           CAST(sum(CASE WHEN unproc = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS checkpointable_count,
           CAST(sum(CASE WHEN processed AND unproc > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS processed_uncheckpointed_count,
           CAST(sum(CASE WHEN processed THEN 0 ELSE 1 END) AS BIGINT) AS in_flight_count
    FROM t GROUP BY shard_id
    """,
)
def checkpoint_frontier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C2/W2 -- the tracker's maximal-contiguous-processed-prefix frontier
    # (RecordProcessorImpl.scala:73-78; gap case
    # ShardCheckpointTrackerTest.scala:70-81).  events models the shard
    # stream: user_id=shard, event_id=seq, processed := not an error event.
    ev = tbl(spark, sf_dir, "events").select(
        F.col("user_id").alias("shard_id"),
        F.col("event_id").alias("seq"),
        (F.col("event_type") != "error").alias("processed"),
    )
    return checkpoint_frontier(ev, "shard_id", "seq", "processed")


@query(
    "remove_reprocessed",
    """
    SELECT CAST(user_id AS VARCHAR) AS key,
           CAST(event_id AS VARCHAR) AS msg,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS position
    FROM events
    """,
)
def remove_reprocessed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A3 -- removeReprocessed (IT/MessageUtil.scala:24-61).  Build a received
    # stream with an injected contiguous replay-from-checkpoint (each shard
    # re-delivers its last 3 records), then strip it: the accepted output is
    # exactly the original per-key sequence.
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("msg"),
        F.col("event_id").alias("seq"),
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    replay = (
        ev.withColumn("__rev", F.row_number().over(w)).filter(F.col("__rev") <= 3).drop("__rev")
    )
    # Arrival order: all originals (phase 0) then the replayed tail (phase 1).
    received = ev.withColumn("phase", F.lit(0)).unionByName(replay.withColumn("phase", F.lit(1)))
    received = received.withColumn("arrival", F.col("phase") * 10_000_000_000 + F.col("seq"))
    return remove_reprocessed(received, "key", "msg", "arrival")


@query(
    "envelope_seq_order",
    """
    SELECT user_id AS shard, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
    FROM events
    """,
)
def envelope_seq_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1 compound ordering invariant (KinesisRecord.scala:39-44): per-shard
    # order is (sequenceNumber, subSequenceNumber), where sequenceNumber is
    # a DECIMAL STRING of arbitrary width -- ordered via (length, lex),
    # which never overflows (vs DecimalType(38,0)).  seq = event_id div 3
    # as a string (widths vary 1..5 digits), subSeq = event_id % 3 (the KPL
    # aggregation sub-index); the string-order rank must equal the numeric
    # rank the oracle computes.
    from kcl_akka_stream_spark.envelope import seq_order_key
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events").select(
        F.col("user_id").alias("shard"),
        "event_id",
        F.expr("CAST(event_id div 3 AS STRING)").alias("sequenceNumber"),
        (F.col("event_id") % 3).alias("subSequenceNumber"),
    )
    w = Window.partitionBy("shard").orderBy(*seq_order_key("sequenceNumber"), F.col("subSequenceNumber"))
    return ev.select("shard", "event_id", F.row_number().over(w).alias("rn"))


_ENVELOPE_SIM_ORACLE = """
    WITH shards AS (SELECT s FROM generate_series(0, 7) t(s)),
    seqs AS (SELECT i FROM generate_series(1, 250) t(i))
    SELECT 'shardId-' || lpad(CAST(s AS VARCHAR), 12, '0') AS shard_id,
           CAST(i AS BIGINT) AS sequence_number,
           md5('pk-' || s || '-' || i) AS partition_key,
           'msg-' || s || '-' || i AS data,
           strftime(TIMESTAMP '2026-01-01 00:00:00' + i * INTERVAL 1 SECOND,
                    '%Y-%m-%d %H:%M:%S') AS arrival_s
    FROM shards, seqs
"""


@query("source_python_datasource", _ENVELOPE_SIM_ORACLE)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S1 via the Spark 4 Python Data Source API: the connector seam the
    # env-gated Kinesis jar blocks, implemented for real as a pure-Python
    # DataSource (sources/python_source.py) emitting the reference's
    # record shape (KinesisRecord.scala:12-19) with one InputPartition per
    # shard (S5's shard->sub-source mapping).  Deterministic generation ->
    # the oracle reproduces every row, making this the first
    # connector-family entry the gate hash-checks end-to-end.
    from kcl_akka_stream_spark.sources.python_source import register

    register(spark)
    df = spark.read.format("envelope_sim").load()
    return df.select(
        "shard_id",
        "sequence_number",
        "partition_key",
        "data",
        F.date_format("arrival_ts", "yyyy-MM-dd HH:mm:ss").alias("arrival_s"),
    )
