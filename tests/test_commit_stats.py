"""Commit-cadence (C3/C4) and ConsumerStats (§2.10) tests."""

from __future__ import annotations

import os
import tempfile

import pytest

from kcl_akka_stream_spark.config import ConsumerConfig, ShardCheckpointConfig
from kcl_akka_stream_spark.streaming.commit import (
    CommitTracker,
    committing_foreach_batch,
    read_commits,
)
from kcl_akka_stream_spark.streaming.stats import (
    ConsumerStats,
    NoopConsumerStats,
    RecordingStats,
    get_instance,
)


def test_count_trigger_fires_at_threshold():
    # ShardCheckpointTrackerTest.scala:26-33.
    t = CommitTracker(ShardCheckpointConfig(checkpoint_period_seconds=1e9,
                                            checkpoint_after_processing_nr_of_records=100))
    assert not t.observe(40, now=0.0)
    assert t.observe(60, now=0.0)  # cumulative 100
    t.commit(0, 100, now=0.0)
    assert not t.observe(99, now=0.0)


def test_period_trigger_fires_after_elapsed():
    # ShardCheckpointTrackerTest.scala:35-41.
    t = CommitTracker(ShardCheckpointConfig(checkpoint_period_seconds=60,
                                            checkpoint_after_processing_nr_of_records=10**9))
    t._last_commit_at = 0.0
    assert not t.observe(1, now=30.0)
    assert t.observe(1, now=61.0)


def test_at_least_once_commits_after_processing(spark):
    processed = []
    t = CommitTracker(ShardCheckpointConfig(checkpoint_period_seconds=1e9,
                                            checkpoint_after_processing_nr_of_records=1))
    with tempfile.TemporaryDirectory() as d:
        cb = committing_foreach_batch(lambda df, e: processed.append(e), t, d)
        df = spark.range(5)
        cb(df, 0)
        cb(df, 1)
        commits = read_commits(d)
        assert processed == [0, 1]
        assert [c["epoch_id"] for c in commits] == [0, 1]


def test_at_least_once_no_commit_on_failure(spark):
    # C4 failure semantics: the commit point is only recorded after the
    # user callback succeeds (checkpoint-after-processing, README.md:22-58).
    t = CommitTracker(ShardCheckpointConfig(checkpoint_after_processing_nr_of_records=1))

    def boom(df, e):
        raise RuntimeError("processing failed")

    with tempfile.TemporaryDirectory() as d:
        cb = committing_foreach_batch(boom, t, d)
        with pytest.raises(RuntimeError):
            cb(spark.range(3), 0)
        assert read_commits(d) == []


def test_no_guarantees_commits_before_processing(spark):
    # mark-before-process (README.md:61-95): commit recorded even though
    # processing then fails.
    t = CommitTracker(ShardCheckpointConfig(checkpoint_period_seconds=1e9,
                                            checkpoint_after_processing_nr_of_records=1))

    def boom(df, e):
        raise RuntimeError("processing failed")

    with tempfile.TemporaryDirectory() as d:
        cb = committing_foreach_batch(boom, t, d, mode="no-guarantees")
        with pytest.raises(RuntimeError):
            cb(spark.range(3), 0)
        assert [c["epoch_id"] for c in read_commits(d)] == [0]


def test_no_guarantees_respects_cadence(spark):
    # "What's wrong" r2 #6: the reference applies the SAME C3 cadence in
    # both sink modes -- only the ack/process ordering differs.  Below the
    # count threshold, no-guarantees must NOT write a commit every batch.
    t = CommitTracker(ShardCheckpointConfig(checkpoint_period_seconds=1e9,
                                            checkpoint_after_processing_nr_of_records=10))
    with tempfile.TemporaryDirectory() as d:
        cb = committing_foreach_batch(lambda df, e: None, t, d, mode="no-guarantees")
        cb(spark.range(3), 0)  # 3 < 10: below cadence
        assert read_commits(d) == []
        cb(spark.range(8), 1)  # cumulative 11 >= 10: fires
        assert [c["epoch_id"] for c in read_commits(d)] == [1]


def test_config_parsing_and_reader_options():
    conf = ConsumerConfig.from_dict(
        {
            "stream-name": "s",
            "application-name": "app",
            "initial-position": "at-timestamp",
            "at-timestamp": "2024-06-01T00:00:00",
            "max-records-per-fetch": 500,
            "shard-checkpoint-config": {
                "checkpoint-period": 2,
                "checkpoint-after-processing-nr-of-records": 200,
                "max-wait-for-completion-on-stream-shutdown": 1,
            },
        }
    )
    opts = conf.reader_options()
    assert opts["streamName"] == "s"
    assert opts["maxFetchRecordsPerShard"] == "500"
    assert opts["startingPosition"].startswith("2024-06-01")
    assert conf.checkpoint.checkpoint_after_processing_nr_of_records == 200


def test_config_rejects_bad_position():
    with pytest.raises(ValueError):
        ConsumerConfig(stream_name="s", application_name="a", initial_position="nonsense")
    with pytest.raises(ValueError):
        ConsumerConfig(stream_name="s", application_name="a", initial_position="at-timestamp")


def test_stats_reflection_loading_and_fallback():
    # ConsumerStats.scala:33-42: config-string reflection; any failure ->
    # noop, never a crash.
    inst = get_instance("kcl_akka_stream_spark.streaming.stats.RecordingStats")
    assert isinstance(inst, RecordingStats)
    assert isinstance(get_instance("no.such.module.Cls"), NoopConsumerStats)
    assert isinstance(get_instance("os.path.join"), NoopConsumerStats)  # not a ConsumerStats
    assert isinstance(get_instance(None), NoopConsumerStats)


def test_recording_stats():
    s = RecordingStats()
    s.track_batch("shard-1", 10)
    s.track_batch("shard-1", 5)
    s.checkpoint_acked("shard-1")
    assert s.records["shard-1"] == 15
    assert s.batches["shard-1"] == 2
    assert s.checkpoints["shard-1"] == 1


def test_stats_query_listener_bridges_progress(spark, tmp_path):
    import time
    import uuid

    from kcl_akka_stream_spark.streaming.stats import RecordingStats, StatsQueryListener

    stats = RecordingStats()
    listener = StatsQueryListener(stats)
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "listener_src")
        spark.range(100).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        name = f"t_listener_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.schema("id long, v long")
            .parquet(src)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline and not (stats.started and stats.batches and stats.ended):
            time.sleep(0.2)
        assert stats.started, "onQueryStarted not bridged"
        assert sum(stats.records.values()) == 100, dict(stats.records)
        assert stats.ended, "onQueryTerminated not bridged"
    finally:
        spark.streams.removeListener(listener)


def test_commit_error_taxonomy():
    from kcl_akka_stream_spark.streaming.commit import (
        CommitAbort,
        CommitShutdownRace,
        CommitThrottled,
        CommitTracker,
        classify_commit_error,
        commit_with_taxonomy,
    )

    # type-first, mirroring the reference's catch clauses
    # (RecordProcessorImpl.scala:229-241)
    assert classify_commit_error(CommitShutdownRace("lease gone")) == "ignore"
    assert classify_commit_error(InterruptedError()) == "ignore"
    assert classify_commit_error(CommitThrottled("slow down")) == "retry"
    assert classify_commit_error(TimeoutError("timed out")) == "retry"
    assert classify_commit_error(ConnectionResetError("peer reset")) == "retry"
    # known connector signatures (full java class names in py4j messages)
    assert (
        classify_commit_error(
            RuntimeError("software.amazon.kinesis.exceptions.ShutdownException: raced")
        )
        == "ignore"
    )
    assert classify_commit_error(RuntimeError("Rate exceeded for shard")) == "retry"
    assert (
        classify_commit_error(RuntimeError("ProvisionedThroughputExceededException: x"))
        == "retry"
    )
    # misclassification guard: generic words inside unrelated exceptions
    # must NOT downgrade an abort
    assert classify_commit_error(ValueError("user timeout parsing")) == "abort"
    assert classify_commit_error(RuntimeError("writer stopped unexpectedly")) == "abort"
    assert classify_commit_error(ValueError("schema mismatch")) == "abort"

    t = CommitTracker()

    def ok(entry):
        pass

    def throttled(entry):
        raise RuntimeError("ProvisionedThroughputExceededException: slow down")

    def broken(entry):
        raise ValueError("disk corrupt")

    assert commit_with_taxonomy(t, 1, 10, ok) == "committed"
    assert commit_with_taxonomy(t, 2, 10, throttled) == "retry"
    with pytest.raises(CommitAbort):
        commit_with_taxonomy(t, 3, 10, broken)


def test_commit_retry_keeps_pending_point():
    # ShardCheckpointTrackerTest.scala:98-118: a failing commit attempt
    # rethrows/retries, but the commit POINT is kept -- the next attempt
    # (with no new progress) re-commits the same point.
    from kcl_akka_stream_spark.streaming.commit import CommitTracker, commit_with_taxonomy

    t = CommitTracker(ShardCheckpointConfig(checkpoint_period_seconds=1e9,
                                            checkpoint_after_processing_nr_of_records=2))
    seen = []

    def throttled(entry):
        seen.append(entry["epoch_id"])
        raise RuntimeError("Rate exceeded")

    def ok(entry):
        seen.append(entry["epoch_id"])

    assert commit_with_taxonomy(t, 7, 2, throttled) == "retry"
    assert t.commits == []  # nothing recorded
    assert t.pending == {"epoch_id": 7, "n_records": 2}  # point kept
    # re-attempt with NO new progress: same point re-committed (T:113-117)
    assert commit_with_taxonomy(t, write=ok) == "committed"
    assert seen == [7, 7]
    assert [c["epoch_id"] for c in t.commits] == [7]
    assert t.pending is None
    # nothing pending -> "do nothing if no processed records" (T:45-55)
    assert commit_with_taxonomy(t, write=ok) == "nothing"


def test_commit_failure_clears_triggers_but_keeps_point():
    # ShardCheckpointTrackerTest.scala:83-96: the failing attempt still
    # clears the checkpoint triggers (the reference's `finally`), so
    # shouldCheckpoint flips back to false until new records accumulate.
    from kcl_akka_stream_spark.streaming.commit import CommitTracker, commit_with_taxonomy

    t = CommitTracker(ShardCheckpointConfig(checkpoint_period_seconds=1e9,
                                            checkpoint_after_processing_nr_of_records=2))
    assert t.observe(2, now=0.0)  # trigger armed

    def throttled(entry):
        raise RuntimeError("Rate exceeded")

    assert commit_with_taxonomy(t, 0, 2, throttled) == "retry"
    assert not t.observe(1, now=0.0)  # triggers cleared by the failed attempt
    assert t.pending is not None  # but the point survives


def test_one_source_scan_per_epoch(spark):
    # "What's wrong" r2 #4: committing_foreach_batch used to run count()
    # AND process() against the raw batch lineage -- two source scans per
    # epoch.  The batch is now persisted, so the map work runs once even
    # though two actions consume it.  Witness: an accumulator inside the
    # lineage.
    t = CommitTracker(ShardCheckpointConfig(checkpoint_period_seconds=1e9,
                                            checkpoint_after_processing_nr_of_records=1))
    acc = spark.sparkContext.accumulator(0)

    def bump(it):
        for i in it:
            acc.add(1)
            yield (i,)

    rdd = spark.sparkContext.parallelize(range(100), 4).mapPartitions(bump)
    # explicit schema: no driver-side sampling, so the accumulator counts
    # exactly the executor-side scans
    df = spark.createDataFrame(rdd, schema="id long")
    processed = []
    with tempfile.TemporaryDirectory() as d:
        cb = committing_foreach_batch(lambda b, e: processed.append(b.count()), t, d)
        cb(df, 0)
    assert processed == [100]
    assert acc.value == 100  # one scan, not 200
