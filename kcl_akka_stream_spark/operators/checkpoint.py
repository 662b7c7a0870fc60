"""The checkpoint tracker as relational queries (SURVEY §2.3, C1-C6).

``ShardCheckpointTracker`` (RecordProcessorImpl.scala:22-91) is the
reference's one real stateful operator: per shard it tracks in-flight records
and advances a checkpoint frontier over the *maximal contiguous processed
prefix* -- out-of-order completions behind a gap do NOT advance it
(RecordProcessorImpl.scala:73-78; gap behavior proven at
ShardCheckpointTrackerTest.scala:70-81: acks {0,1,3} of 4 => frontier 1).

Relationally: frontier(shard) = max seq s such that every seq' <= s is
processed == the last row of the prefix where the running count of
unprocessed rows is still zero.  One window over (shard, seq) -- a single
shuffle on the shard key; per-shard state is O(1) per row at scan time, so
this scales to any number of shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def checkpoint_frontier(
    df: DataFrame,
    shard_col: str = "shard_id",
    seq_col: str = "seq",
    processed_col: str = "processed",
) -> DataFrame:
    """C2/W2 -- per-shard frontier + the C6 observability gauges.

    Output per shard:
    - ``frontier_seq``: max seq with an all-processed prefix (NULL if the
      first record is unprocessed -- nothing checkpointable yet);
    - ``checkpointable_count``: the contiguous processed prefix -- records
      the next checkpoint WOULD cover; this is the reference's
      ``processedButNotCheckpointedCount``, the population popProcessedRecords
      feeds into the C3 count trigger (RecordProcessorImpl.scala:73-77);
    - ``processed_uncheckpointed_count``: processed records above the
      frontier, i.e. blocked behind a gap -- an engine-side gauge the
      reference folds into nrOfInFlightRecords rather than exposing;
    - ``in_flight_count``: unprocessed records still tracked.  NOTE the
      divergence: the reference's nrOfInFlightRecords
      (RecordProcessorImpl.scala:30-32) also counts the popped-but-
      uncommitted prefix, which in this no-checkpoint-applied batch snapshot
      would equal ALL rows; the unprocessed count is the informative gauge.
    """
    w = Window.partitionBy(shard_col).orderBy(seq_col).rowsBetween(Window.unboundedPreceding, 0)
    unproc_running = F.sum(F.when(F.col(processed_col), 0).otherwise(1)).over(w)
    with_prefix = df.withColumn("__unproc_before", unproc_running)
    # a row with a zero running-unprocessed count is necessarily processed
    # (its own flag is in the count), so unproc == 0 IS the contiguous prefix
    return with_prefix.groupBy(shard_col).agg(
        F.max(F.when(F.col("__unproc_before") == 0, F.col(seq_col))).alias("frontier_seq"),
        F.sum(F.when(F.col("__unproc_before") == 0, 1).otherwise(0)).alias(
            "checkpointable_count"
        ),
        F.sum(
            F.when(F.col(processed_col) & (F.col("__unproc_before") > 0), 1).otherwise(0)
        ).alias("processed_uncheckpointed_count"),
        F.sum(F.when(F.col(processed_col), 0).otherwise(1)).alias("in_flight_count"),
    )


def should_checkpoint(
    frontier: DataFrame,
    *,
    record_threshold: int = 10_000,
    elapsed_col: str | None = None,
    period_seconds: int = 60,
) -> DataFrame:
    """C3 -- trigger = processed-count >= N or elapsed >= period
    (RecordProcessorImpl.scala:43-48; defaults reference.conf:5-9).

    The count trigger fires on ``checkpointable_count`` -- the contiguous
    processed prefix, the same population the reference's
    ``processedButNotCheckpointedCount`` accumulates via popProcessedRecords
    (RecordProcessorImpl.scala:73-77).  A fully-processed gap-free backlog
    of N records fires; N processed records stuck BEHIND a gap do not
    (they cannot be checkpointed, so triggering on them would spin).  The
    time trigger needs an elapsed-seconds column when available (batch
    fixture) -- in streaming the micro-batch trigger supplies it
    (streaming/commit.py).
    """
    trig = F.col("checkpointable_count") >= record_threshold
    if elapsed_col is not None:
        trig = trig | (F.col(elapsed_col) >= period_seconds)
    return frontier.withColumn("should_checkpoint", trig)
