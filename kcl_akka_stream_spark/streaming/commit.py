"""Count-or-time commit trigger + at-least-once/no-guarantees sink modes.

Reference semantics (SURVEY §2.3 C3/C4): checkpoint when processed-count
>= N or elapsed >= period, whichever first (RecordProcessorImpl.scala:43-48;
defaults 60 s / 10 000 records, reference.conf:5-9).  Spark's micro-batch
epoch commit subsumes C4's retry-keep behavior (a failed batch re-runs);
this module adds the *cadence* parity on top of foreachBatch: the user
callback is invoked per micro-batch, and the tracker decides when a commit
point is recorded.

Sink ordering modes (README.md:22-95):
- at-least-once: process the batch, then record the commit (checkpoint
  after processing) -- a crash before commit replays the batch;
- no-guarantees: record first, then process (mark-before-process) -- a
  crash loses the in-flight batch.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

from kcl_akka_stream_spark.config import ShardCheckpointConfig


@dataclass
class CommitTracker:
    """C3 trigger state: records-since-commit + elapsed-since-commit."""

    config: ShardCheckpointConfig = field(default_factory=ShardCheckpointConfig)
    _records_since_commit: int = 0
    _last_commit_at: float = field(default_factory=time.monotonic)
    commits: list[dict] = field(default_factory=list)

    def observe(self, n_records: int, *, now: float | None = None) -> bool:
        """Register a processed batch; True if a commit point is due
        (count threshold or period elapsed -- RecordProcessorImpl.scala:43-48)."""
        self._records_since_commit += n_records
        now = time.monotonic() if now is None else now
        by_count = self._records_since_commit >= self.config.checkpoint_after_processing_nr_of_records
        by_time = (now - self._last_commit_at) >= self.config.checkpoint_period_seconds
        return by_count or by_time

    def commit(self, epoch_id: int, n_records: int, *, now: float | None = None) -> dict:
        entry = {"epoch_id": epoch_id, "n_records": n_records, "at": time.time()}
        self.commits.append(entry)
        self._records_since_commit = 0
        self._last_commit_at = time.monotonic() if now is None else now
        return entry


def committing_foreach_batch(
    process: Callable[[DataFrame, int], None],
    tracker: CommitTracker,
    commit_dir: str,
    *,
    mode: str = "at-least-once",
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch callback with commit-cadence tracking.

    ``commit_dir`` receives one JSON file per commit point -- the analogue
    of the reference's DynamoDB checkpoint row (the per-batch WAL/commit
    log is Spark's own, in checkpointLocation).
    """
    if mode not in ("at-least-once", "no-guarantees"):
        raise ValueError("mode must be 'at-least-once' or 'no-guarantees'")
    os.makedirs(commit_dir, exist_ok=True)

    def write_commit(entry: dict) -> None:
        path = os.path.join(commit_dir, f"commit-{entry['epoch_id']:010d}.json")
        with open(path, "w") as f:
            json.dump(entry, f)

    def run(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        if mode == "no-guarantees":
            # mark-before-process (README.md:61-95): ack first, then work.
            write_commit(tracker.commit(epoch_id, n))
            process(batch_df, epoch_id)
            return
        process(batch_df, epoch_id)
        if tracker.observe(n):
            write_commit(tracker.commit(epoch_id, n))

    return run


def read_commits(commit_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(commit_dir):
        return out
    for name in sorted(os.listdir(commit_dir)):
        if name.startswith("commit-") and name.endswith(".json"):
            with open(os.path.join(commit_dir, name)) as f:
                out.append(json.load(f))
    return out


class CommitAbort(RuntimeError):
    """Unrecoverable commit failure -- the stream must abort (the
    reference's kill-switch path)."""


def classify_commit_error(exc: BaseException) -> str:
    """The reference's checkpoint error taxonomy
    (RecordProcessorImpl.scala:229-241) mapped onto engine failures:

    - ``ignore``: shutdown races (the query is already stopping) --
      ShutdownException there, StreamingQueryException-on-stop here;
    - ``retry``: transient dependency pressure -- Throttling/
      KinesisClientLibDependencyException there; timeouts / connection
      resets / service-throttling here (stats hook: checkpoint_delayed);
    - ``abort``: anything else fails the stream (kill switch there, query
      exception here).
    """
    msg = f"{type(exc).__name__}: {exc}".lower()
    if any(s in msg for s in ("query terminated", "stopped", "shutdown", "interrupted")):
        return "ignore"
    if any(
        s in msg
        for s in (
            "throttl",
            "rate exceeded",
            "timeout",
            "timed out",
            "connection reset",
            "service unavailable",
            "provisionedthroughput",
        )
    ):
        return "retry"
    return "abort"


def commit_with_taxonomy(tracker: CommitTracker, epoch_id: int, n: int, write, stats=None):
    """Apply a commit attempt under the reference's error policy: ignore
    shutdown races, keep the commit point pending on retryable errors (the
    retry-keep behavior proven at ShardCheckpointTrackerTest.scala:98-118),
    abort otherwise."""
    try:
        write(tracker.commit(epoch_id, n))
        if stats is not None:
            stats.checkpoint_acked(str(epoch_id))
        return "committed"
    except Exception as exc:  # noqa: BLE001 -- taxonomy decides
        kind = classify_commit_error(exc)
        if kind == "ignore":
            return "ignored"
        if kind == "retry":
            if stats is not None:
                stats.checkpoint_delayed(str(epoch_id), exc)
            return "retry"
        raise CommitAbort(str(exc)) from exc
