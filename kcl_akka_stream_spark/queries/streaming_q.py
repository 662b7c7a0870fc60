"""Structured Streaming queries exposed through the batch correctness gate.

Each callable runs a REAL streaming query (readStream -> transform ->
memory sink, driven to completion with processAllAvailable) and returns the
sink table -- so the DuckDB oracle checks end-to-end streaming semantics,
not a batch re-expression (SURVEY §2.9).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcl_akka_stream_spark.queries.registry import query, tbl


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


#: VERDICT r10 #3: every mergeable-family twin folds per-batch state on
#: the driver via collect() -- sound ONLY because the collected relation
#: is a bounded AGGREGATE (bars x types, digests x replicas: group
#: cardinality, never data size).  Nothing used to enforce that contract;
#: re-key the same fold by user_id and it silently becomes a driver OOM
#: at 100x.  _collect_state is the loud guard (the similarity family's
#: max_queries / max_codebook_rows pattern): the fetch itself is LIMIT
#: (cap+1)-bounded, so an unbounded state raises instead of OOMing.
MAX_STATE_ROWS = 100_000


class StateCardinalityExceeded(RuntimeError):
    """A streaming twin's per-batch state relation exceeded max_state_rows."""


#: VERDICT r13 #3: the streaming twins' micro-batch plans were the one
#: headline slice with no EXPLAIN-grade audit -- EXPLAIN.md carried a
#: "(streaming -- plan decided per micro-batch)" marker instead of
#: exchange/pushdown counts.  When tools/explain_audit.py installs a
#: capture dict here, every micro-batch state relation's PHYSICAL plan
#: is recorded under its family tag before execution: the driver-fold
#: families capture at the _collect_state seam, the epoch-union family
#: at its per-batch parquet append, and the watermark/memory-sink
#: family via StreamingQuery.explainInternal after the final trigger.
PLAN_CAPTURE: dict[str, list[str]] | None = None


def _capture_plan(tag: str, df: DataFrame) -> None:
    if PLAN_CAPTURE is not None:
        from kcl_akka_stream_spark.plans.hygiene import physical_plan

        PLAN_CAPTURE.setdefault(tag, []).append(physical_plan(df))


#: Optimization r15 (guide §1.2 order-of-operations, §2.4/§2.5): every
#: mergeable-state twin staged its source fixture as
#: ``df.repartition(4).write`` -- a ROUND-ROBIN exchange (which pays the
#: SPARK-23207 sort-before-repartition on every row) into four files,
#: then FOUR micro-batches at maxFilesPerTrigger=1.  Measured on the
#: events projection at sf0.1: fixture write 0.56 s round-robin vs
#: 0.36 s for a 2-way hash split, and each extra trigger costs ~0.22 s
#: of micro-batch machinery against a no-op fold.  The merge contract
#: these twins prove (per-batch states fold to exactly the whole-stream
#: state: abelian sums, min/max/OR semilattices, bottom-k) is
#: batch-composition- and batch-count-independent BY CONSTRUCTION, and
#: every family's oracle recomputes from the whole relation -- so any
#: deterministic multi-file split yields identical results (every twin
#: re-gated at all 3 SFs after this change).  TWO epochs exercise the
#: same cross-batch merge (state from batch 0 merged with state from
#: batch 1; replay/idempotence semantics stay pinned by the pytest
#: fixtures) at half the trigger overhead.  The split key is a
#: deterministic full-row hash -- cheaper than the round-robin sort and
#: reproducible under task retry (guide §2.5: never derive a partitioning
#: key from rand()).
N_EPOCHS = 2


def _write_epoch_fixture(df: DataFrame, src: str, n: int = N_EPOCHS) -> None:
    df.repartition(n, F.xxhash64(*df.columns)).write.mode(
        "overwrite"
    ).parquet(src)


#: VERDICT r12 #2: the per-family state-cardinality AUDIT for all 23
#: mergeable-state streaming-twin families.  Each entry states HOW the
#: per-batch state is held and WHY its cardinality cannot grow with row
#: volume:
#:   mechanism 'driver-fold'   -- state folds through the guarded
#:                                _collect_state driver list; legitimate
#:                                ONLY for constant / group-bounded state.
#:                                ``folds`` lists the exact what-tags used
#:                                at the _collect_state call sites (pytest
#:                                pins set equality against the source).
#:   mechanism 'epoch-union'   -- per-batch state APPENDS executor-side to
#:                                a parquet store; merge is distributed;
#:                                result detaches via eager
#:                                localCheckpoint.  Required for any
#:                                data-dependent state.
#:   mechanism 'checkpoint-fold' -- state is a standing DataFrame merged
#:                                batch-over-batch and re-detached via
#:                                eager localCheckpoint (block-manager
#:                                partitions, never a driver row list).
#:   cardinality 'constant'      -- rows/batch bounded by a fixed sketch
#:                                size x group count (k, bands, bins, b).
#:   cardinality 'group-bounded' -- rows/batch bounded by group-domain
#:                                cells (types x hours/bins/bars); grows
#:                                with the DOMAIN (value range, stream
#:                                time-span), never with row volume.
#:   cardinality 'data-dependent' -- grows with data (id universe, user
#:                                count): MUST NOT be a driver-fold.
#: tests/test_streaming_state_audit.py pins (a) the folds tags complete
#: and exact against the actual _collect_state call sites, and (b) no
#: driver-fold family classified data-dependent.
STATE_CARDINALITY = {
    "stream_kmv_merge": (
        "driver-fold", "constant", "epochs x k=64 bottom hashes",
        ("stream_kmv_merge",),
    ),
    "stream_cms_merge": (
        "driver-fold", "constant", "types x fixed depth*width counters",
        ("stream_cms_merge",),
    ),
    "stream_hist_merge": (
        "driver-fold", "group-bounded", "types x value-range bins",
        ("stream_hist_merge",),
    ),
    "stream_kmv_set_ops": (
        "driver-fold", "constant", "set-tags x k=64 bottom hashes",
        ("stream_kmv_set_ops",),
    ),
    "stream_rollup_incremental": (
        "driver-fold", "constant", "types x 4 int64 sufficient stats",
        ("stream_rollup_incremental",),
    ),
    "stream_moments_merge": (
        "driver-fold", "constant", "types x 4 int64 power sums",
        ("stream_moments_merge",),
    ),
    "stream_scd2_merge": (
        "checkpoint-fold", "group-bounded",
        "the changes-sized SCD2 dimension itself, localCheckpoint-held",
        (),
    ),
    "stream_bitmap_merge": (
        "epoch-union", "data-dependent",
        "types x dense-id-range/63 words -- grows with the id universe",
        (),
    ),
    "stream_reservoir_merge": (
        "driver-fold", "constant", "types x k=8 bottom hashes",
        ("stream_reservoir_merge",),
    ),
    "stream_bootstrap_merge": (
        "driver-fold", "constant",
        "types x b=32 replicate sums + types x point sums",
        ("stream_bootstrap_merge:replicates", "stream_bootstrap_merge:point"),
    ),
    "stream_pearson_merge": (
        "driver-fold", "constant", "types x 6 int64 sufficient stats",
        ("stream_pearson_merge",),
    ),
    "stream_kl_drift_merge": (
        "epoch-union", "group-bounded",
        "types x 2 halves x unit bins -- grows with the value domain"
        " (migrated off the driver list, VERDICT r14 #5)",
        (),
    ),
    "stream_ks_merge": (
        "epoch-union", "group-bounded",
        "types x 2 halves x deci-bins -- grows with the value domain"
        " (migrated off the driver list, VERDICT r14 #5)",
        (),
    ),
    "stream_entropy_merge": (
        "driver-fold", "group-bounded", "types x 24 hour cells",
        ("stream_entropy_merge",),
    ),
    "stream_mi_merge": (
        "driver-fold", "group-bounded", "types x 24 hour cells",
        ("stream_mi_merge",),
    ),
    "stream_ohlc_merge": (
        "epoch-union", "group-bounded",
        "types x hourly bars -- grows with stream time-span, not volume"
        " (migrated off the driver list, VERDICT r14 #5)",
        (),
    ),
    "stream_topk_merge": (
        "driver-fold", "constant", "windows x k candidates",
        ("stream_topk_merge",),
    ),
    "stream_session_merge": (
        "epoch-union", "data-dependent",
        "users x batch-local sessions -- grows with user count",
        (),
    ),
    "stream_minhash_merge": (
        "driver-fold", "constant", "langs x 8 signature chunks",
        ("stream_minhash_merge",),
    ),
    "stream_bloom_merge": (
        "epoch-union", "constant",
        "types x <= 261 words (ceil(m/63), m fixed at 16384);"
        " epoch-union anyway -- no driver list (VERDICT r14 #5)",
        (),
    ),
    "stream_quantile_merge": (
        "driver-fold", "constant",
        "types x k=256 bottom-hash (id, cents) sample rows",
        ("stream_quantile_merge",),
    ),
    "stream_hll_merge": (
        "driver-fold", "constant",
        "types x m=64 HLL registers (max-semilattice)",
        ("stream_hll_merge",),
    ),
    "stream_f2_merge": (
        "driver-fold", "constant",
        "types x one row of b=64 AMS signed sums (additive)",
        ("stream_f2_merge",),
    ),
}


def _collect_state(
    df: DataFrame,
    what: str,
    domain_bound: int | None = None,
    max_state_rows: int = MAX_STATE_ROWS,
):
    """Guarded driver fetch of one micro-batch's state relation.

    ``domain_bound`` (VERDICT r13 #4) is the family's OWN per-batch
    domain cap -- the ``types x bins/bars/k`` formula stated at the call
    site.  MAX_STATE_ROWS alone let a group-bounded family whose DOMAIN
    grows (value-range bins, stream-time-span bars) drift silently
    toward the 100k cliff; the per-family bound raises with the family
    name the moment its domain outgrows the declared envelope.  Every
    registry twin passes one (AST-pinned by
    tests/test_streaming_state_audit.py); None is tolerated only for
    ad-hoc probes."""
    cap = (
        max_state_rows
        if domain_bound is None
        else min(domain_bound, max_state_rows)
    )
    _capture_plan(what, df)
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        which = (
            "max_state_rows"
            if domain_bound is None or domain_bound >= max_state_rows
            else "domain_bound"
        )
        raise StateCardinalityExceeded(
            f"{what}: per-batch state relation exceeded {which}={cap}; "
            "fold state must be group-bounded "
            "(bars x types, digests x replicas), never data-sized -- "
            "re-key the state or raise the cap explicitly at the call site"
        )
    return rows


@query(
    "stream_tumbling_agg",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 -- tumbling event-time window over the envelope stream (absent in
    # the reference; Spark-native watermark+window).  Complete output mode ->
    # every window is emitted once the file stream drains.  Streams the
    # fixture file directly (no temp copy).
    from kcl_akka_stream_spark.sources.batch import stream_events

    name = f"stream_agg_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), (F.sum(_cents(F.col("value"))).cast("double") / F.lit(100.0)).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        if PLAN_CAPTURE is not None:
            # the watermark/stateful plan of the last executed trigger
            # (extended=True includes the physical plan with the
            # StateStoreRestore/Save + Exchange chain)
            PLAN_CAPTURE.setdefault("stream_tumbling_agg", []).append(
                q._jsq.explainInternal(True)
            )
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_dedup",
    """
    SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 at-least-once replay -> exactly-once via watermarked
    # dropDuplicates: the source directory holds TWO copies of every event
    # (a simulated replay-from-checkpoint); the streaming dedup must emit
    # each exactly once.  NOTE: with the dedup key not containing the
    # event-time column, dropDuplicates state is NOT evicted by the
    # watermark -- fine for a bounded replay test, an unbounded-state
    # bug on an endless stream; stream_dedup_watermarked below is the
    # state-bounded production form.
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    ev = tbl(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="kcl_spark_dedup_")
    try:
        ev.write.mode("overwrite").parquet(tmp)
        ev.write.mode("append").parquet(tmp)  # the replayed duplicates
        stream = spark.readStream.schema(ev.schema).parquet(tmp)
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
        q = deduped.writeStream.outputMode("append").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return (
            spark.table(name)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "stream_dedup_watermarked",
    """
    SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
)
def stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The STATE-BOUNDED twin of stream_dedup.  dropDuplicates(keys) with
    # a watermark only evicts state when the event-time column is part
    # of the dedup keys -- with a plain id key the state store grows
    # forever, which at 100 TB/day of events is an OOM with a fuse, not
    # a dedup.  dropDuplicatesWithinWatermark (the API Spark added for
    # exactly this) dedups on the id while evicting any key older than
    # the watermark delay, so state is bounded by (event rate x delay)
    # regardless of run length.  Semantics differ only for duplicates
    # arriving later than the delay -- the replay fixture's duplicates
    # carry identical timestamps, so the exact-dedup oracle still holds.
    name = f"stream_dedup_wm_{uuid.uuid4().hex[:8]}"
    ev = tbl(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="kcl_spark_dedup_wm_")
    try:
        ev.write.mode("overwrite").parquet(tmp)
        ev.write.mode("append").parquet(tmp)  # the replayed duplicates
        stream = spark.readStream.schema(ev.schema).parquet(tmp)
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return (
            spark.table(name)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "stream_sliding_agg",
    """
    WITH w AS (
      SELECT event_type, value,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
      FROM events)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
    FROM w GROUP BY 1, 2
    """,
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 -- sliding event-time window (1 h window / 30 min slide): each
    # event lands in exactly two windows.  Oracle expands the two
    # epoch-aligned window starts per event.
    from kcl_akka_stream_spark.sources.batch import stream_events

    name = f"stream_slide_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_cents(F.col("value"))).cast("double") / F.lit(100.0)).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_session_window",
    """
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o)
    SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 -- session windows (30 min inactivity gap) per user over the
    # envelope stream.  Oracle is the classic gaps-and-islands rewrite.
    from kcl_akka_stream_spark.sources.batch import stream_events

    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n",
        )
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_checkpoint_frontier",
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
           CAST(sum(CASE WHEN processed AND unproc > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS processed_uncheckpointed_count,
           CAST(sum(CASE WHEN processed THEN 0 ELSE 1 END) AS BIGINT) AS in_flight_count
    FROM t GROUP BY shard_id
    """,
)
def stream_checkpoint_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.3 C1-C6 as a REAL stateful streaming operator: the reference's
    # ShardCheckpointTracker (RecordProcessorImpl.scala:22-91) re-expressed
    # with applyInPandasWithState.  State is COMPACTED per micro-batch
    # (popProcessedRecords, RecordProcessorImpl.scala:73-78): only the
    # un-acked window survives, so like the reference the tracker relies on
    # per-shard in-order delivery (Kinesis' per-shard ordering guarantee).
    # The fixture honors that contract: events are range-split by seq into
    # three files with increasing mtimes, so maxFilesPerTrigger=1 delivers
    # each shard's records across micro-batches in seq order.  The gate
    # compares the LAST emission per shard against the batch-SQL oracle.
    import glob
    import time as _time

    from kcl_akka_stream_spark.streaming.tracker import streaming_checkpoint_frontier

    name = f"stream_ckpt_{uuid.uuid4().hex[:8]}"
    ev = tbl(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="kcl_spark_ckpt_")
    try:
        ev.repartitionByRange(3, "event_id").write.mode("overwrite").parquet(tmp)
        # range partition i holds the i-th seq band; stamp increasing mtimes
        # so the file source (oldest-first) replays them in seq order.
        base = _time.time() - 600
        for i, part in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*")))):
            os.utime(part, (base + 60 * i, base + 60 * i))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(tmp)
        )
        tracked = streaming_checkpoint_frontier(
            stream.select(
                F.col("user_id").alias("shard_id"),
                F.col("event_id").alias("seq"),
                (F.col("event_type") != "error").alias("processed"),
            )
        )
        q = tracked.writeStream.outputMode("update").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        from pyspark.sql import Window

        w = Window.partitionBy("shard_id").orderBy(F.col("update_id").desc())
        return (
            spark.table(name)
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select(
                "shard_id", "frontier_seq", "processed_uncheckpointed_count", "in_flight_count"
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "stream_stream_join",
    """
    SELECT a.event_id AS err_id, count(*) AS n_clicks_before
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'error' AND b.event_type = 'click'
     AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE AND a.ts
    GROUP BY a.event_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 -- watermarked stream-stream interval join (absent in the
    # reference; Spark-native): for each error event, the clicks by the
    # same user in the preceding 10 minutes.  Both sides are real streams;
    # the watermark bounds join state, the time-range condition lets the
    # engine expire rows.  Inner joins emit eagerly, so draining the file
    # stream yields the full deterministic result.
    from kcl_akka_stream_spark.sources.batch import stream_events

    name = f"stream_ssj_{uuid.uuid4().hex[:8]}"
    errs = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("err_user"), F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts"))
        .withWatermark("err_ts", "1 hour")
    )
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("clk_user"), F.col("ts").alias("clk_ts"))
        .withWatermark("clk_ts", "1 hour")
    )
    joined = errs.join(
        clicks,
        (F.col("err_user") == F.col("clk_user"))
        & (F.col("clk_ts") >= F.col("err_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("clk_ts") <= F.col("err_ts")),
        "inner",
    )
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy(F.col("err_id"))
        .agg(F.count(F.lit(1)).alias("n_clicks_before"))
    )


@query(
    "stream_committed_sink",
    """
    SELECT event_id, user_id, event_type FROM events
    """,
)
def stream_committed_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.3 C3/C4 end-to-end under the gate: a real stream drains through
    # committing_foreach_batch (at-least-once: process THEN record the
    # commit; write-before-mutate C4 discipline) into a parquet sink, with
    # the commit log carrying one entry per micro-batch at cadence N=1.
    # The gate then verifies the sink holds exactly the source events --
    # the reference's "received == sent" acceptance
    # (IT/KinesisSourceTest.scala:52-68) with the commit machinery in the
    # loop.
    from kcl_akka_stream_spark.config import ShardCheckpointConfig
    from kcl_akka_stream_spark.sources.batch import stream_events
    from kcl_akka_stream_spark.streaming.commit import (
        CommitTracker,
        committing_foreach_batch,
        read_commits,
    )

    base = tempfile.mkdtemp(prefix="kcl_spark_commit_sink_")
    sink_dir = os.path.join(base, "sink")
    commit_dir = os.path.join(base, "commits")
    try:
        tracker = CommitTracker(
            ShardCheckpointConfig(
                checkpoint_period_seconds=1e9,
                checkpoint_after_processing_nr_of_records=1,
            )
        )

        def process(batch_df, epoch_id):
            batch_df.select("event_id", "user_id", "event_type").write.mode(
                "append"
            ).parquet(sink_dir)

        cb = committing_foreach_batch(process, tracker, commit_dir)
        q = (
            stream_events(spark, sf_dir)
            .writeStream.foreachBatch(cb)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        commits = read_commits(commit_dir)
        if not commits:
            raise AssertionError("commit log empty: cadence machinery did not run")
        # materialize before the temp dir is removed
        rows = spark.read.parquet(sink_dir).collect()
        return spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "stream_quality_filter",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents)
    SELECT doc_id, CAST(len(t) AS INT) AS n_words,
           round(CAST(list_sum([len(x) FOR x IN t]) AS DOUBLE)
                 / greatest(len(t), 1), 4) AS mean_word_len
    FROM toks WHERE len(t) >= 30
    """,
)
def stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming quality gate: the map-only structural metrics
    # (operators/quality.py) run UNCHANGED on a document stream -- no
    # aggregation, no state, append mode, zero shuffle: every micro-batch
    # filters independently, the shape that keeps a 100 TB backfill and
    # its live tail on one code path.
    from kcl_akka_stream_spark.operators.quality import structural_metrics

    name = f"stream_quality_{uuid.uuid4().hex[:8]}"
    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(
        os.path.join(sf_dir, "documents.[p]arquet")
    )
    flagged = structural_metrics(stream).filter(F.col("n_words") >= 30).select(
        "doc_id", "n_words", "mean_word_len"
    )
    q = (
        flagged.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_kmv_merge",
    # Oracle = the direct GLOBAL KMV sketch over the raw table (same
    # arithmetic as agg_kmv_merged) -- sketch mergeability makes the
    # streamed per-batch states collapse to EXACTLY this value.
    """
    WITH h0 AS (
      SELECT DISTINCT substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS h8 FROM events),
    h AS (
      SELECT list_sum([(strpos('0123456789abcdef', substr(h8, i, 1)) - 1)
                       * power(16, 8 - i)
                       FOR i IN generate_series(1, 8)]) / 4294967296.0 AS hv
      FROM h0),
    r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM h),
    agg AS (SELECT count(*) AS n_exact_kept, max(hv) AS kth FROM r WHERE rn <= 64)
    SELECT CAST(n_exact_kept AS BIGINT) AS n_exact_kept,
           round(kth, 10) AS kth_min,
           round(CASE WHEN n_exact_kept >= 64 THEN 63.0 / kth
                      ELSE CAST(n_exact_kept AS DOUBLE) END, 4) AS est_distinct
    FROM agg
    """,
)
def stream_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming sketch rollup: the event stream is split into epoch
    # micro-batches (maxFilesPerTrigger=1 over an N_EPOCHS-file copy,
    # _write_epoch_fixture); each batch folds
    # into its own KMV state inside foreachBatch; the tiny per-batch
    # states (<= batches x k hashes) are then merged into ONE global
    # estimate.  The KMV closure property guarantees the merge equals the
    # direct batch sketch bit-for-bit -- which is exactly what the oracle
    # checks.  This is the 100 TB shape for streaming distinct counts:
    # state per batch is k numbers, never the data.
    from kcl_akka_stream_spark.operators.sketches import (
        kmv_merge_estimate,
        kmv_sketch,
    )

    ev = tbl(spark, sf_dir, "events").select("user_id")
    src = tempfile.mkdtemp(prefix="kcl_kmv_src_")
    state_rows = []
    state_schema = None
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            st = kmv_sketch(
                batch_df.withColumn("g", F.lit(int(epoch_id))), "g", "user_id", k=64
            )
            state_rows.extend(_collect_state(st, "stream_kmv_merge", domain_bound=4))

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        states = spark.createDataFrame(
            state_rows, "g long, kmins array<double>"
        )
        return kmv_merge_estimate(states, k=64)
    finally:
        shutil.rmtree(src, ignore_errors=True)


@query(
    "stream_cms_merge",
    # Oracle = the direct global CMS built from the raw table; counter
    # addition makes the streamed per-batch states sum to exactly this.
    """
    WITH d AS (SELECT unnest([0,1,2,3]) AS row),
    state AS (
      SELECT row, bucket, count(*) AS cnt
      FROM (SELECT row,
                   CAST(list_sum([(strpos('0123456789abcdef',
                        substr(md5(CAST(row AS VARCHAR) || ':' ||
                               CAST(user_id AS VARCHAR)), i, 1)) - 1)
                        * power(16, 8 - i)
                        FOR i IN generate_series(1, 8)]) AS BIGINT) % 64 AS bucket
            FROM events, d)
      GROUP BY row, bucket)
    SELECT row, bucket, CAST(cnt AS BIGINT) AS cnt FROM state
    """,
)
def stream_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming frequency-sketch rollup, twin of stream_kmv_merge: each
    # of N_EPOCHS micro-batches folds into its own Count-Min counter state
    # inside foreachBatch; the states are summed into the global sketch,
    # which counter additivity guarantees equals the direct batch build
    # -- the oracle checks every counter.  Streaming state per batch is
    # <= depth x width counters, never the data.
    from kcl_akka_stream_spark.operators.sketches import cms_merge, cms_state

    ev = tbl(spark, sf_dir, "events").select("user_id")
    src = tempfile.mkdtemp(prefix="kcl_cms_src_")
    state_rows = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            st = cms_state(
                batch_df.withColumn("g", F.lit(int(epoch_id))),
                "user_id",
                depth=4,
                width=64,
                group_col="g",
            )
            state_rows.extend(_collect_state(st, "stream_cms_merge", domain_bound=256))

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        states = spark.createDataFrame(
            state_rows, "g long, row int, bucket long, cnt long"
        )
        return cms_merge(states).select(
            "row", "bucket", F.col("cnt").cast("long").alias("cnt")
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


@query(
    "stream_static_enrich",
    """
    SELECT c.c_mktsegment, count(*) AS n,
           CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream-static dimension enrichment: the event STREAM joins a static
    # customer dimension (broadcast each micro-batch -- the standard
    # streaming enrich; the dim is re-resolvable per batch so slowly-
    # changing dims pick up updates), then a complete-mode aggregate per
    # market segment.
    from kcl_akka_stream_spark.sources.batch import stream_events

    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    dim = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey)
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(_cents(F.col("value"))).cast("double") / F.lit(100.0)).alias(
            "sum_value"
        ),
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_hist_merge",
    """
    WITH b AS (
      SELECT event_type,
             least(CAST(floor(value / 10.0) AS BIGINT), 49) AS bin,
             count(*) AS cnt
      FROM events GROUP BY event_type, bin),
    c AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM b),
    m AS (
      SELECT event_type, bin, cnt, cum, n,
             row_number() OVER (PARTITION BY event_type ORDER BY bin) AS rk
      FROM c WHERE cum >= n * 0.5)
    SELECT event_type, CAST(n AS BIGINT) AS n_rows,
           round(bin * 10.0 + (n * 0.5 - (cum - cnt)) / cnt * 10.0, 6)
             AS est_median
    FROM m WHERE rk = 1
    """,
)
def stream_hist_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming quantile rollup -- the third mergeable-state family after
    # KMV (distinct) and CMS (frequency): per-micro-batch equi-width
    # histogram states fold in foreachBatch (state per batch = at most
    # types x 50 bin counts, never the data), then merge by SUMMING bin
    # counts -- additive, so the merged histogram equals the direct batch
    # histogram exactly and the oracle is the same one agg_hist_median
    # checks against.  This is the 100 TB shape for streaming medians /
    # percentiles: no sort, no raw-value retention, bounded state.
    from pyspark.sql import Window

    width, n_bins = 10.0, 50
    ev = tbl(spark, sf_dir, "events").select("event_type", "value")
    src = tempfile.mkdtemp(prefix="kcl_hist_src_")
    state_rows = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            st = batch_df.groupBy(
                "event_type",
                F.least(
                    F.floor(F.col("value") / width).cast("long"),
                    F.lit(n_bins - 1),
                ).alias("bin"),
            ).agg(F.count(F.lit(1)).alias("cnt"))
            state_rows.extend(_collect_state(st, "stream_hist_merge", domain_bound=2048))

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        states = spark.createDataFrame(
            state_rows, "event_type string, bin long, cnt long"
        )
        merged = states.groupBy("event_type", "bin").agg(
            F.sum("cnt").alias("cnt")
        )
        wc = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
            Window.unboundedPreceding, 0
        )
        wt = Window.partitionBy("event_type")
        c = merged.select(
            "event_type",
            "bin",
            "cnt",
            F.sum("cnt").over(wc).alias("cum"),
            F.sum("cnt").over(wt).alias("n"),
        ).filter(F.col("cum") >= F.col("n") * 0.5)
        rk = Window.partitionBy("event_type").orderBy("bin")
        return (
            c.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") == 1)
            .select(
                "event_type",
                F.col("n").cast("long").alias("n_rows"),
                F.round(
                    F.col("bin") * width
                    + (F.col("n") * 0.5 - (F.col("cum") - F.col("cnt")))
                    / F.col("cnt")
                    * width,
                    6,
                ).alias("est_median"),
            )
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


@query(
    "stream_left_outer_join",
    # Unmatched errors null-flush only once the join watermark passes
    # their last possible match time: err_ts < min(side maxima) - delay.
    # The oracle encodes exactly that policy, so a flush regression
    # (rows held forever, or flushed early) turns the gate red.
    """
    WITH errs AS (SELECT event_id AS err_id, user_id, ts AS err_ts
                  FROM events WHERE event_type = 'error'),
    clicks AS (SELECT user_id AS cu, ts AS clk_ts
               FROM events WHERE event_type = 'click'),
    wm AS (SELECT least((SELECT max(ts) FROM events WHERE event_type = 'error'),
                        (SELECT max(ts) FROM events WHERE event_type = 'click'))
                  - INTERVAL 61 MINUTE AS w),
    j AS (SELECT e.err_id, e.err_ts, c.clk_ts FROM errs e LEFT JOIN clicks c
          ON e.user_id = c.cu
         AND c.clk_ts BETWEEN e.err_ts - INTERVAL 10 MINUTE AND e.err_ts)
    SELECT err_id, CAST(count(clk_ts) AS BIGINT) AS n_clicks_before
    FROM j, wm GROUP BY err_id, wm.w
    HAVING count(clk_ts) > 0 OR min(err_ts) < wm.w
    """,
)
def stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 -- watermarked LEFT OUTER stream-stream join: errors with no
    # click in the preceding 10 minutes must still emit (null-padded) --
    # but only after the watermark proves no match can still arrive.
    # Matched rows emit eagerly like the inner join; unmatched rows are
    # held in state until the join watermark (min over both sides of
    # max event time - 61 min) passes their last possible match time,
    # then flush in Spark's no-data micro-batch.  Errors NEWER than the
    # final watermark stay in state forever on a drained stream -- the
    # oracle models precisely this boundary, which is the part of outer
    # stream-joins that surprises every production user.
    from kcl_akka_stream_spark.sources.batch import stream_events

    name = f"stream_loj_{uuid.uuid4().hex[:8]}"
    errs = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("err_user"),
            F.col("event_id").alias("err_id"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", "61 minutes")
    )
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("clk_user"), F.col("ts").alias("clk_ts"))
        .withWatermark("clk_ts", "61 minutes")
    )
    joined = errs.join(
        clicks,
        (F.col("err_user") == F.col("clk_user"))
        & (F.col("clk_ts") >= F.col("err_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("clk_ts") <= F.col("err_ts")),
        "left_outer",
    )
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("err_id")
        .agg(F.count("clk_ts").alias("n_clicks_before"))
    )


@query(
    "stream_cdc_upsert",
    """
    WITH r AS (
      SELECT user_id, event_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM r WHERE rn = 1
    """,
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The CDC-apply / keyed-upsert pattern: a changelog stream folds into
    # a keyed state table via foreachBatch -- per batch, take the batch's
    # latest row per key (max of the UNIQUE (ts, event_id) struct --
    # duplicate-ts max_by would be fold-order-nondeterministic), merge
    # with the prior state, and write a NEW state version (write-
    # before-swap, the C4 commit discipline; Delta's MERGE INTO is the
    # managed form of this loop).  Two micro-batches with interleaved
    # keys force genuine cross-batch upserts; the merge is an argmax, so
    # the final state is batch-split-independent -- which is what the
    # whole-table oracle verifies.  State is one row per key, never the
    # changelog.
    ev = tbl(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    src = tempfile.mkdtemp(prefix="kcl_cdc_src_")
    state_root = tempfile.mkdtemp(prefix="kcl_cdc_state_")
    last_state: list[str] = []
    try:
        ev.repartition(2).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def upsert(batch_df, epoch_id):
            latest = batch_df.groupBy("user_id").agg(
                F.max(F.struct("ts", "event_id", "event_type")).alias("s")
            )
            cur = latest.select("user_id", "s.ts", "s.event_id", "s.event_type")
            if last_state:
                prev = batch_df.sparkSession.read.parquet(last_state[-1])
                cur = (
                    cur.unionByName(prev)
                    .groupBy("user_id")
                    .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("s"))
                    .select("user_id", "s.ts", "s.event_id", "s.event_type")
                )
            out = os.path.join(state_root, f"v{int(epoch_id)}")
            cur.write.mode("overwrite").parquet(out)
            last_state.append(out)

        q = stream.writeStream.foreachBatch(upsert).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        state = spark.read.parquet(last_state[-1])
        rows = state.select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        ).collect()
        return spark.createDataFrame(
            rows,
            "user_id long, last_event_id long, last_event_type string, last_ts string",
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(state_root, ignore_errors=True)


@query(
    "stream_python_datasource",
    """
    WITH shards AS (SELECT s FROM generate_series(0, 7) t(s))
    SELECT 'shardId-' || lpad(CAST(s AS VARCHAR), 12, '0') AS shard_id,
           CAST(250 AS BIGINT) AS n,
           CAST(1 AS BIGINT) AS min_seq,
           CAST(250 AS BIGINT) AS max_seq,
           CAST(250 * 251 / 2 AS BIGINT) AS sum_seq
    FROM shards
    """,
)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S1/S5 streaming protocol end-to-end: readStream over the pure-Python
    # DataSource (sources/python_source.py) -- initialOffset/latestOffset/
    # partitions/read/commit with JSON-checkpointable offsets, paced at 100
    # seqs per trigger so the 250-seq fixture drains over THREE micro-batches
    # (the multi-batch path is what distinguishes this from a batch read).
    # Complete-mode per-shard totals prove no seq was dropped or doubled at
    # the batch boundaries.
    from kcl_akka_stream_spark.sources.python_source import register

    register(spark)
    name = f"stream_pyds_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("envelope_sim")
        .option("seqs_per_batch", "100")
        .load()
    )
    agg = stream.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("sequence_number").alias("min_seq"),
        F.max("sequence_number").alias("max_seq"),
        # streaming forbids distinct aggs; the sum of 1..N is the stronger
        # invariant anyway -- any dropped or doubled seq at a batch
        # boundary shifts it
        F.sum("sequence_number").alias("sum_seq"),
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_session_dynamic_gap",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN INTERVAL '15 minutes'
                  ELSE INTERVAL '45 minutes' END AS gap
      FROM events),
    o AS (
      SELECT user_id, ts, event_id, gap,
             max(ts + gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS running_end
      FROM g),
    s AS (
      SELECT user_id, ts,
             sum(CASE WHEN running_end IS NULL OR ts >= running_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM o)
    SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 -- session windows with a PER-EVENT inactivity gap (clicks close
    # after 15 min, everything else 45): `session_window(ts, gap_expr)`,
    # the form fixed-gap sessionization cannot express (high-frequency
    # event types get tight sessions, sparse types stay glued).  Oracle is
    # the gaps-and-islands rewrite generalized to a RUNNING MAX of
    # (ts + that row's gap) with Spark's exclusive-end merge rule
    # (a new session starts when ts >= the running end).
    from kcl_akka_stream_spark.sources.batch import stream_events

    name = f"stream_dynsess_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    gap = (
        F.when(F.col("event_type") == "click", F.lit("15 minutes"))
        .otherwise(F.lit("45 minutes"))
    )
    agg = (
        stream.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n",
        )
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_chained_window_agg",
    """
    WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
    h AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hs, event_type,
             count(*) AS n_h
      FROM events GROUP BY 1, 2),
    d AS (
      SELECT time_bucket(INTERVAL '1 day', hs) AS ds, event_type,
             sum(n_h) AS n, count(*) AS n_hours
      FROM h GROUP BY 1, 2)
    SELECT strftime(ds, '%Y-%m-%d') AS day, event_type, CAST(n AS BIGINT) AS n,
           CAST(n_hours AS BIGINT) AS n_hours
    FROM d, wm WHERE ds + INTERVAL '1 day' <= wm.w
    """,
)
def stream_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 -- CHAINED stateful operators in ONE streaming query
    # (SPARK-40925): hourly tumbling agg feeding a daily rollup keyed on
    # the first agg's window column, both stateful, append mode (complete
    # mode is rejected by the global-watermark correctness check).  This
    # is the streaming form of a rollup hierarchy -- without chaining it
    # takes two queries and an intermediate sink.  Append emits each
    # daily window exactly once when the watermark passes its end, so the
    # UNCLOSED tail (any day within 1 h of max event time) is absent by
    # design -- the oracle mirrors that closure rule, making the
    # watermark-eviction boundary itself part of the checked contract.
    from kcl_akka_stream_spark.sources.batch import stream_events

    name = f"stream_chain_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    hourly = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w1"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_h"))
    )
    daily = (
        hourly.groupBy(F.window(F.col("w1"), "1 day").alias("w2"), "event_type")
        .agg(F.sum("n_h").alias("n"), F.count(F.lit(1)).alias("n_hours"))
    )
    out = daily.select(
        F.date_format("w2.start", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        "n_hours",
    )
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_pyds_pipeline_manifest",
    """
    WITH shards AS (SELECT s FROM generate_series(0, 7) t(s)),
    seqs AS (SELECT i FROM generate_series(1, 250) t(i)),
    rows_ AS (
      SELECT 'shardId-' || lpad(CAST(s AS VARCHAR), 12, '0') AS shard_id,
             CAST(i AS BIGINT) AS seq, md5('pk-' || s || '-' || i) AS pk
      FROM shards, seqs)
    SELECT shard_id, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(seq) AS BIGINT) AS sum_seq
    FROM rows_ WHERE substring(pk, 1, 1) < '8'
    GROUP BY shard_id
    """,
)
def stream_pyds_pipeline_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The connector matrix as ONE pipeline: Python streaming SOURCE (paced
    # micro-batches) -> filter (deterministic md5-prefix gate, the
    # sample_stratified idiom) -> Python streaming SINK (per-batch atomic
    # manifests) -> manifest-trusting re-read -> per-shard fingerprints
    # checked against the generator's closed form.  Any row lost, doubled,
    # or corrupted ANYWHERE in the read-transform-commit-reread chain
    # moves a count or a seq-sum.
    import shutil
    import tempfile

    from kcl_akka_stream_spark.sources.python_source import (
        register,
        stream_manifest_files,
    )

    register(spark)
    out = tempfile.mkdtemp(prefix="kcl_pyds_pipe_")
    ckpt = tempfile.mkdtemp(prefix="kcl_pyds_pipe_ckpt_")
    try:
        stream = (
            spark.readStream.format("envelope_sim")
            .option("seqs_per_batch", "100")
            .load()
        )
        kept = stream.filter(F.substring("partition_key", 1, 1) < "8").select(
            "shard_id", "sequence_number", "partition_key"
        )
        q = (
            kept.writeStream.format("manifest_jsonl")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        back = spark.read.schema(
            "shard_id string, sequence_number long, partition_key string"
        ).json(stream_manifest_files(spark, out))
        agg = back.groupBy("shard_id").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("sequence_number").cast("long").alias("sum_seq"),
        )
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _stream_bloom_oracle() -> str:
    from kcl_akka_stream_spark.queries.pipeline import _bloom_dedup_oracle

    return _bloom_dedup_oracle()


@query("stream_bloom_dedup", _stream_bloom_oracle())
def stream_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of pipeline_bloom_dedup, SAME oracle: a live ingest
    # deduplicated against a static historical corpus.  The streaming
    # shape replaces the batch operator's explode+groupBy (stateful on a
    # stream) with k chained STREAM-STATIC BROADCAST left joins against
    # the bounded bit-position relation -- map-side, zero state, append
    # mode, so every micro-batch resolves its rows independently and the
    # history (compressed to <= m bit rows however large it is) ships
    # once per executor exactly like the batch path.  Bloom-negative rows
    # skip nothing here (the verify join is also a broadcast at gate
    # scale) but carry the candidate flag the batch operator would have
    # used to prune the exact join.
    from kcl_akka_stream_spark.queries.pipeline import _BLOOM_K, _BLOOM_M

    def _pos(col, i: int):
        return (
            F.conv(
                F.substring(F.md5(F.concat(col, F.lit(f"|{i}"))), 1, 8), 16, 10
            ).cast("long")
            % _BLOOM_M
        )

    path = os.path.join(sf_dir, "documents.parquet")
    static_docs = spark.read.parquet(path)
    existing = (
        static_docs.filter(F.col("doc_id") % 3 != 0)
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    bits = (
        existing.select(
            F.explode(
                F.array(*[_pos(F.col("digest"), i) for i in range(_BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    known = existing.select(
        F.col("digest").alias("__kd"), F.lit(1).alias("__is_known")
    )

    name = f"stream_bloom_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(static_docs.schema)
        .parquet(os.path.join(sf_dir, "documents.[p]arquet"))
        .filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "lang", F.md5("text").alias("digest"))
    )
    joined = stream.select(
        "*", *[_pos(F.col("digest"), i).alias(f"__p{i}") for i in range(_BLOOM_K)]
    )
    for i in range(_BLOOM_K):
        joined = joined.join(
            F.broadcast(
                bits.select(
                    F.col("bit").alias(f"__b{i}"), F.col("hit").alias(f"__h{i}")
                )
            ),
            F.col(f"__p{i}") == F.col(f"__b{i}"),
            "left",
        )
    cand = F.when(
        sum(F.col(f"__h{i}").isNotNull().cast("int") for i in range(_BLOOM_K))
        == _BLOOM_K,
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = joined.withColumn("bloom_candidate", cand).join(
        F.broadcast(known), F.col("digest") == F.col("__kd"), "left"
    )
    out = flagged.select(
        "doc_id",
        "lang",
        "bloom_candidate",
        F.when(
            (F.col("bloom_candidate") == 1) & F.col("__is_known").isNotNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_known"),
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _stream_kmv_set_ops_oracle() -> str:
    from kcl_akka_stream_spark.queries.pipeline import _kmv_set_ops_oracle

    return _kmv_set_ops_oracle()


@query("stream_kmv_set_ops", _stream_kmv_set_ops_oracle())
def stream_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of agg_kmv_set_ops, SAME oracle: each micro-batch
    # folds its purchase-user and click-user slices into separate KMV
    # states (<= k hashes per set per batch); the accumulated states
    # merge into each set's global k-mins, and the set-operation
    # estimator runs on the MERGED states (prehashed path).  The KMV
    # closure makes merged == direct, so streamed union/Jaccard/
    # intersection estimates equal the batch query bit-for-bit -- the
    # fourth mergeable-state streaming family (KMV distinct, CMS,
    # histogram, and now KMV set algebra).
    from kcl_akka_stream_spark.operators.sketches import (
        kmv_set_estimates,
        kmv_sketch,
    )

    ev = tbl(spark, sf_dir, "events").select("event_type", "user_id", "value")
    src = tempfile.mkdtemp(prefix="kcl_kmvset_src_")
    states = {"a": [], "b": []}
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            for tag, etype in (("a", "purchase"), ("b", "click")):
                st = kmv_sketch(
                    batch_df.filter(
                        (F.col("event_type") == etype) & (F.col("value") >= 50)
                    ).withColumn("g", F.lit(int(epoch_id))),
                    "g",
                    "user_id",
                    k=64,
                )
                states[tag].extend(_collect_state(st, "stream_kmv_set_ops", domain_bound=4))

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        def merged(tag: str) -> DataFrame:
            st = spark.createDataFrame(
                states[tag], "g long, kmins array<double>"
            )
            ex = st.select(F.explode("kmins").alias("h")).distinct()
            # global k-min via TakeOrderedAndProject (per-partition top-k
            # + k-sized merge) -- same scale-safe shape as the batch
            # estimator; input here is bounded (batches x k) anyway.
            return ex.orderBy("h").limit(64).select("h")

        return kmv_set_estimates(
            merged("a"), merged("b"), "h", k=64, prehashed=True
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _rollup_incremental_oracle() -> str:
    from kcl_akka_stream_spark.queries.pipeline import ORACLES as _O

    return _O["pipeline_rollup_incremental"]


@query("stream_rollup_incremental", _rollup_incremental_oracle())
def stream_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of pipeline_rollup_incremental, SAME oracle: each
    # micro-batch folds to per-group partial states (count/sum/min/max --
    # commutative monoids), the accumulated states merge states-sized,
    # and derived columns (avg) compute after the merge.  The fifth
    # mergeable-state streaming family (KMV, CMS, histogram, KMV set
    # ops, and now plain rollup states): merged == direct is checked by
    # the oracle recomputing from all raw rows in one pass.
    ev = tbl(spark, sf_dir, "events").select("event_type", "value")
    src = tempfile.mkdtemp(prefix="kcl_rollup_src_")
    states: list = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            part = (
                batch_df.select(
                    "event_type",
                    F.floor(F.col("value") * 100 + F.lit(0.5))
                    .cast("long")
                    .alias("v"),
                )
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("v").cast("long").alias("sum_cents"),
                    F.min("v").cast("long").alias("min_cents"),
                    F.max("v").cast("long").alias("max_cents"),
                )
            )
            states.extend(_collect_state(part, "stream_rollup_incremental", domain_bound=32))

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.createDataFrame(
            states,
            "event_type string, n long, sum_cents long, "
            "min_cents long, max_cents long",
        )
        merged = st.groupBy("event_type").agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
            F.min("min_cents").cast("long").alias("min_cents"),
            F.max("max_cents").cast("long").alias("max_cents"),
        )
        return merged.select(
            "event_type",
            "n",
            "sum_cents",
            "min_cents",
            "max_cents",
            F.expr("(sum_cents * 10000) div n").cast("long").alias("avg_micro"),
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _power_sums_oracle() -> str:
    from kcl_akka_stream_spark.queries.core import _POWER_SUMS_ORACLE

    return _POWER_SUMS_ORACLE


@query("stream_moments_merge", _power_sums_oracle())
def stream_moments_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of agg_power_sums, SAME oracle: each micro-batch
    # folds to per-group exact integer power sums (operators/
    # aggregations.py::power_sums), the accumulated states merge by
    # plain addition (merge_power_sums), and the derived mean computes
    # after the merge.  The sixth mergeable-state streaming family --
    # int64 adds are order-independent, so 4-batch-fold == direct build
    # bit-for-bit, which the shared oracle (one pass over all raw rows)
    # checks.
    from kcl_akka_stream_spark.operators.aggregations import (
        merge_power_sums,
        power_sums,
    )

    ev = tbl(spark, sf_dir, "events").select("event_type", "value")
    src = tempfile.mkdtemp(prefix="kcl_moments_src_")
    states: list = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            states.extend(
                _collect_state(
                    power_sums(batch_df, "event_type", "value"),
                    "stream_moments_merge", domain_bound=32,
                )
            )

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.createDataFrame(
            states, "event_type string, n long, s1 long, s2 long, s3 long"
        )
        merged = merge_power_sums(st, "event_type")
        return merged.select(
            "event_type", "n", "s1", "s2", "s3",
            F.expr("(s1 * 100000) div n").cast("long").alias("mean_micro"),
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _scd2_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["pipeline_scd2_history"]


@query("stream_scd2_merge", _scd2_oracle())
def stream_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming SCD2 maintenance, SAME oracle as the batch build: the
    # change feed arrives as 4 TIME-RANGED micro-batches (range files
    # given strictly increasing mtimes, so FileStreamSource's
    # (mtime, path) ordering is deterministic -- the in-order CDC
    # contract scd2_merge requires); each batch folds into the standing
    # SCD2 table via operators/cdc.py::scd2_merge inside foreachBatch.
    # State is the changes-sized dimension itself, never the raw feed;
    # merged-across-batches == full recompute is checked by the shared
    # oracle, boundary absorption included -- the seventh
    # mergeable-state streaming family, and the one whose merge is NOT
    # commutative (order matters, unlike sketches/rollups).
    import os as _os

    from kcl_akka_stream_spark.operators.cdc import scd2_compact, scd2_merge

    ev = tbl(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    src = tempfile.mkdtemp(prefix="kcl_scd2_src_")
    state = {"scd2": None}
    try:
        ev.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)
        parts = sorted(
            f for f in _os.listdir(src) if f.startswith("part-")
        )
        for i, f in enumerate(parts):
            _os.utime(_os.path.join(src, f), (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )

        def fold(batch_df, epoch_id):
            batch = batch_df.localCheckpoint(eager=True)
            if batch.isEmpty():
                return
            if state["scd2"] is None:
                state["scd2"] = scd2_compact(batch).localCheckpoint(eager=True)
            else:
                state["scd2"] = scd2_merge(state["scd2"], batch).localCheckpoint(
                    eager=True
                )

        q = stream.writeStream.foreachBatch(fold).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        return state["scd2"].select(
            "user_id",
            "state",
            "version",
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "valid_from"
            ),
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "valid_to"
            ),
            "is_current",
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


@query(
    "stream_topk_per_window",
    """
    WITH c AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT window_start, event_type, n,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY n DESC, event_type) AS rnk
      FROM c)
    SELECT window_start, event_type, CAST(n AS BIGINT) AS n,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    """,
)
def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-window heavy hitters on a stream: the tumbling event-time count
    # (watermarkable, combinable -- the streaming engine's work) lands in
    # the memory sink, and the top-3-per-window rank runs as batch
    # post-processing on the WINDOW-COUNT-sized sink relation (bounded by
    # windows x event types, never rows).  The split is deliberate:
    # ranking inside the stream would force a non-combinable global state
    # per window, while rank-after-drain costs one tiny window sort --
    # the dashboard "top talkers per hour" shape at any volume.
    from pyspark.sql import Window

    from kcl_akka_stream_spark.sources.batch import stream_events

    name = f"stream_topk_{uuid.uuid4().hex[:8]}"
    stream = stream_events(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
        )
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink = spark.table(name)
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        sink.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "stream_bitmap_merge",
    # Same ground-truth oracle as agg_bitmap_distinct: the OR-merge of
    # per-batch bitmap states must equal the direct exact distinct.
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id // 63) AS BIGINT) AS n_words,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def stream_bitmap_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming EXACT distinct rollup -- the eighth mergeable-state
    # streaming family, and the first exact AND idempotent one: the
    # event stream splits into N_EPOCHS micro-batches, each folds to its own
    # (type, word, bits) bitmap state in foreachBatch, and the states
    # OR-merge into the global exact count.  Idempotence is the
    # operational point: an at-least-once replay of a whole batch
    # changes NOTHING (OR absorbs it), where every counting scheme
    # needs dedup state.  State per batch is words-sized, never rows --
    # but words-sized is DATA-DEPENDENT (types x dense-id-range/63 grows
    # with the id universe; see _STATE_CARDINALITY), so this twin uses
    # the executor-side parquet epoch-union pattern proven by
    # stream_session_merge (VERDICT r12 #2): per-batch states APPEND to
    # a parquet store, the OR-merge runs as the distributed groupBy it
    # always was, and the result detaches via eager localCheckpoint --
    # no collect(), no driver list, no max_state_rows cliff at 100x.
    from kcl_akka_stream_spark.operators.sketches import (
        bitmap_counts,
        bitmap_merge,
        bitmap_state,
    )

    ev = tbl(spark, sf_dir, "events").select("event_type", "user_id")
    src = tempfile.mkdtemp(prefix="kcl_bitmap_src_")
    state_dir = tempfile.mkdtemp(prefix="kcl_bitmap_state_")
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            st = bitmap_state(batch_df, "event_type", "user_id")
            # executor-side state append: no collect(), no driver list
            st.write.mode("append").parquet(state_dir)

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        states = spark.read.schema(
            "event_type string, wrd long, bits long"
        ).parquet(state_dir)
        merged = bitmap_merge(states, "event_type")
        out = bitmap_counts(merged, "event_type").select(
            "event_type", "n_words", "n_distinct"
        )
        # detach from state_dir before the finally-rmtree, executor-sized
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(state_dir, ignore_errors=True)


def _reservoir_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["sample_reservoir_merge"]


@query("stream_reservoir_merge", _reservoir_oracle())
def stream_reservoir_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of sample_reservoir_merge, SAME oracle: each
    # micro-batch folds to its bottom-k-by-hash survivors
    # (operators/sampling.py::hash_bottom_k), the accumulated k-row
    # states merge by re-applying the same selection, and the oracle
    # rebuilds the sample directly from all raw rows -- merged == direct
    # is the hash match.  The ninth mergeable-state streaming family,
    # and (with the bitmap) the second IDEMPOTENT one: a replayed batch
    # re-offers rows whose hashes are already in (or above) the bottom-k,
    # so at-least-once delivery cannot change the sample -- the
    # always-fresh uniform inspection panel over an unbounded stream at
    # k-rows state cost.
    from pyspark.sql import Window

    from kcl_akka_stream_spark.operators.sampling import hash_bottom_k

    ev = tbl(spark, sf_dir, "events").select("event_type", "event_id")
    src = tempfile.mkdtemp(prefix="kcl_rsv_src_")
    states: list = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            states.extend(
                _collect_state(
                    hash_bottom_k(batch_df, "event_type", "event_id", 8, seed="rsv"),
                    "stream_reservoir_merge", domain_bound=256,
                )
            )

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.createDataFrame(states, "event_type string, event_id long")
        merged = hash_bottom_k(st, "event_type", "event_id", 8, seed="rsv")
        key = F.md5(
            F.concat(F.lit("rsv|"), F.col("event_id").cast("string"))
        )
        w = Window.partitionBy("event_type").orderBy(key, F.col("event_id"))
        return merged.select(
            "event_type",
            F.row_number().over(w).alias("sample_rank"),
            "event_id",
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _bootstrap_ci_oracle() -> str:
    from kcl_akka_stream_spark.queries.pipeline import _bootstrap_oracle

    return _bootstrap_oracle()


@query("stream_bootstrap_merge", _bootstrap_ci_oracle())
def stream_bootstrap_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of agg_bootstrap_ci, SAME oracle -- the TENTH
    # mergeable-state streaming family: each micro-batch folds to
    # per-(type, replica) partial weighted sums (sum(w*cents), sum(w))
    # plus the point-estimate moments (n, sum cents); both states merge
    # by plain int64 addition, and the replicate means / rank / CI
    # derive ONLY after the merge (a mean is not mergeable; its
    # numerator and denominator are -- the rollup_incremental lesson).
    # Deterministic md5 weights make every replicate independent of
    # batch boundaries, so 4-batch-fold == direct build bit-for-bit.
    from pyspark.sql import Window

    from kcl_akka_stream_spark.operators.sampling import (
        poisson_bootstrap_weights,
    )

    ev = tbl(spark, sf_dir, "events").select("event_type", "event_id", "value")
    src = tempfile.mkdtemp(prefix="kcl_boot_src_")
    rep_states: list = []
    pt_states: list = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            reps = poisson_bootstrap_weights(
                batch_df, "event_id", b=32
            ).withColumn("cents", cents)
            rep_states.extend(
                _collect_state(
                    reps.groupBy("event_type", "b").agg(
                        F.sum(F.col("w") * F.col("cents"))
                        .cast("long")
                        .alias("swc"),
                        F.sum("w").cast("long").alias("sw"),
                    ),
                    "stream_bootstrap_merge:replicates", domain_bound=1024,
                )
            )
            pt_states.extend(
                _collect_state(
                    batch_df.groupBy("event_type").agg(
                        F.count(F.lit(1)).cast("long").alias("n"),
                        F.sum(cents).cast("long").alias("s1"),
                    ),
                    "stream_bootstrap_merge:point", domain_bound=32,
                )
            )

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        rs = spark.createDataFrame(
            rep_states, "event_type string, b long, swc long, sw long"
        )
        rep_means = (
            rs.groupBy("event_type", "b")
            .agg(
                F.sum("swc").cast("long").alias("swc"),
                F.sum("sw").cast("long").alias("sw"),
            )
            .select(
                "event_type",
                "b",
                F.expr("swc * 100 div greatest(sw, 1)").alias("mean_cc"),
            )
        )
        w = Window.partitionBy("event_type").orderBy("mean_cc", "b")
        ranked = rep_means.withColumn("r", F.row_number().over(w))
        ci = ranked.groupBy("event_type").agg(
            F.max(F.when(F.col("r") == 2, F.col("mean_cc"))).alias("ci_lo_cc"),
            F.max(F.when(F.col("r") == 31, F.col("mean_cc"))).alias("ci_hi_cc"),
        )
        ps = spark.createDataFrame(pt_states, "event_type string, n long, s1 long")
        pt = (
            ps.groupBy("event_type")
            .agg(
                F.sum("n").cast("long").alias("n_events"),
                F.sum("s1").cast("long").alias("s1"),
            )
            .select(
                "event_type",
                "n_events",
                F.expr("s1 * 100 div n_events").cast("long").alias("mean_cc"),
            )
        )
        return pt.join(ci, "event_type").select(
            "event_type",
            "n_events",
            F.col("mean_cc").cast("long").alias("mean_cc"),
            F.col("ci_lo_cc").cast("long").alias("ci_lo_cc"),
            F.col("ci_hi_cc").cast("long").alias("ci_hi_cc"),
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _pearson_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["agg_pearson_corr"]


@query("stream_pearson_merge", _pearson_oracle())
def stream_pearson_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of agg_pearson_corr, SAME oracle -- the ELEVENTH
    # mergeable-state streaming family: the six-integer sufficient
    # statistic (n, sx, sy, sxy, sx2, sy2) folds per micro-batch and
    # merges by plain int64 addition; r and the slope derive ONLY after
    # the merge (correlation is not mergeable; its moments are).
    # Int64 sums are order-independent, so 4-batch-fold == direct build
    # bit-for-bit.
    ev = tbl(spark, sf_dir, "events").select("event_type", "ts", "value")
    src = tempfile.mkdtemp(prefix="kcl_pearson_src_")
    states: list = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            x = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            y = F.hour("ts").cast("long")
            states.extend(
                _collect_state(
                    batch_df.select("event_type", x.alias("x"), y.alias("y"))
                    .groupBy("event_type")
                    .agg(
                        F.count(F.lit(1)).cast("long").alias("n"),
                        F.sum("x").cast("long").alias("sx"),
                        F.sum("y").cast("long").alias("sy"),
                        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
                        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
                        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
                    ),
                    "stream_pearson_merge", domain_bound=32,
                )
            )

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.createDataFrame(
            states,
            "event_type string, n long, sx long, sy long, sxy long, "
            "sx2 long, sy2 long",
        )
        merged = st.groupBy("event_type").agg(
            *[F.sum(c).cast("long").alias(c) for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")]
        )
        d = lambda c: F.col(c).cast("double")  # noqa: E731
        cov_n = d("n") * d("sxy") - d("sx") * d("sy")
        varx_n = d("n") * d("sx2") - d("sx") * d("sx")
        vary_n = d("n") * d("sy2") - d("sy") * d("sy")
        return merged.select(
            "event_type",
            "n",
            "sx",
            "sy",
            "sxy",
            "sx2",
            "sy2",
            F.when(
                (varx_n > 0) & (vary_n > 0),
                F.round(cov_n / (F.sqrt(varx_n) * F.sqrt(vary_n)), 6),
            ).alias("corr_r"),
            F.when(varx_n > 0, F.floor(cov_n * F.lit(1000000.0) / varx_n))
            .cast("long")
            .alias("beta_micro"),
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _kl_drift_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["agg_histogram_kl_drift"]


@query("stream_kl_drift_merge", _kl_drift_oracle())
def stream_kl_drift_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of agg_histogram_kl_drift, SAME oracle -- the
    # TWELFTH mergeable-state streaming family, and the cleanest
    # demonstration of the fold/merge/FINALIZE split: the state is the
    # raw (type, half, bin) count histogram (plain-addition mergeable);
    # the +1 Laplace smoothing, the full-outer bin alignment and the
    # frozen-ln KL fold are all FINALIZE steps that run only after the
    # merge -- smoothing per batch would double-count the prior and
    # break merge == direct.
    #
    # VERDICT r14 #5: formerly the joint-largest driver fold
    # (domain_bound=65536 = types x 2 halves x value-range bins); bins
    # grow with the VALUE DOMAIN, so a wide-range production stream
    # outgrows any driver list.  Migrated to the executor-side parquet
    # epoch-union pattern: per-batch histograms APPEND to a parquet
    # store, the count merge is the distributed groupBy it always was,
    # and the result detaches via eager localCheckpoint.
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events").select("event_type", "event_id", "value")
    src = tempfile.mkdtemp(prefix="kcl_kl_src_")
    state_dir = tempfile.mkdtemp(prefix="kcl_kl_state_")
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            st = (
                batch_df.select(
                    "event_type",
                    (F.col("event_id") % 2).cast("int").alias("half"),
                    F.expr(
                        "cast(floor(value * 100 + 0.5) as bigint) div 100"
                    ).alias("bin"),
                )
                .groupBy("event_type", "half", "bin")
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
            _capture_plan("stream_kl_drift_merge", st)
            # executor-side state append: no collect(), no driver list
            st.write.mode("append").parquet(state_dir)

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.read.schema(
            "event_type string, half int, bin long, c long"
        ).parquet(state_dir)
        merged = st.groupBy("event_type", "half", "bin").agg(
            F.sum("c").cast("long").alias("c")
        )
        ha = merged.filter(F.col("half") == 0).select(
            "event_type", "bin", F.col("c").alias("a")
        )
        hb = merged.filter(F.col("half") == 1).select(
            "event_type", "bin", F.col("c").alias("bc")
        )
        j = ha.join(hb, ["event_type", "bin"], "full_outer").select(
            "event_type",
            "bin",
            (F.coalesce("a", F.lit(0)) + 1).alias("a1"),
            (F.coalesce("bc", F.lit(0)) + 1).alias("b1"),
        )
        tw = Window.partitionBy("event_type")
        t = j.withColumn("na", F.sum("a1").over(tw)).withColumn(
            "nb", F.sum("b1").over(tw)
        )
        term = F.round(
            F.log(
                (F.col("a1").cast("double") * F.col("nb"))
                / (F.col("b1").cast("double") * F.col("na"))
            )
            * 1e6,
            0,
        ).cast("long")
        out = t.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.max("na").cast("long").alias("n_a_smoothed"),
            F.max("nb").cast("long").alias("n_b_smoothed"),
            F.sum(F.col("a1") * term).cast("long").alias("kl_num_micro"),
        )
        # detach from state_dir before the finally-rmtree, types-sized
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(state_dir, ignore_errors=True)


def _ks_drift_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["agg_ks_drift"]


@query("stream_ks_merge", _ks_drift_oracle())
def stream_ks_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of agg_ks_drift, SAME oracle -- the THIRTEENTH
    # mergeable-state streaming family.  The state is the raw
    # (type, half, deci-bin) count histogram (plain-addition mergeable,
    # the same state shape as the KL twin); the full-outer bin
    # alignment, the cumulative-CDF windows and the common-denominator
    # max-gap fold are all FINALIZE steps that run only after the merge
    # -- a per-batch CDF would be meaningless (cumulative sums do not
    # merge; counts do).
    #
    # VERDICT r14 #5: formerly the joint-largest driver fold
    # (domain_bound=65536, same deci-bin domain argument as the KL
    # twin); migrated to the executor-side parquet epoch-union pattern
    # -- per-batch histograms append executor-side, the count merge is
    # distributed, the result detaches via eager localCheckpoint.
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events").select("event_type", "event_id", "value")
    src = tempfile.mkdtemp(prefix="kcl_ks_src_")
    state_dir = tempfile.mkdtemp(prefix="kcl_ks_state_")
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            st = (
                batch_df.select(
                    "event_type",
                    (F.col("event_id") % 2).cast("int").alias("half"),
                    F.expr(
                        "cast(floor(value * 10 + 0.5) as bigint)"
                    ).alias("bin"),
                )
                .groupBy("event_type", "half", "bin")
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
            _capture_plan("stream_ks_merge", st)
            # executor-side state append: no collect(), no driver list
            st.write.mode("append").parquet(state_dir)

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.read.schema(
            "event_type string, half int, bin long, c long"
        ).parquet(state_dir)
        # merge (plain addition on the state key) and pivot the halves in
        # the SAME agg -- the finalize needs no per-half relation or
        # alignment join
        j = st.groupBy("event_type", "bin").agg(
            F.sum(F.when(F.col("half") == 0, F.col("c")).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("half") == 1, F.col("c")).otherwise(0))
            .cast("long")
            .alias("cb"),
        )
        wcum = (
            Window.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wall = Window.partitionBy("event_type")
        cum = j.select(
            "event_type",
            F.sum("ca").over(wcum).alias("cum_a"),
            F.sum("cb").over(wcum).alias("cum_b"),
            F.sum("ca").over(wall).alias("na"),
            F.sum("cb").over(wall).alias("nb"),
        )
        out = cum.groupBy("event_type").agg(
            F.max("na").cast("long").alias("na"),
            F.max("nb").cast("long").alias("nb"),
            # ppm scaling is ONE shared IEEE double op (gini_ppm pattern;
            # the old *1_000_000 int64 form overflowed past ~3e6 rows per
            # half -- ADVICE r10, fixed in lockstep with agg_ks_drift)
            F.expr(
                "cast(floor(cast(max(abs(cum_a * nb - cum_b * na)) as double)"
                " * 1000000.0 / (cast(max(na) as double) * max(nb))) as bigint)"
            ).alias("ks_ppm"),
        )
        # detach from state_dir before the finally-rmtree, types-sized
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(state_dir, ignore_errors=True)


def _entropy_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["agg_entropy_profile"]


@query("stream_entropy_merge", _entropy_oracle())
def stream_entropy_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of agg_entropy_profile, SAME oracle -- the
    # FOURTEENTH mergeable-state streaming family.  State = (type, hour)
    # counts (plain-addition mergeable); the frozen-ln entropy fold is a
    # FINALIZE step strictly after the merge (a per-batch entropy would
    # average entropies, which is not the entropy of the union).
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events").select("event_type", "ts")
    src = tempfile.mkdtemp(prefix="kcl_ent_src_")
    states: list = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            states.extend(
                _collect_state(
                    batch_df.groupBy(
                        "event_type", F.hour("ts").cast("long").alias("hr")
                    ).agg(F.count(F.lit(1)).cast("long").alias("c")),
                    "stream_entropy_merge", domain_bound=768,
                )
            )

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.createDataFrame(states, "event_type string, hr long, c long")
        merged = st.groupBy("event_type", "hr").agg(
            F.sum("c").cast("long").alias("c")
        )
        t = merged.withColumn(
            "n", F.sum("c").over(Window.partitionBy("event_type"))
        )
        return t.groupBy("event_type").agg(
            F.max("n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.expr(
                "cast(sum(c * cast(round(ln(cast(n as double) / c) * 1000000)"
                " as bigint)) div max(n) as bigint)"
            ).alias("entropy_micronats"),
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _mi_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["agg_mutual_information"]


@query("stream_mi_merge", _mi_oracle())
def stream_mi_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of agg_mutual_information, SAME oracle -- the
    # FIFTEENTH mergeable-state streaming family, sharing the
    # (type, hour) count state shape with stream_entropy_merge: counts
    # merge by addition; margins, the frozen-ln MI fold and both
    # marginal entropies are FINALIZE steps strictly after the merge
    # (per-batch MI would need per-batch margins -- meaningless for the
    # union).
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events").select("event_type", "ts")
    src = tempfile.mkdtemp(prefix="kcl_mi_src_")
    states: list = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            states.extend(
                _collect_state(
                    batch_df.groupBy(
                        "event_type", F.hour("ts").cast("long").alias("hr")
                    ).agg(F.count(F.lit(1)).cast("long").alias("c")),
                    "stream_mi_merge", domain_bound=768,
                )
            )

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.createDataFrame(states, "event_type string, hr long, c long")
        cells = st.groupBy("event_type", "hr").agg(
            F.sum("c").cast("long").alias("o")
        ).localCheckpoint(eager=True)
        m = cells.select(
            "o",
            F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
            F.sum("o").over(Window.partitionBy("hr")).alias("c"),
            F.sum("o").over(Window.partitionBy()).alias("n"),
        )
        mi = m.agg(
            F.max("n").cast("long").alias("n"),
            F.expr(
                "cast(sum(o * cast(round(ln(cast(o as double) * n"
                " / (cast(r as double) * c)) * 1000000) as bigint))"
                " div max(n) as bigint)"
            ).alias("mi_micronats"),
        )

        def _margin_entropy(key: str, alias: str):
            mg = cells.groupBy(key).agg(F.sum("o").cast("long").alias("cnt"))
            mg = mg.withColumn("n1", F.sum("cnt").over(Window.partitionBy()))
            return mg.agg(
                F.expr(
                    "cast(sum(cnt * cast(round(ln(cast(n1 as double) / cnt)"
                    " * 1000000) as bigint)) div max(n1) as bigint)"
                ).alias(alias)
            )

        hx = _margin_entropy("event_type", "h_type_micronats")
        hy = _margin_entropy("hr", "h_hour_micronats")
        return (
            mi.crossJoin(F.broadcast(hx))
            .crossJoin(F.broadcast(hy))
            .select("n", "mi_micronats", "h_type_micronats", "h_hour_micronats")
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _ohlc_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["w_ohlc_bars"]


@query("stream_ohlc_merge", _ohlc_oracle())
def stream_ohlc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming twin of w_ohlc_bars, SAME oracle -- the SIXTEENTH
    # mergeable family and the first NON-ADDITIVE one: the per-(type,
    # bar) state is a LATTICE element (earliest-keyed open, max, min,
    # latest-keyed close, count) and merge is component-wise
    # min/max/min/max/sum -- open/close carry their (ts, event_id)
    # ordering key THROUGH the merge as a struct, so merging any batch
    # split reproduces the direct bar exactly (struct min/max orders
    # lexicographically; (ts, event_id) is unique).  Counts merge by
    # addition like every other family; the lattice components are why
    # "mergeable state" means commutative-associative-idempotent-capable
    # combination, not just sums.
    #
    # VERDICT r14 #5: this was the largest-bound driver fold
    # (domain_bound=35328 = types x hourly bars); bars grow with the
    # stream's TIME-SPAN, so on a years-long production stream the
    # driver list is the wrong place for the state.  Migrated to the
    # executor-side parquet epoch-union pattern proven by
    # stream_bitmap_merge / stream_session_merge: per-batch bar states
    # APPEND to a parquet store (no collect(), no driver list), the
    # lattice merge runs as the distributed groupBy it always was, and
    # the result detaches via eager localCheckpoint.
    ev = tbl(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    src = tempfile.mkdtemp(prefix="kcl_ohlc_src_")
    state_dir = tempfile.mkdtemp(prefix="kcl_ohlc_state_")
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            x = F.expr("cast(floor(value * 10 + 0.5) as bigint)")
            st = (
                batch_df.select(
                    "event_type",
                    F.date_trunc("hour", "ts").alias("bar"),
                    F.struct("ts", "event_id", x.alias("x")).alias("okey"),
                    x.alias("x"),
                )
                .groupBy("event_type", "bar")
                .agg(
                    F.min("okey").alias("o"),
                    F.max("x").alias("h"),
                    F.min("x").alias("l"),
                    F.max("okey").alias("c"),
                    F.count(F.lit(1)).alias("n"),
                )
                .select(
                    "event_type", "bar",
                    F.col("o.ts").alias("o_ts"),
                    F.col("o.event_id").alias("o_id"),
                    F.col("o.x").alias("o_x"),
                    "h", "l",
                    F.col("c.ts").alias("c_ts"),
                    F.col("c.event_id").alias("c_id"),
                    F.col("c.x").alias("c_x"),
                    F.col("n").cast("long").alias("n"),
                )
            )
            _capture_plan("stream_ohlc_merge", st)
            # executor-side state append: no collect(), no driver list
            st.write.mode("append").parquet(state_dir)

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.read.schema(
            "event_type string, bar timestamp, o_ts timestamp, o_id long,"
            " o_x long, h long, l long, c_ts timestamp, c_id long, c_x long,"
            " n long"
        ).parquet(state_dir)
        merged = st.groupBy("event_type", "bar").agg(
            F.min(F.struct("o_ts", "o_id", "o_x")).alias("o"),
            F.max("h").alias("h"),
            F.min("l").alias("l"),
            F.max(F.struct("c_ts", "c_id", "c_x")).alias("c"),
            F.sum("n").cast("long").alias("n"),
        )
        out = merged.select(
            "event_type",
            F.date_format("bar", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
            "n",
            F.col("o.o_x").cast("long").alias("open_deci"),
            F.col("h").cast("long").alias("high_deci"),
            F.col("l").cast("long").alias("low_deci"),
            F.col("c.c_x").cast("long").alias("close_deci"),
        )
        # detach from state_dir before the finally-rmtree, bar-sized
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(state_dir, ignore_errors=True)


@query(
    "stream_topk_merge",
    """
    WITH v AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    r AS (
      SELECT event_type, event_id, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents DESC, event_id) AS rk
      FROM v)
    SELECT event_type, CAST(rk AS BIGINT) AS rk,
           CAST(event_id AS BIGINT) AS event_id, cents
    FROM r WHERE rk <= 8
    """,
)
def stream_topk_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The SEVENTEENTH mergeable-state streaming family, and the second
    # NON-additive one (after the OHLC lattice): bounded ORDER-STATISTIC
    # state.  Each micro-batch folds to its own per-type top-8 events by
    # value (k rows per type, k-bounded regardless of batch size); the
    # merge is identity-DEDUP then re-top-k over the UNION of batch
    # states -- associative, commutative and IDEMPOTENT: a replayed
    # batch re-offers rows the distinct() absorbs, so at-least-once
    # delivery changes nothing.  The dedup is the load-bearing half of
    # the idempotence claim (bare multiset concat + re-top-k would rank
    # a replayed element twice -- caught by this wave's lattice pytest
    # while writing it).  Merge == direct is the lattice law
    # top_k(A ∪ B) = top_k(top_k(A) ∪ top_k(B)) over SET union --
    # proven over every 2-way split in pytest (the OHLC proof pattern).
    # The deterministic (cents DESC, event_id) tiebreak makes the state
    # and the oracle bit-equal.
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events").select("event_type", "event_id", "value")
    src = tempfile.mkdtemp(prefix="kcl_topk_src_")
    state_rows = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        wk = Window.partitionBy("event_type").orderBy(
            F.col("cents").desc(), "event_id"
        )

        def fold_state(batch_df, epoch_id):
            st = (
                batch_df.select(
                    "event_type",
                    "event_id",
                    F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias(
                        "cents"
                    ),
                )
                .withColumn("rk", F.row_number().over(wk))
                .filter(F.col("rk") <= 8)
                .drop("rk")
            )
            state_rows.extend(_collect_state(st, "stream_topk_merge", domain_bound=256))

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        states = spark.createDataFrame(
            state_rows, "event_type string, event_id long, cents long"
        ).distinct()  # identity dedup: absorbs at-least-once batch replays
        return (
            states.withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") <= 8)
            .select(
                "event_type",
                F.col("rk").cast("long").alias("rk"),
                F.col("event_id").cast("long").alias("event_id"),
                "cents",
            )
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _sessionize_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["w_sessionize"]


@query("stream_session_merge", _sessionize_oracle())
def stream_session_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The EIGHTEENTH mergeable-state streaming family and the third
    # non-additive one: SESSION-INTERVAL state (the merge that makes
    # session windows work in Spark/Flink/Beam, public).  Each
    # micro-batch sessionizes ITS OWN events (gap 1800 s) and keeps one
    # (user, start_us, end_us) interval per batch-local session; the
    # merge is gap-closing interval union -- a closure operator, so
    # closure(closure(A) ∪ closure(B)) == closure(A ∪ B) and batch
    # boundaries cannot split or double-count a session even though
    # maxFilesPerTrigger slices the stream in arbitrary event order.
    # The endpoint rule equals the event rule: if any earlier event
    # lies within the gap of a new interval's start, the covering
    # interval's END does too.  SAME oracle as w_sessionize (per-user
    # session counts).  State is (user x batch-local sessions)-sized --
    # the largest state of the 18 families -- so unlike the other 17
    # twins (whose folds are group-bounded AGGREGATES and go through the
    # _collect_state guard) it NEVER touches the driver (VERDICT r11
    # #2): each epoch's interval relation is appended executor-side to
    # a parquet epoch-union store, and the gap-closing closure runs as
    # a DISTRIBUTED per-user window over the union (running-max
    # streaming frame).  At 100x the state grows in files and shuffle
    # partitions, not driver memory -- the max_state_rows guard no
    # longer binds this twin's scale.
    from pyspark.sql import Window

    from kcl_akka_stream_spark.operators.windows import sessionize

    ev = tbl(spark, sf_dir, "events").select("user_id", "ts")
    src = tempfile.mkdtemp(prefix="kcl_sess_src_")
    state_dir = tempfile.mkdtemp(prefix="kcl_sess_state_")
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            sess = sessionize(batch_df, "user_id", "ts", 1800)
            st = sess.groupBy("user_id", "session_id").agg(
                F.min(F.unix_micros("ts")).alias("s_us"),
                F.max(F.unix_micros("ts")).alias("e_us"),
            ).drop("session_id")
            _capture_plan("stream_session_merge", st)
            # executor-side state append: no collect(), no driver list
            st.write.mode("append").parquet(state_dir)

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        states = spark.read.schema(
            "user_id long, s_us long, e_us long"
        ).parquet(state_dir)
        w = Window.partitionBy("user_id").orderBy("s_us", "e_us")
        prev_max_e = F.max("e_us").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        merged = states.select(
            "user_id",
            F.when(
                prev_max_e.isNull()
                | (F.col("s_us") - prev_max_e > 1800 * 1_000_000),
                1,
            )
            .otherwise(0)
            .alias("new_session"),
        )
        out = merged.groupBy("user_id").agg(
            F.sum("new_session").cast("long").alias("n_sessions")
        )
        # eager localCheckpoint detaches the result from state_dir before
        # the finally-rmtree, keeping it EXECUTOR-sized (block manager
        # partitions, never a driver row list -- the stream_cdc_upsert
        # collect() detach pattern is the cliff this twin removes).
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(state_dir, ignore_errors=True)


def _minhash_lang_oracle(num_hashes: int = 8) -> str:
    # Per-lang minhash signature over ALL docs' shingles (the direct
    # batch sketch the streamed per-batch mins must collapse to).
    # Per-doc shingle dedup is irrelevant under min(), so the CTE skips
    # it; hash layout mirrors operators/dedup.py::minhash_signatures.
    mins = ",\n           ".join(
        f"min(substr({'h1' if s < 4 else 'h2'}, {(s % 4) * 8 + 1}, 8))"
        f" AS mh_{s}"
        for s in range(num_hashes)
    )
    return f"""
    WITH toks AS (
      SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents),
    sh AS (
      SELECT lang, unnest(
        CASE WHEN len(t) >= 3
             THEN [array_to_string(list_slice(t, i, i + 2), ' ')
                   FOR i IN generate_series(1, len(t) - 2)]
             ELSE [array_to_string(t, ' ')] END) AS shingle
      FROM toks),
    h AS (
      SELECT lang, md5(shingle) AS h1, md5(shingle || '#1') AS h2 FROM sh)
    SELECT lang,
           {mins}
    FROM h GROUP BY lang
    """


@query("stream_minhash_merge", _minhash_lang_oracle())
def stream_minhash_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The NINETEENTH mergeable-state streaming family, 4th non-additive:
    # the MINHASH SIGNATURE itself is a semilattice under elementwise
    # min -- min(sig(A), sig(B)) == sig(A UNION B) by definition of the
    # min-hash, so per-batch per-lang signatures merge into exactly the
    # whole-corpus signature (idempotent: a replayed batch re-offers
    # values the min absorbs; at-least-once delivery changes nothing).
    # This is how a streaming ingest maintains the near-dup sketch of a
    # growing corpus WITHOUT recomputing it: state is langs x 8 hex
    # chunks, never the data.  Oracle = the direct batch signature.
    from kcl_akka_stream_spark.operators.dedup import minhash_signatures

    docs = tbl(spark, sf_dir, "documents").select("lang", "text")
    src = tempfile.mkdtemp(prefix="kcl_mh_src_")
    state_rows = []
    try:
        _write_epoch_fixture(docs, src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            st = minhash_signatures(batch_df, text_col="text", id_col="lang")
            state_rows.extend(_collect_state(st, "stream_minhash_merge", domain_bound=64))

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        states = spark.createDataFrame(
            state_rows,
            "lang string, " + ", ".join(f"mh_{s} string" for s in range(8)),
        )
        return states.groupBy("lang").agg(
            *[F.min(f"mh_{s}").alias(f"mh_{s}") for s in range(8)]
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _bloom_merge_oracle(m_bits: int = 16384, k_hashes: int = 4,
                        n_probes: int = 200) -> str:
    # Ground truth recomputes the Bloom filter BIT-FOR-BIT from the
    # distinct (type, user) relation: OR is idempotent, so the direct
    # build over all rows must equal the 4-batch OR-merge -- the lattice
    # property under test.  Same md5 position hash as the Spark side.
    def pos(expr: str) -> str:
        return (
            f"('0x' || substr(md5({expr}), 1, 8))::BIGINT % {m_bits}"
        )

    return f"""
    WITH ev AS (SELECT DISTINCT event_type, user_id FROM events),
    pos AS (
      SELECT event_type,
             {pos("user_id::VARCHAR || '|' || i::VARCHAR")} AS p
      FROM ev, (SELECT unnest(generate_series(0, {k_hashes - 1})) AS i)),
    words AS (
      SELECT event_type, p // 63 AS wrd,
             bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
      FROM pos GROUP BY event_type, p // 63),
    filt AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(bit_count(bits)) AS BIGINT) AS n_bits_set
      FROM words GROUP BY event_type),
    probes AS (
      SELECT 'absent:' || j::VARCHAR AS pk, i
      FROM (SELECT unnest(generate_series(0, {n_probes - 1})) AS j),
           (SELECT unnest(generate_series(0, {k_hashes - 1})) AS i)),
    ppos AS (
      SELECT pk, {pos("pk || '|' || i::VARCHAR")} AS p FROM probes),
    hits AS (
      SELECT w.event_type, pp.pk,
             CASE WHEN count(*) FILTER (
                    w.bits & (1::BIGINT << CAST(pp.p % 63 AS INT)) <> 0
                  ) = {k_hashes} THEN 1 ELSE 0 END AS hit
      FROM ppos pp JOIN words w ON w.wrd = pp.p // 63
      GROUP BY w.event_type, pp.pk),
    fp AS (
      SELECT event_type, CAST(sum(hit) AS BIGINT) AS fp_probe_hits
      FROM hits GROUP BY event_type),
    truth AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_true_keys
      FROM ev GROUP BY event_type)
    SELECT f.event_type, f.n_words, f.n_bits_set,
           t.n_true_keys,
           COALESCE(p.fp_probe_hits, 0) AS fp_probe_hits,
           CASE WHEN f.n_bits_set < {m_bits} THEN
             CAST(round(-({m_bits}.0 / {k_hashes})
                  * ln(CAST({m_bits} - f.n_bits_set AS DOUBLE) / {m_bits})
                  * 1000000, 0) AS BIGINT)
           END AS est_keys_micro
    FROM filt f
    JOIN truth t ON t.event_type = f.event_type
    LEFT JOIN fp p ON p.event_type = f.event_type
    """


@query("stream_bloom_merge", _bloom_merge_oracle())
def stream_bloom_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The TWENTIETH mergeable-state streaming family, and the third
    # IDEMPOTENT one (after bitmap and reservoir): a fixed-m Bloom
    # filter is an OR-semilattice over its bit words, so per-batch
    # filters merge into exactly the whole-stream filter and an
    # at-least-once replay is absorbed for free.  Unlike the bitmap
    # twin (words = id-range/63, data-dependent -> epoch-union) the
    # Bloom state is CONSTANT: <= m/63 words per type regardless of id
    # universe -- the membership sketch a streaming ingest keeps when
    # ids are sparse and exactness can trade for fixed memory.
    # FINALIZE (after the merge, like every family): bit census, the
    # standard -m/k * ln(1 - X/m) cardinality inversion (micro-frozen;
    # (m - X)/m is exact in binary FP because m is a power of two), and
    # a 200-probe ENGINEERED-ABSENT panel whose hit count is the
    # measured false-positive rate -- the acceptance signal; the oracle
    # rebuilds the filter bit-for-bit from the distinct relation.
    m_bits, k_hashes, n_probes = 16384, 4, 200

    def positions(expr: str):
        return [
            F.expr(
                f"cast(conv(substr(md5(concat({expr}, '|{i}')), 1, 8),"
                f" 16, 10) as bigint) % {m_bits}"
            )
            for i in range(k_hashes)
        ]

    # VERDICT r14 #5: although the Bloom state is CONSTANT-bounded
    # (types x ceil(m/63) words), it was the largest remaining driver
    # fold after the domain-growing families migrated; the epoch-union
    # pattern costs nothing here and removes the driver list entirely --
    # per-batch word states append executor-side, the bit_or merge is
    # distributed, the result detaches via eager localCheckpoint.
    ev = tbl(spark, sf_dir, "events").select("event_type", "user_id")
    src = tempfile.mkdtemp(prefix="kcl_bloom_src_")
    state_dir = tempfile.mkdtemp(prefix="kcl_bloom_state_")
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            st = (
                batch_df.select(
                    "event_type",
                    F.explode(
                        F.array(*positions("cast(user_id as string)"))
                    ).alias("p"),
                )
                .select(
                    "event_type",
                    F.expr("p div 63").alias("wrd"),
                    F.expr("shiftleft(1L, cast(p % 63 as int))").alias("msk"),
                )
                .groupBy("event_type", "wrd")
                .agg(F.bit_or("msk").alias("bits"))
            )
            _capture_plan("stream_bloom_merge", st)
            # executor-side state append: no collect(), no driver list
            st.write.mode("append").parquet(state_dir)

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.read.schema(
            "event_type string, wrd long, bits long"
        ).parquet(state_dir)
        words = st.groupBy("event_type", "wrd").agg(
            F.bit_or("bits").alias("bits")
        ).localCheckpoint(eager=True)  # feeds the census AND the probe panel
        filt = words.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.bit_count("bits")).cast("long").alias("n_bits_set"),
        )
        probes = (
            spark.range(n_probes)
            .select(F.concat(F.lit("absent:"), F.col("id")).alias("pk"))
            .select(
                "pk", F.explode(F.array(*positions("pk"))).alias("p")
            )
        )
        hits = (
            probes.join(
                words, words["wrd"] == F.expr("p div 63"), "inner"
            )
            .groupBy("event_type", "pk")
            .agg(
                (
                    F.sum(
                        F.expr(
                            "cast(bits & shiftleft(1L, cast(p % 63 as int))"
                            " <> 0 as int)"
                        )
                    )
                    == k_hashes
                )
                .cast("int")
                .alias("hit")
            )
        )
        fp = hits.groupBy("event_type").agg(
            F.sum("hit").cast("long").alias("fp_probe_hits")
        )
        truth = ev.distinct().groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_true_keys")
        )
        # saturation guard (ADVICE r13): if a type's filter ever fills
        # every bit (n_bits_set == m), ln(0) -> -inf and the engines
        # DIVERGE in failure mode (Spark non-ANSI casts +inf to
        # Long.MAX, DuckDB CAST raises) -- NULL the estimate on both
        # sides with an identical CASE instead
        est = (
            f"case when n_bits_set < {m_bits} then"
            f" cast(round(-(cast({m_bits} as double) / {k_hashes})"
            f" * ln(cast({m_bits} - n_bits_set as double) / {m_bits})"
            " * 1000000, 0) as bigint) end"
        )
        out = (
            filt.join(truth, "event_type")
            .join(fp, "event_type", "left")
            .select(
                "event_type",
                "n_words",
                "n_bits_set",
                "n_true_keys",
                F.coalesce("fp_probe_hits", F.lit(0))
                .cast("long")
                .alias("fp_probe_hits"),
                F.expr(est).alias("est_keys_micro"),
            )
        )
        # detach from state_dir before the finally-rmtree, types-sized
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(state_dir, ignore_errors=True)


def _quantile_merge_oracle(k: int = 256, n_dec: int = 9) -> str:
    # The oracle REBUILDS the merged sketch bit-for-bit: same seeded md5
    # hash order, same bottom-k selection, same rank-pick decile rule,
    # same integer ppm arithmetic -- merged == direct is the hash match.
    return f"""
    WITH ev AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    hr AS (
      SELECT event_type, event_id, cents,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5('qsk|' || CAST(event_id AS VARCHAR)), event_id
             ) AS hrk
      FROM ev),
    s AS (SELECT event_type, event_id, cents FROM hr WHERE hrk <= {k}),
    sr AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS k_s
      FROM s),
    dec AS (SELECT unnest(generate_series(1, {n_dec})) AS decile),
    est AS (
      SELECT sr.event_type, d.decile,
             CAST(min(CASE WHEN 10 * sr.rn >= d.decile * sr.k_s
                           THEN sr.cents END) AS BIGINT) AS est_cents,
             CAST(max(sr.k_s) AS BIGINT) AS k_s
      FROM sr, dec d GROUP BY 1, 2),
    sle AS (
      SELECT e.event_type, e.decile,
             CAST(count(*) FILTER (s.cents <= e.est_cents) AS BIGINT) AS s_le
      FROM est e JOIN s ON s.event_type = e.event_type
      GROUP BY 1, 2),
    exl AS (
      SELECT e.event_type, e.decile,
             CAST(count(*) FILTER (v.cents <= e.est_cents) AS BIGINT)
               AS cnt_le,
             CAST(count(*) AS BIGINT) AS n
      FROM est e JOIN ev v ON v.event_type = e.event_type
      GROUP BY 1, 2)
    SELECT e.event_type, CAST(e.decile AS INT) AS decile, e.est_cents,
           e.k_s, x.n,
           1000000 * s.s_le // e.k_s AS sample_rank_ppm,
           1000000 * x.cnt_le // x.n AS exact_rank_ppm,
           abs(1000000 * x.cnt_le // x.n - 1000000 * s.s_le // e.k_s)
             AS err_ppm,
           CASE WHEN abs(1000000 * x.cnt_le // x.n
                         - 1000000 * s.s_le // e.k_s)
                     * abs(1000000 * x.cnt_le // x.n
                           - 1000000 * s.s_le // e.k_s)
                     * 2 * e.k_s <= 5298317000000
                THEN 1 ELSE 0 END AS within_dkw
    FROM est e
    JOIN sle s ON s.event_type = e.event_type AND s.decile = e.decile
    JOIN exl x ON x.event_type = e.event_type AND x.decile = e.decile
    ORDER BY e.event_type, e.decile
    """


@query("stream_quantile_merge", _quantile_merge_oracle())
def stream_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The TWENTY-FIRST mergeable-state streaming family (VERDICT r13 #6)
    # and the fourth IDEMPOTENT one: a MERGEABLE QUANTILE SUMMARY.  GK is
    # provably not fully mergeable and KLL's compactions are randomized /
    # merge-order-sensitive (Agarwal et al., "Mergeable Summaries", PODS
    # 2012 -- the paper that frames this whole family catalog); the
    # deterministic mergeable quantile summary that keeps a bit-for-bit
    # cross-engine oracle is the same paper's UNIFORM-SAMPLE summary,
    # made deterministic by a fixed hash order: per type keep the k=256
    # (id, cents) rows with the lowest seeded md5(id) -- a min-union
    # semilattice (bottom-k of a union of bottom-ks == bottom-k of the
    # union), so per-batch states merge exactly and an at-least-once
    # replay re-offers rows already in (or above) the sample: absorbed.
    # State is CONSTANT: types x k rows, domain-independent -- the
    # complement of stream_hist_merge, whose value-range bins grow with
    # the DOMAIN.  FINALIZE: rank-pick decile estimates from the merged
    # sample, then the ACCEPTANCE REPORT every sketch family carries --
    # the exact rank of each estimate (one broadcast 9-rows-per-type
    # pass over the raw relation, map-side combine) vs the sample rank,
    # gated by the DKW inequality at delta=0.01: err^2 * 2k <= ln(200)
    # held as the frozen integer micro-nat literal 5298317 so the gate
    # is pure int64 on both engines (no runtime transcendental).
    from kcl_akka_stream_spark.operators.sampling import hash_bottom_k

    k, n_dec = 256, 9
    ev = tbl(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    src = tempfile.mkdtemp(prefix="kcl_qsk_src_")
    states: list = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            states.extend(
                _collect_state(
                    hash_bottom_k(
                        batch_df, "event_type", "event_id", k, seed="qsk"
                    ),
                    "stream_quantile_merge",
                    domain_bound=8192,  # types<=32 x k=256 sample rows
                )
            )

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        from pyspark.sql import Window

        st = spark.createDataFrame(
            states, "event_type string, event_id long, cents long"
        )
        # merge = the same bottom-k selection over the unioned states
        # (min-union semilattice; replayed ids dedup inside the operator)
        merged = hash_bottom_k(st, "event_type", "event_id", k, seed="qsk")
        wr = Window.partitionBy("event_type").orderBy("cents", "event_id")
        wt = Window.partitionBy("event_type")
        sr = merged.select(
            "event_type",
            "cents",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wt).alias("k_s"),
        )
        dec = spark.range(1, n_dec + 1).select(
            F.col("id").cast("int").alias("decile")
        )
        est = (
            sr.crossJoin(F.broadcast(dec))
            .groupBy("event_type", "decile")
            .agg(
                F.min(
                    F.when(
                        10 * F.col("rn") >= F.col("decile") * F.col("k_s"),
                        F.col("cents"),
                    )
                )
                .cast("long")
                .alias("est_cents"),
                F.max("k_s").cast("long").alias("k_s"),
            )
            .localCheckpoint(eager=True)  # 45 rows; feeds BOTH rank passes
        )
        s_le = (
            merged.join(F.broadcast(est), "event_type")
            .groupBy("event_type", "decile")
            .agg(
                F.sum(
                    (F.col("cents") <= F.col("est_cents")).cast("long")
                ).alias("s_le")
            )
        )
        exact = (
            ev.join(F.broadcast(est), "event_type")
            .groupBy("event_type", "decile")
            .agg(
                F.sum(
                    (F.col("cents") <= F.col("est_cents")).cast("long")
                ).alias("cnt_le"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )
        out = (
            est.join(s_le, ["event_type", "decile"])
            .join(exact, ["event_type", "decile"])
            .select(
                "event_type",
                "decile",
                "est_cents",
                "k_s",
                "n",
                F.expr("1000000 * s_le div k_s").alias("sample_rank_ppm"),
                F.expr("1000000 * cnt_le div n").alias("exact_rank_ppm"),
                F.expr(
                    "abs(1000000 * cnt_le div n - 1000000 * s_le div k_s)"
                ).alias("err_ppm"),
                F.expr(
                    "case when abs(1000000 * cnt_le div n"
                    "              - 1000000 * s_le div k_s)"
                    "          * abs(1000000 * cnt_le div n"
                    "                - 1000000 * s_le div k_s)"
                    "          * 2 * k_s <= 5298317000000"
                    " then 1 else 0 end"
                ).alias("within_dkw"),
            )
            .orderBy("event_type", "decile")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _hll_merge_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["agg_hll_estimate"]


@query("stream_hll_merge", _hll_merge_oracle())
def stream_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The TWENTY-SECOND mergeable-state streaming family and the fifth
    # IDEMPOTENT one, SAME oracle as agg_hll_estimate: HyperLogLog
    # registers form a JOIN-SEMILATTICE under per-register MAX, so each
    # micro-batch's 64-register relation merges into exactly the
    # whole-stream registers and an at-least-once replay is absorbed
    # (a replayed row can only re-offer a rank already <= the register).
    # The canonical streaming cardinality sketch: CONSTANT state
    # (types x 64 registers) against the bitmap twin's data-dependent
    # words and KMV's per-epoch keying -- merged == direct batch build
    # is the hash match.
    from kcl_akka_stream_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = tbl(spark, sf_dir, "events").select("event_type", "user_id")
    src = tempfile.mkdtemp(prefix="kcl_hll_src_")
    states: list = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            states.extend(
                _collect_state(
                    hll_registers(batch_df, "event_type", "user_id"),
                    "stream_hll_merge",
                    domain_bound=2048,  # types<=32 x m=64 registers
                )
            )

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        st = spark.createDataFrame(
            states, "event_type string, j long, m_r long"
        )
        # merge = per-register MAX over the unioned batch states
        merged = st.groupBy("event_type", "j").agg(
            F.max("m_r").cast("long").alias("m_r")
        )
        est = hll_estimate(merged, "event_type")
        truth = ev.groupBy("event_type").agg(
            F.countDistinct("user_id").cast("long").alias("n_true")
        )
        out = (
            est.join(truth, "event_type")
            .select(
                "event_type",
                "n_registers_set",
                "v_zeros",
                "rmax",
                "s2",
                "method",
                "est_micro",
                "n_true",
                F.expr("abs(est_micro div n_true - 1000000)").alias(
                    "rel_err_ppm"
                ),
                F.expr(
                    "case when abs(est_micro div n_true - 1000000)"
                    " <= 390000 then 1 else 0 end"
                ).alias("within_3sigma"),
            )
            .orderBy("event_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _f2_merge_oracle() -> str:
    from kcl_akka_stream_spark.queries.registry import ORACLES

    return ORACLES["agg_f2_sketch"]


@query("stream_f2_merge", _f2_merge_oracle())
def stream_f2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The TWENTY-THIRD mergeable-state streaming family, SAME oracle as
    # agg_f2_sketch: the AMS signed sums are ADDITIVE (an abelian group,
    # the counts/moments algebra), so per-batch states merge by plain
    # column-wise sum into exactly the whole-stream sketch -- the
    # streaming self-join-size monitor that flags a skewed-key blowup
    # while the stream runs, at types x b=64 int64s of state.  Additive
    # (not idempotent): exactly-once batch semantics, like every other
    # sum-based family.
    from kcl_akka_stream_spark.operators.sketches import (
        f2_estimate,
        f2_sketch_state,
    )

    b = 64
    ev = tbl(spark, sf_dir, "events").select("event_type", "user_id")
    src = tempfile.mkdtemp(prefix="kcl_f2_src_")
    states: list = []
    try:
        _write_epoch_fixture(ev, src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def fold_state(batch_df, epoch_id):
            states.extend(
                _collect_state(
                    f2_sketch_state(batch_df, "event_type", "user_id"),
                    "stream_f2_merge",
                    domain_bound=32,  # types<=32, ONE b-column row each
                )
            )

        q = stream.writeStream.foreachBatch(fold_state).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        schema = "event_type string, " + ", ".join(
            f"x_{r} long" for r in range(b)
        )
        st = spark.createDataFrame(states, schema)
        # merge = column-wise sum (abelian group addition)
        merged = st.groupBy("event_type").agg(
            *[F.sum(f"x_{r}").cast("long").alias(f"x_{r}") for r in range(b)]
        )
        est = f2_estimate(merged, "event_type")
        exact = (
            ev.groupBy("event_type", "user_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("event_type")
            .agg(
                F.sum(F.expr("c * c")).cast("long").alias("f2_exact"),
                F.sum("c").cast("long").alias("n_rows"),
            )
        )
        out = (
            est.join(exact, "event_type")
            .select(
                "event_type",
                "n_rows",
                "f2_exact",
                "est_f2",
                F.expr(
                    "abs(1000000 * est_f2 div f2_exact - 1000000)"
                ).alias("rel_err_ppm"),
                F.expr(
                    "case when abs(1000000 * est_f2 div f2_exact"
                    " - 1000000) <= 530330 then 1 else 0 end"
                ).alias("within_3sigma"),
            )
            .orderBy("event_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
