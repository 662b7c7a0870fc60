"""Window functions & ordering (SURVEY §2.7, W1-W4).

W1 (per-shard total order by sequence number) is the reference's core
invariant (KinesisRecord.scala:39-44, README.md:100-102); everything here is
``Window.partitionBy(shard).orderBy(seq)`` -- one shuffle on the shard key,
then sorted within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shard_order(df: DataFrame, shard_col: str, seq_col: str) -> DataFrame:
    """W1 -- per-shard arrival index + previous-seq (gap detection via lag)."""
    w = Window.partitionBy(shard_col).orderBy(seq_col)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("prev_seq", F.lag(seq_col).over(w))
        .withColumn("gap", F.col(seq_col) - F.coalesce(F.col("prev_seq"), F.col(seq_col)))
    )


def top_k_per_group(df: DataFrame, group_col: str, order_cols: list, k: int) -> DataFrame:
    """Top-K per group -- rank within each group and keep k.  Deterministic
    only if order_cols contain a unique tiebreaker."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return df.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def limit_n(df: DataFrame, n: int, order_cols: list | None = None) -> DataFrame:
    """W3 -- ``take(n)`` (IT/KinesisSourceTest.scala:55).  With order columns
    this is a global top-n: Spark plans TakeOrderedAndProject -- per-partition
    heaps + single merge, no global sort."""
    if order_cols:
        return df.orderBy(*order_cols).limit(n)
    return df.limit(n)


def sessionize(df: DataFrame, key_col: str, ts_col: str, gap_seconds: int) -> DataFrame:
    """Batch sessionization: new session when the per-key gap exceeds the
    threshold; session id = running count of session-starts.  Gap compares
    at MICROSECOND precision, matching streaming session_window -- a
    truncated-seconds compare flips sessions whose gap sits within 1 s of
    the threshold.  (Streaming form: streaming/pipeline.py.)"""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn("__new_session", is_new).withColumn(
        "session_id",
        F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new_session")


def top_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    type_col: str,
    depth: int = 3,
    k: int = 10,
    sep: str = ">",
) -> DataFrame:
    """Top-k length-``depth`` transition paths (sequential pattern
    mining's frequent-path core): per key, order events by (ts,
    tiebreak), slide a ``depth``-wide window via stacked lead()s, and
    count each observed path string corpus-wide.

    Scale shape: the lead()s all ride ONE key-partitioned window sort;
    the path count is a combinable groupBy on the path string; the final
    top-k is TakeOrderedAndProject (per-partition heads + k-sized driver
    merge), never a global sort.  Path strings with (path, count
    DESC)-deterministic tiebreak hash identically cross-engine.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, depth)
    ]
    paths = (
        df.select(F.concat_ws(sep, *steps).alias("path"), steps[-1].alias("__last"))
        .filter(F.col("__last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    )
    return paths.orderBy(F.col("n_paths").desc(), "path").limit(k)


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    cents_col: str,
    order_col: str,
) -> DataFrame:
    """Exact time-weighted average per key (the timeseries/feature-store
    TWA: each observation's value holds until the next observation --
    last-observation-carried-forward weighting).

    Integer discipline end-to-end: durations are ``unix_micros`` deltas
    (timezone-interpretation cancels in the subtraction; microsecond
    exact), values arrive as integer cents, and the weighted numerator
    ``sum(cents * dur_us)`` is an order-independent int64 sum, so the
    result hashes identically cross-engine and across partitionings.
    Keys with a zero observation span (single event, or all events
    simultaneous) return NULL rather than a divide-by-zero.

    Scale shape: ONE exchange on the key carries both the lead() window
    and the final agg (the agg rides the window's partitioning); no
    self-join, no Python.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(order_col))
    stepped = df.select(
        key_col,
        F.col(cents_col).alias("__c"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        F.lead(F.unix_micros(F.col(ts_col))).over(w).alias("__next_us"),
    )
    segs = stepped.withColumn("__dur", F.col("__next_us") - F.col("__us"))
    return segs.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("__dur").cast("long").alias("span_us"),
        F.when(
            F.sum("__dur") > 0,
            F.expr("sum(__c * __dur) div sum(__dur)"),
        )
        .cast("long")
        .alias("twa_cents"),
    )


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    n_buckets: int = 32,
    rn_col: str = "rn",
    cum_col: str = "cum",
) -> DataFrame:
    """Two-pass distributed global rank + running sum (VERDICT r14 #2,
    factored out of text_heaps_law for reuse): the linear replacement
    for ``Window.orderBy(order_col)`` over a data-sized relation, which
    Spark executes as a single-task global sort.

    Pass 1 buckets rows by deterministic value ranges of ``order_col``
    (divide-first width so ``(v - lo) * P`` never overflows) and ranks /
    sums WITHIN each bucket -- parallel, each bucket ~n/P rows.  Pass 2
    prefix-sums the <= P+1 bucket totals and broadcasts them back as
    offsets.  Output = input columns plus ``rn_col`` (1-based global
    rank by ``order_col``) and ``cum_col`` (inclusive running sum of
    ``value_col``) -- exactly what the unpartitioned window would have
    produced, with no global sort anywhere.

    ``order_col`` must be a unique integer key (ties would make the
    global rank nondeterministic in ANY implementation)."""
    bounds = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    )
    bw = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__bkt",
        F.expr(
            f"({order_col} - lo) div (((hi - lo) div {n_buckets}) + 1)"
        ),
    ).drop("lo", "hi")
    wloc = Window.partitionBy("__bkt").orderBy(order_col)
    loc = bw.withColumn("__lrn", F.row_number().over(wloc)).withColumn(
        "__lcum",
        F.sum(value_col)
        .over(wloc.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    ).localCheckpoint(eager=True)  # feeds bucket totals AND offset join
    tot = loc.groupBy("__bkt").agg(
        F.max("__lrn").cast("long").alias("__bn"),
        F.max("__lcum").cast("long").alias("__bt"),
    )
    wb = Window.orderBy("__bkt")  # bounded relation: <= n_buckets + 1 rows
    off = tot.select(
        "__bkt",
        (
            F.sum("__bn").over(wb.rowsBetween(Window.unboundedPreceding, 0))
            - F.col("__bn")
        )
        .cast("long")
        .alias("__rn_off"),
        (
            F.sum("__bt").over(wb.rowsBetween(Window.unboundedPreceding, 0))
            - F.col("__bt")
        )
        .cast("long")
        .alias("__tok_off"),
    )
    return (
        loc.join(F.broadcast(off), "__bkt")
        .withColumn(rn_col, F.col("__lrn") + F.col("__rn_off"))
        .withColumn(cum_col, F.col("__lcum") + F.col("__tok_off"))
        .drop("__bkt", "__lrn", "__lcum", "__rn_off", "__tok_off")
    )
