"""Change-data-capture shaping operators: SCD2 history compaction.

Reference parity: the reference engine (StreetContxt/kcl-akka-stream)
exposes per-shard ordered record streams (src/main/scala/com/streetcontxt
/kcl/RecordSource.scala) whose canonical consumer is exactly this shape --
an ordered change feed folded into current/historical state.  The batch
relational form here is the warehouse-side twin of the streaming CDC
upsert (queries/streaming_q.py::stream_cdc_upsert).

Scale notes: everything is ONE window spec per step, all keyed on the
entity key -- consecutive windows ride the same hash partitioning, so the
whole compaction costs a single exchange of (key, ts, attr) projections.
No self-joins, no data-sized sorts outside the per-key window sort that
any SCD2 build fundamentally requires (and which Spark spills gracefully
per partition at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def scd2_compact(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Fold an ordered change feed into SCD2 (slowly-changing-dimension
    type 2) validity ranges: one row per (key, state RUN), carrying
    ``version`` (1-based change ordinal), ``valid_from`` / ``valid_to``
    (half-open, ``valid_to`` NULL on the current row) and ``is_current``.

    Consecutive records with an UNCHANGED attribute extend the open
    version instead of opening a new one (the compaction that makes SCD2
    storage proportional to changes, not observations).  Deterministic
    cross-engine: the per-key order is (ts, tiebreak), so equal
    timestamps cannot flip runs between engines.

    Plan: two stacked windows on the same (key) partitioning -- change
    detection via lag(), then range closure via lead() over the change
    rows only -- one exchange total, partial projection pushed to the
    scan.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        df.select(key_col, ts_col, tiebreak_col, attr_col)
        .withColumn("__prev", F.lag(attr_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
        .drop("__prev")
    )
    return changes.select(
        F.col(key_col),
        F.col(attr_col).alias("state"),
        F.row_number().over(w).cast("long").alias("version"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().cast("int").alias("is_current"),
    )
