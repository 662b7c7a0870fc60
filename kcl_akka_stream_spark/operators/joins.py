"""Joins (SURVEY §2.6).

Absent in the reference (its only set-combinations are merges + test-set
algebra) but required by the fixture star schema and any real consumer of the
stream.  Everything below is Spark built-ins with explicit scale posture:

- small dims (region, nation, any sub-64MB side) are broadcast -- no shuffle;
- fact-fact joins shuffle on the join key; AQE handles skew;
- range joins bucketize the range key first so Catalyst gets an equi-join on
  the bucket instead of a broadcast-nested-loop over the full cross product;
- as-of joins are a union + window (no Python, no per-key pandas) -- the
  classic scalable formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def equi_join(left: DataFrame, right: DataFrame, on, how: str = "inner", *, broadcast_right: bool = False) -> DataFrame:
    right_side = F.broadcast(right) if broadcast_right else right
    return left.join(right_side, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_anti")


def range_join_bucketed(
    facts: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Range join fact.value in [bucket.lo, bucket.hi) via bucketization.

    Each fact row maps to one coarse bucket id; the bucket dim explodes each
    [lo, hi) interval into the coarse ids it overlaps.  The join is then an
    equi-join on the coarse id + residual filter -- broadcastable when the dim
    is small and shuffle-hash otherwise, never a nested loop.
    """
    coarse = F.floor(F.col(value_col) / F.lit(bucket_width))
    exploded = buckets.withColumn(
        "__coarse",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)),
                F.floor((F.col(hi_col) - F.lit(1e-9)) / F.lit(bucket_width)),
            )
        ),
    )
    joined = facts.withColumn("__coarse", coarse).join(
        F.broadcast(exploded), on="__coarse", how="inner"
    )
    return joined.filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))).drop("__coarse")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts for the same key.

    Union-and-window formulation: tag both sides, sort per key by time, carry
    the last seen right value forward with ``last(..., ignorenulls)``.  One
    shuffle on the key, no Python -- scales to arbitrarily large sides (vs a
    per-key merge_asof in pandas which would OOM a hot key).
    """
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(key_col).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
    )
    tagged_right = right.select(
        F.col(key_col).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(tagged_left.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    # Right rows sort before left rows at equal timestamps => "<=" semantics.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = tagged_left.unionByName(tagged_right)
    carried = unioned.select(
        "__is_left",
        "__l",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}") for c in right_value_cols],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        "__l.*", *[F.col(f"__r_{c}").alias(c) for c in right_value_cols]
    )
    return out
