from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query; `oracle` is the DuckDB-ANSI-SQL equivalent
    (omit only for genuinely non-SQL-expressible operators -- the driver then
    records a weaker rows-only check)."""

    def deco(fn):
        # Duplicate registration is ALWAYS a bug: the dict write would
        # silently keep whichever module imported last, and the driver's
        # gate would green-light the survivor while the shadowed query
        # (and its oracle) vanish without a trace -- caught live in r15
        # when a new agg_benford_deviation collided with the wave-25 one.
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} is already "
                f"registered by {QUERIES[name].__module__}."
                f"{QUERIES[name].__qualname__}"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from kcl_akka_stream_spark.sources.batch import load_table

    return load_table(spark, sf_dir, name)
