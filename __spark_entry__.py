"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   -- flagship query (TPC-H Q1-style pricing summary) at sf0.001.
- ``queries()``      -- every implemented operator from SURVEY §2 + the
                        training-data-pipeline surface, one named callable each.
- ``oracle_sql()``   -- matching DuckDB SQL for the sf0.01 correctness gate.

Implementation lives in ``kcl_akka_stream_spark/``; this module only adapts it
to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kcl_akka_stream_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
