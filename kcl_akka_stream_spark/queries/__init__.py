"""Query library: every entry is a named (Spark callable, DuckDB oracle SQL)
pair consumed by __spark_entry__.py -- the driver runs both at sf0.01 and
hash-compares results (row count + schema + order-insensitive value hash).

Conventions that make cross-engine hashing exact:
- every computed column is aliased identically in Spark and SQL;
- money/double sums aggregate in DECIMAL(18,2) then cast to double (exact in
  both engines regardless of partial-agg order);
- ratio/cosine outputs are single IEEE ops or rounded to 6 dp;
- timestamps leave as formatted strings; arrays leave as joined strings;
- every top-k has a unique tiebreaker.
"""

from kcl_akka_stream_spark.queries.registry import ORACLES, QUERIES

# Importing the modules populates the registries.
from kcl_akka_stream_spark.queries import core  # noqa: E402,F401
from kcl_akka_stream_spark.queries import reference_ops  # noqa: E402,F401
from kcl_akka_stream_spark.queries import pipeline  # noqa: E402,F401
from kcl_akka_stream_spark.queries import streaming_q  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES"]
