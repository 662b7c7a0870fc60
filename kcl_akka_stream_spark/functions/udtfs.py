"""Python user-defined TABLE functions (Spark 4 ``@udtf``).

The fourth Python extension seam, next to the Arrow scalar pandas UDF
(functions/pandas_udfs.py), the grouped ``applyInPandas`` kernels, and the
RecordBatch-level ``mapInArrow`` transforms (operators/arrow_ops.py).  The
reference exposes arbitrary user processing stages between source and sink
(SURVEY.md section 2.10, M/KinesisSource.scala usage examples); UDTFs are
Spark's 1->N row expansion form of that seam, reachable from BOTH the
DataFrame API and SQL (``... , LATERAL token_runs(text) r``).

UDTFs evaluate row-at-a-time in the Python worker -- the slow path.  The
operator implemented here is deliberately one whose semantics are genuinely
SEQUENTIAL within a row (run-length encoding over the token stream), so the
per-row Python loop is the natural expression; anything expressible as a
columnar kernel belongs in built-ins or an Arrow batch seam instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="run_idx int, token string, run_len int")
class TokenRuns:
    """Detect runs of ADJACENT repeated whitespace tokens in a document.

    Crawled text commonly contains elongation artifacts ("buy buy buy",
    menu items repeated per page chrome); run-length statistics feed the
    repetition family of quality filters (operators/quality.py measures
    coverage ratios -- this surfaces the runs themselves).

    Emits one row per run of length >= 2.  ``run_idx`` is the 1-based
    index over ALL runs (singletons included), so downstream code can
    reconstruct token positions without re-tokenizing.
    """

    def eval(self, text: str | None):
        if text is None:
            return
        run_idx = 0
        prev: str | None = None
        n = 0
        for tok in text.split():  # \S+ tokenization, same as the oracle
            if tok == prev:
                n += 1
            else:
                if prev is not None and n >= 2:
                    yield run_idx, prev, n
                run_idx += 1
                prev, n = tok, 1
        if prev is not None and n >= 2:
            yield run_idx, prev, n


def register_udtfs(spark: SparkSession) -> None:
    """Register every UDTF under its SQL name (idempotent)."""
    spark.udtf.register("token_runs", TokenRuns)
