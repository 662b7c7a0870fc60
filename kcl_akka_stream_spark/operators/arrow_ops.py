"""RecordBatch-level transforms via ``DataFrame.mapInArrow``.

``mapInArrow`` hands each partition to Python as raw pyarrow RecordBatches
with NO pandas conversion -- the third Arrow seam next to the scalar pandas
UDF (boxes into pandas Series) and the grouped ``applyInPandas`` kernels
(boxes into DataFrames).  For work that is itself a columnar kernel
(pyarrow.compute), this skips the boxing entirely: zero-copy in, zero-copy
out.  The reference's equivalent extension point is the arbitrary
user-processing stage between source and sink (SURVEY.md section 2.10).

Scale posture: map-only (0 exchanges), batch-at-a-time, and the pyarrow
kernels are C++ vectorized -- the same executor profile as a JVM
whole-stage-codegen projection, plus one Arrow IPC hop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from kcl_akka_stream_spark.plans.hygiene import spread


def doc_stats_arrow(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document size stats computed by pyarrow compute kernels.

    Emits (id, n_chars, n_bytes, n_tokens): codepoint length, encoded
    byte length, and \\S+ token count.  All three are single C++ kernel
    calls per batch -- the canonical mapInArrow use case.
    """

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for b in batches:
            t = b.column(text_col)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(id_col),
                    pc.cast(pc.utf8_length(t), pa.int32()),
                    pc.cast(pc.binary_length(t), pa.int32()),
                    pc.cast(pc.count_substring_regex(t, r"\S+"), pa.int32()),
                ],
                [id_col, "n_chars", "n_bytes", "n_tokens"],
            )

    return spread(df.select(id_col, text_col)).mapInArrow(
        gen, f"{id_col} long, n_chars int, n_bytes int, n_tokens int"
    )
