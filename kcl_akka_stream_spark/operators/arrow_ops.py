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


def lang_stats_arrow(
    df: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-group corpus stats via ``groupBy().applyInArrow`` -- the grouped
    twin of mapInArrow: each key's rows arrive as ONE zero-copy
    ``pyarrow.Table`` (no pandas boxing) and C++ kernels reduce it.  The
    per-key output is one row, so this is the Arrow-native UDAF shape for
    reductions pyarrow.compute can express.

    Scale: one shuffle keyed by ``lang_col``; like every grouped Python
    eval, a whole group must fit one task -- fine for bounded key
    cardinality stats, wrong for per-document keys (use mapInArrow there).
    """

    def agg(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = table.column(text_col)
        return pa.table(
            {
                lang_col: [table.column(lang_col)[0].as_py()],
                "n_docs": pa.array([table.num_rows], pa.int64()),
                "total_chars": pa.array(
                    [pc.sum(pc.utf8_length(t)).as_py() or 0], pa.int64()
                ),
                "max_tokens": pa.array(
                    [pc.max(pc.count_substring_regex(t, r"\S+")).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    return (
        df.select(lang_col, text_col)
        .groupBy(lang_col)
        .applyInArrow(
            agg, f"{lang_col} string, n_docs long, total_chars long, max_tokens long"
        )
    )
