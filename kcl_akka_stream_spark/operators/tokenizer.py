"""Distributed byte-pair-encoding (BPE) training primitives.

Tokenizer training (Sennrich et al. 2016, public) iterates: count adjacent
symbol-pair frequencies over the corpus, merge the most frequent pair,
repeat.  At 100 TB the pair COUNT is the distributed-heavy step -- a
combinable explode->count aggregation here; the argmax pair is a TakeOrdered
head, and applying a merge is map-only.  This module provides both steps;
the driver loop (run count -> merge N times) composes them.

The merge apply is genuinely sequential within a token stream (greedy
leftmost-first, non-overlapping: ``a a a`` under pair (a,a) merges
positions 0-1, leaving the third ``a`` alone), so it runs as an Arrow
kernel over ``mapInPandas`` -- property-tested against a pure-python
replication rather than SQL (no relational form exists).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kcl_akka_stream_spark.operators.text import tokens
from kcl_akka_stream_spark.plans.hygiene import spread


def pair_counts(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Top-k adjacent token pairs by corpus frequency (ties on the pair).

    The BPE statistics step: zip each token array with its own tail
    (zip_with over two slices -- one pass, no posexplode self-join),
    explode, count.  One combinable shuffle + TakeOrdered head.
    """
    # token array bound once (optimization r15: the inline
    # zip_with(slice, slice) form paid the tokenizer regexp 4x per row
    # -- see operators/text.py::bind_once)
    from kcl_akka_stream_spark.operators.text import bind_once

    pairs = bind_once(
        tokens(F.col(text_col)),
        lambda t: F.zip_with(
            F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    # spread(): the pair explode must not serialize onto a 1-partition
    # scan (VERDICT r9 #5 tripwire)
    return (
        spread(df).select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(k)
    )


def merge_pair_python(toks: list[str], left: str, right: str) -> list[str]:
    """Reference greedy merge: leftmost-first, non-overlapping."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
            out.append(left + "_" + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def bpe_merge_step(
    df: DataFrame, left: str, right: str, text_col: str = "text"
) -> DataFrame:
    """Apply ONE BPE merge (left, right) -> "left_right" to every document.

    Emits (doc_id, merged) where merged is the post-merge token array.
    Map-only (0 exchanges): the greedy scan runs per document inside an
    Arrow batch kernel; no state crosses documents.
    """
    tok_df = df.select("doc_id", tokens(F.col(text_col)).alias("toks"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            merged = [
                merge_pair_python(list(ts), left, right) for ts in pdf["toks"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "merged": merged})

    return spread(tok_df).mapInPandas(kernel, "doc_id long, merged array<string>")
