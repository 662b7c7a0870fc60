"""Gopher/C4-style document quality filters and repetition statistics.

Beyond-reference extension (no counterpart in /root/reference).
Large-scale training-data-pipeline surface (BASELINE.json north star):
the classic pretraining-corpus quality gate — per-document structural
metrics (word count, mean word length, alphabetic-word fraction) plus
the repetition family (top-bigram coverage, duplicate-trigram fraction)
from the Gopher rules (Rae et al. 2021, arXiv:2112.11446 §A1.1) and the
C4 heuristics (Raffel et al. 2020).

Scale shape: the structural metrics are pure column expressions — map
only, zero shuffle, whole-stage codegen.  The repetition metrics need a
per-document n-gram mode/distinct, done as explode → two map-side
combinable aggregations keyed by (doc_id, gram) then doc_id — shuffle
volume is O(corpus tokens), the standard shape, never quadratic.  All
arithmetic is float64 + round so the DuckDB oracle matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kcl_akka_stream_spark.operators import text as X

#: Gopher-style acceptance thresholds, tuned so the fixture corpus
#: genuinely splits (both pass and fail occur at every SF).
MIN_WORDS = 30
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_FRAC = 0.5
MAX_TOP_BIGRAM_FRAC = 0.15
MAX_DUP_TRIGRAM_FRAC = 0.05


def _grams(toks: Column, n: int) -> Column:
    """Overlapping word n-grams of a token array (empty below n tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def structural_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Map-only structural metrics: word count, mean word length,
    alphabetic-word fraction.  Zero shuffle."""
    toks = X.tokens(F.col(text_col))
    n_words = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(
            total_len.cast("double") / F.greatest(n_words, F.lit(1)), 4
        ).alias("mean_word_len"),
        F.round(
            n_alpha.cast("double") / F.greatest(n_words, F.lit(1)), 6
        ).alias("frac_alpha_words"),
    )


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition stats (Gopher §A1.1):

    - ``top_bigram_frac`` — fraction of tokens covered by the single most
      frequent bigram (2 × its count / word count, capped at 1);
    - ``dup_trigram_frac`` — fraction of trigram occurrences that are
      repeats of an earlier trigram in the same document.

    Explode + two-stage agg keyed by (doc_id, gram) → doc_id; both stages
    combine map-side, so shuffle rows ≈ distinct grams per doc."""
    from kcl_akka_stream_spark.plans.hygiene import spread

    # spread(): the gram slicing is an interpreted higher-order function;
    # on a single-partition small-file read it would serialize.
    toks = spread(df.select("doc_id", text_col)).select(
        "doc_id",
        F.size(X.tokens(F.col(text_col))).alias("n_words"),
        _grams(X.tokens(F.col(text_col)), 2).alias("bg"),
        _grams(X.tokens(F.col(text_col)), 3).alias("tg"),
    )
    bg = (
        toks.select("doc_id", "n_words", F.explode("bg").alias("g"))
        .groupBy("doc_id", "n_words", "g")
        .count()
        .groupBy("doc_id", "n_words")
        .agg(F.max("count").alias("top_cnt"))
    )
    tg = (
        toks.select("doc_id", F.explode("tg").alias("g"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tg"),
            F.countDistinct("g").alias("n_tg_distinct"),
        )
    )
    # Left joins: a short doc may have no bigrams/trigrams at all.
    base = df.select("doc_id")
    return (
        base.join(bg, "doc_id", "left")
        .join(tg, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(2.0)
                    * F.coalesce(F.col("top_cnt"), F.lit(0)).cast("double")
                    / F.greatest(F.coalesce(F.col("n_words"), F.lit(0)), F.lit(1)),
                ),
                6,
            ).alias("top_bigram_frac"),
            F.round(
                (
                    F.coalesce(F.col("n_tg"), F.lit(0))
                    - F.coalesce(F.col("n_tg_distinct"), F.lit(0))
                ).cast("double")
                / F.greatest(F.coalesce(F.col("n_tg"), F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_trigram_frac"),
        )
    )


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full quality gate: structural + repetition metrics and the
    accept/reject flag (int 0/1 for cross-engine hash stability)."""
    m = structural_metrics(df, text_col).join(
        repetition_metrics(df, text_col), "doc_id"
    )
    passed = (
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS)
        & (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN)
        & (F.col("frac_alpha_words") >= MIN_ALPHA_FRAC)
        & (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM_FRAC)
        & (F.col("dup_trigram_frac") <= MAX_DUP_TRIGRAM_FRAC)
    )
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "frac_alpha_words",
        "top_bigram_frac",
        "dup_trigram_frac",
        passed.cast("int").alias("gopher_pass"),
    )
