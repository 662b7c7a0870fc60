"""Wave-24 evidence pack: hand-checked small cases for the round-10
operators (KS drift, Gini, CUSUM, entropy, MIPS, prefix dedup, charset,
cross-language vocab overlap) -- the contract is always a value computed
by hand, never just a row count."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _ks_ppm(spark, rows):
    # reuse the registered query machinery on injected data via a temp view
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "event_type string, half int, bin long")
    h = df.groupBy("event_type", "half", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = h.filter(F.col("half") == 0).select("event_type", "bin", F.col("c").alias("ca"))
    b = h.filter(F.col("half") == 1).select("event_type", "bin", F.col("c").alias("cb"))
    j = a.join(b, ["event_type", "bin"], "full_outer").select(
        "event_type", "bin",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    wcum = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("event_type")
    cum = j.select(
        "event_type",
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cb").over(wcum).alias("cum_b"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    out = cum.groupBy("event_type").agg(
        F.expr(
            "cast(max(abs(cum_a * nb - cum_b * na)) * 1000000"
            " div (max(na) * max(nb)) as bigint)"
        ).alias("ks_ppm")
    )
    return {r.event_type: r.ks_ppm for r in out.collect()}


def test_ks_statistic_hand_checked(spark):
    # half 0: values {1,1,2,3}; half 1: values {3,4,4,4}
    # CDFs: F0 = [1:.5, 2:.75, 3:1, 4:1]; F1 = [1:0, 2:0, 3:.25, 4:1]
    # KS = max gap = .75 at bin 2 (also .75 at bin 3? F0(3)=1, F1(3)=.25
    # -> .75) -> 750000 ppm
    rows = [("t", 0, 1), ("t", 0, 1), ("t", 0, 2), ("t", 0, 3),
            ("t", 1, 3), ("t", 1, 4), ("t", 1, 4), ("t", 1, 4)]
    assert _ks_ppm(spark, rows) == {"t": 750_000}


def test_ks_identical_distributions_is_zero(spark):
    rows = [("t", h, b) for h in (0, 1) for b in (1, 2, 3)]
    assert _ks_ppm(spark, rows) == {"t": 0}


def test_gini_extremes(spark):
    # equality: every unit the same -> G = 0; total concentration on one
    # of n units -> G = (n-1)/n.
    from pyspark.sql import Window

    def gini_ppm(revs):
        r = spark.createDataFrame(
            [(i, v) for i, v in enumerate(revs)], "l_suppkey long, rev long"
        )
        w = Window.orderBy("rev", "l_suppkey")
        o = r.select(
            "rev",
            F.row_number().over(w).alias("i"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
            F.sum("rev").over(Window.partitionBy()).alias("s"),
        )
        return o.agg(
            F.expr(
                "cast(floor((2.0 * sum(i * rev) - (max(n) + 1.0) * max(s))"
                " * 1000000.0 / (cast(max(n) as double) * max(s))) as bigint)"
            ).alias("g")
        ).collect()[0].g

    assert gini_ppm([100, 100, 100, 100]) == 0
    # n = 5, all mass on one supplier: G = 4/5 = 0.8
    assert gini_ppm([0, 0, 0, 0, 1000]) == 800_000


def test_gini_on_fixture_is_in_range(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    row = QUERIES["agg_gini_concentration"](spark, sf_dir).collect()[0]
    assert 0 <= row.gini_ppm < 1_000_000
    assert row.n_suppliers > 0 and row.total_cents > 0


def test_cusum_peaks_at_step_change(spark):
    # series: ten 0s then ten 10s (deci-units x=0/100): the n-scaled
    # cusum |n*cum - k*S| peaks exactly at the step boundary k=10.
    rows = [("t", i, 0.0) for i in range(1, 11)] + [
        ("t", i, 10.0) for i in range(11, 21)
    ]
    ev = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    ev.createOrReplaceTempView("__cusum_probe")
    from pyspark.sql import Window

    v = ev.select(
        "event_type", "event_id",
        F.expr("cast(floor(value * 10 + 0.5) as bigint)").alias("x"),
    )
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("event_id")
    t = v.select(
        "event_type", "event_id",
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("x").over(wt).alias("s"),
        F.row_number().over(wo).alias("k"),
        F.sum("x").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cx"),
    )
    c = t.select(
        "event_id",
        (F.col("n") * F.col("cx") - F.col("k") * F.col("s")).alias("cusum"),
    )
    peak = c.orderBy(F.abs("cusum").desc(), "event_id").first()
    assert peak.event_id == 10
    # |20*0 - 10*1000| = 10000
    assert abs(peak.cusum) == 10_000


def test_entropy_uniform_and_point_mass(spark):
    from pyspark.sql import Window

    def entropy(counts):
        h = spark.createDataFrame(
            [("t", i, c) for i, c in enumerate(counts)],
            "event_type string, hr long, c long",
        )
        t = h.withColumn("n", F.sum("c").over(Window.partitionBy("event_type")))
        return t.groupBy("event_type").agg(
            F.expr(
                "cast(sum(c * cast(round(ln(cast(n as double) / c) * 1000000)"
                " as bigint)) div max(n) as bigint)"
            ).alias("e")
        ).collect()[0].e

    # uniform over 4 bins: H = ln(4)
    assert abs(entropy([5, 5, 5, 5]) - round(math.log(4) * 1e6)) <= 2
    # point mass: H = 0
    assert entropy([20]) == 0


def test_mips_diverges_from_cosine(spark):
    # a long mediocre vector must beat a short well-aligned one on inner
    # product while cosine ranks them the other way round.
    from kcl_akka_stream_spark.operators.similarity import (
        brute_force_topk,
        mips_topk,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),          # the query
            (2, [0.9, 0.1]),          # short, well aligned
            (3, [10.0, 8.0]),         # long, less aligned
        ],
        "vec_id long, embedding array<double>",
    )
    q = corpus.filter(F.col("vec_id") == 1)
    mips_best = mips_topk(corpus, q, k=1).collect()[0]
    cos_best = brute_force_topk(corpus, q, k=1).collect()[0]
    assert mips_best.n_id == 3 and mips_best.ip == 10.0
    assert cos_best.n_id == 2


def test_prefix_digest_counts_full_variants(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps"),
            Row(doc_id=2, text="the quick brown fox sleeps"),  # same 16-prefix
            Row(doc_id=3, text="the quick brown fox jumps"),   # exact dup of 1
            Row(doc_id=4, text="completely different"),
        ]
    )
    out = (
        docs.groupBy(
            F.md5(F.lower(F.substring("text", 1, 16))).alias("prefix_digest")
        )
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct(F.md5("text")).alias("n_distinct_full"),
        )
        .filter(F.col("n_copies") > 1)
        .collect()
    )
    assert len(out) == 1
    r = out[0]
    assert (r.keeper_id, r.n_copies, r.n_distinct_full) == (1, 3, 2)


def test_charset_ppm_sums_to_million(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    for r in QUERIES["text_charset_profile"](spark, sf_dir).collect():
        total = r.lower_ppm + r.upper_ppm + r.digit_ppm + r.space_ppm + r.other_ppm
        # each share floors independently: sum in (1e6 - 5, 1e6]
        assert 1_000_000 - 5 < total <= 1_000_000
        assert r.n_chars > 0


def test_charset_multibyte_counts_characters_both_engines(spark):
    # ADVICE r10: the oracle used strlen (BYTES) while Spark used
    # F.length (CHARACTERS) -- agreeing only on ASCII.  Pin the
    # multibyte case: both engines must count CHARACTERS, so the
    # 2-char string 'aé' has n=2 on both sides, not 2-vs-3.
    import duckdb

    import pyspark.sql.functions as F

    s = "aéü z9"  # a, e-acute, u-umlaut, space, z, 9 = 6 chars / 8 bytes
    spark_n = (
        spark.createDataFrame([(s,)], "text string")
        .select(F.length("text").cast("long").alias("n"))
        .collect()[0].n
    )
    duck_n = duckdb.sql(f"SELECT length('{s}') AS n").fetchone()[0]
    duck_bytes = duckdb.sql(f"SELECT strlen('{s}') AS n").fetchone()[0]
    assert spark_n == duck_n == 6
    assert duck_bytes == 8  # the old oracle's unit -- proves the trap is real
    # and the class-strip difference counts characters symmetrically too
    spark_lower = (
        spark.createDataFrame([(s,)], "text string")
        .select(
            (F.length("text") - F.length(F.regexp_replace("text", "[a-z]", "")))
            .cast("long").alias("n")
        )
        .collect()[0].n
    )
    duck_lower = duckdb.sql(
        f"SELECT length('{s}') - length(regexp_replace('{s}', '[a-z]', '', 'g')) AS n"
    ).fetchone()[0]
    assert spark_lower == duck_lower == 2  # 'a', 'z' (accented chars are not [a-z])


def test_lang_vocab_jaccard_bounds_and_pairing(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["text_lang_vocab_jaccard"](spark, sf_dir).collect()
    assert rows, "fixture has 5 languages -> 10 pairs expected"
    for r in rows:
        assert r.lang_a < r.lang_b
        assert 0 <= r.n_common <= min(r.n_vocab_a, r.n_vocab_b)
        assert 0 <= r.jaccard_ppm <= 1_000_000


def test_lsh_recall_contract_and_try_funcs(spark, sf_dir):
    # wave 27: the LSH recall report is k-consistent and the TRY family
    # really quarantines instead of raising.
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["sim_lsh_recall_report"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_exact == 5 and 0 <= r.n_hits <= 5
        assert r.recall_pct == r.n_hits * 100 // 5
    t = QUERIES["scalar_try_funcs"](spark, sf_dir)
    out = t.collect()  # would raise without TRY on dirty rows
    assert any(r.safe_div is None for r in out)  # event_id % 5 == 0 rows
    assert all(r.not_a_number is None for r in out)  # letters never cast
