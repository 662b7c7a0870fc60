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


def test_pps_systematic_exact_k_and_multiplicity(spark, sf_dir):
    # green: the grid has exactly k=100 points, so total picks == 100
    # and every pick multiplicity is >= 1; red: a document carrying
    # most of the corpus weight MUST be picked with multiplicity ~ its
    # weight share (the PPS property a uniform sampler fails)
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries import pipeline as P

    rows = QUERIES["sample_pps_systematic"](spark, sf_dir).collect()
    assert sum(r.picks for r in rows) == 100
    assert all(r.picks >= 1 for r in rows)
    # cumulative interval containment: c_hi is non-decreasing in doc_id
    chs = [r.c_hi for r in rows]
    assert chs == sorted(chs)

    giant = " ".join(f"t{i % 7}" for i in range(450))
    fake = spark.createDataFrame(
        [(i, "a b c d e", "aa") for i in range(10)] + [(99, giant, "aa")],
        "doc_id long, text string, lang string",
    )
    orig = P.tbl
    try:
        P.tbl = lambda _s, _d, _n: fake
        out = {r.doc_id: r.picks for r in P.sample_pps_systematic(spark, "x").collect()}
    finally:
        P.tbl = orig
    assert sum(out.values()) == 100
    assert out[99] >= 80  # 450/500 of the weight -> ~90 of 100 picks


def test_cusum_prefix_min_equals_recurrence(spark):
    # The linearization identity: S_i = P_i - min(0, min_{j<=i} P_j)
    # must equal the sequential recurrence max(0, S_{i-1} + x_i) -- and
    # a step change must alarm while a flat series must not.
    import datetime

    from kcl_akka_stream_spark.queries import core as C

    def series(counts):
        rows = []
        t0 = datetime.datetime(2024, 1, 1)
        eid = 0
        for h, n in enumerate(counts):
            for _ in range(n):
                rows.append(
                    ("t", eid, t0 + datetime.timedelta(hours=h, minutes=1), 1.0)
                )
                eid += 1
        return rows

    flat = series([10] * 12)
    step = series([10] * 6 + [25] * 6)
    fake = (
        lambda rows: lambda _s, _d, _n: spark.createDataFrame(
            rows, "event_type string, event_id long, ts timestamp, value double"
        )
    )
    orig = C.tbl
    try:
        C.tbl = fake(flat)
        r_flat = C.w_cusum_drift(spark, "x").collect()[0]
        C.tbl = fake(step)
        r_step = C.w_cusum_drift(spark, "x").collect()[0]
    finally:
        C.tbl = orig
    assert r_flat.n_alarm_hours == 0 and r_flat.peak_cusum == 0
    assert r_step.n_alarm_hours > 0 and r_step.first_alarm != ""
    # python replica of the recurrence on the step series (mu=17, k=1)
    mu = (10 * 6 + 25 * 6) // 12
    slack = mu // 10
    s = 0
    peak = 0
    alarms = 0
    for n in [10] * 6 + [25] * 6:
        s = max(0, s + (n - mu - slack))
        peak = max(peak, s)
        alarms += 1 if s > mu else 0
    assert r_step.peak_cusum == peak and r_step.n_alarm_hours == alarms


def test_mattr_degenerate_and_uniform(spark):
    from kcl_akka_stream_spark.queries import pipeline as P

    uni = " ".join("x" for _ in range(40))           # 1 type / 20-window
    div = " ".join(f"w{i}" for i in range(40))       # all distinct
    fake = spark.createDataFrame(
        [(1, uni, "aa"), (2, div, "aa")],
        "doc_id long, text string, lang string",
    )
    orig = P.tbl
    try:
        P.tbl = lambda _s, _d, _n: fake
        r = P.text_mattr(spark, "x").collect()[0]
    finally:
        P.tbl = orig
    # window TTRs: 1/20 = 50000 ppm vs 20/20 = 1000000 ppm
    assert r.min_mattr_ppm == 50000
    assert r.avg_mattr_ppm == (50000 + 1000000) // 2
    assert r.low_diversity_docs == 1


def test_effective_rank_collapse_red(spark):
    # green: orthogonal one-hots spread variance across all dims -> PR
    # near n_dims; red: collinear cloud -> PR collapses toward 1
    from kcl_akka_stream_spark.queries import pipeline as P

    ortho = [
        (i, [1.0 if d == i % 4 else 0.0 for d in range(4)])
        for i in range(16)
    ]
    coll = [(i, [float(i), 2.0 * i, 0.0, 0.0]) for i in range(16)]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "vec_id long, embedding array<double>"
    )
    orig = P.tbl
    try:
        P.tbl = lambda _s, _d, _n: mk(ortho)
        r_o = P.emb_effective_rank(spark, "x").collect()[0]
        P.tbl = lambda _s, _d, _n: mk(coll)
        r_c = P.emb_effective_rank(spark, "x").collect()[0]
    finally:
        P.tbl = orig
    assert r_o.n_dims == 4
    assert r_o.pr_milli >= 3000  # isotropic-ish: close to 4.000
    assert r_c.pr_milli <= 1300  # rank-1 cloud: close to 1.000


def test_wilcoxon_symmetric_and_shifted(spark):
    # engineered: symmetric diffs -> W+ == W- and effect 0; a uniform
    # upward shift -> all rank mass positive (effect = +1e6)
    import datetime

    from kcl_akka_stream_spark.queries import core as C

    def day(d, am, pm, eid0):
        t0 = datetime.datetime(2024, 1, 1 + d)
        rows = []
        for i in range(am):
            rows.append(("t", eid0 + i, t0 + datetime.timedelta(hours=9), 1.0))
        for i in range(pm):
            rows.append(
                ("t", eid0 + 1000 + i, t0 + datetime.timedelta(hours=15), 1.0)
            )
        return rows

    # diffs: +1, -1, +2, -2 -> symmetric
    sym = (
        day(0, 5, 6, 0) + day(1, 6, 5, 2000)
        + day(2, 5, 7, 4000) + day(3, 7, 5, 6000)
    )
    # diffs: +1, +2, +3 -> all positive
    up = day(0, 5, 6, 0) + day(1, 5, 7, 2000) + day(2, 5, 8, 4000)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_type string, event_id long, ts timestamp, value double"
    )
    orig = C.tbl
    try:
        C.tbl = lambda _s, _d, _n: mk(sym)
        r_sym = C.agg_wilcoxon_signed_rank(spark, "x").collect()[0]
        C.tbl = lambda _s, _d, _n: mk(up)
        r_up = C.agg_wilcoxon_signed_rank(spark, "x").collect()[0]
    finally:
        C.tbl = orig
    assert r_sym.w_plus_x2 == r_sym.w_minus_x2
    assert r_sym.effect_ppm == 0
    assert r_up.w_minus_x2 == 0
    # doubled W+ over n(n+1) == 2 * (n(n+1)/2) / (n(n+1)) = exactly 1e6
    assert r_up.effect_ppm == 1000000
    # midrank identity: W+ + W- == n(n+1) (doubled scale)
    for r in (r_sym, r_up):
        assert r.w_plus_x2 + r.w_minus_x2 == r.n_pairs * (r.n_pairs + 1)


def test_gif_parser_le_and_corruption(spark, sf_dir):
    # the census must recover the residue-class fixture exactly: LE dims
    # (a BE read would garble every width > 255), GCT census, corrupt
    # count == every-19th docs
    from kcl_akka_stream_spark.operators.multimodal import parse_gif_header
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries.pipeline import _gif_media
    from kcl_akka_stream_spark.queries.registry import tbl as _tbl

    docs = _tbl(spark, sf_dir, "documents")
    n_docs = docs.count()
    rows = QUERIES["multimodal_gif_header"](spark, sf_dir).collect()
    n_bad = sum(r.n_bad for r in rows)
    assert n_bad == sum(1 for i in range(n_docs) if i % 19 == 0)
    assert sum(r.n_files for r in rows) == n_docs
    # direct parse of one known doc: doc_id=1 -> GIF87a, w=108, h=72,
    # packed=129 -> GCT of 4 entries
    one = parse_gif_header(
        _gif_media(docs.filter("doc_id = 1"))
    ).collect()[0]
    assert (one.version, one.width, one.height) == ("87a", 108, 72)
    assert (one.gct_flag, one.gct_entries) == (1, 4)
    # engineered red: a BE read of width would give 108*256 = 27648 --
    # assert the LE value is what the parser returns (not the swap)
    assert one.width != 27648


def test_runs_test_alternating_and_clumped(spark):
    # engineered: perfectly alternating signs -> runs == n (ratio >>
    # 1e6); perfectly clumped (all aboves then all belows) -> 2 runs
    import datetime

    from kcl_akka_stream_spark.queries import core as C

    def series(counts):
        rows = []
        t0 = datetime.datetime(2024, 1, 1)
        eid = 0
        for h, n in enumerate(counts):
            for _ in range(n):
                rows.append(
                    ("t", eid, t0 + datetime.timedelta(hours=h), 1.0)
                )
                eid += 1
        return rows

    alt = series([5, 15] * 6)           # mean 10: -+-+... 12 runs
    clump = series([5] * 6 + [15] * 6)  # 2 runs
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_type string, event_id long, ts timestamp, value double"
    )
    orig = C.tbl
    try:
        C.tbl = lambda _s, _d, _n: mk(alt)
        r_alt = C.agg_runs_test(spark, "x").collect()[0]
        C.tbl = lambda _s, _d, _n: mk(clump)
        r_cl = C.agg_runs_test(spark, "x").collect()[0]
    finally:
        C.tbl = orig
    assert (r_alt.n_above, r_alt.n_below) == (6, 6)
    assert r_alt.n_runs == 12
    assert r_cl.n_runs == 2
    # expected runs: 1 + 2*6*6/12 = 7 exactly
    assert r_alt.expected_runs_micro == 7000000
    assert r_alt.runs_ratio_ppm > 1500000  # oscillating
    assert r_cl.runs_ratio_ppm < 500000    # clumped


def test_record_extremes_monotone_and_constant(spark):
    # engineered: strictly increasing series -> every hour is a record
    # (ratio >> 1e6 once n > e^n...); constant series -> exactly 1
    # record; harmonic sum is the exact integer micro H_n
    import datetime

    from kcl_akka_stream_spark.queries import core as C

    def series(counts):
        rows = []
        t0 = datetime.datetime(2024, 1, 1)
        eid = 0
        for h, n in enumerate(counts):
            for _ in range(n):
                rows.append(
                    ("t", eid, t0 + datetime.timedelta(hours=h), 1.0)
                )
                eid += 1
        return rows

    inc = series(list(range(1, 13)))   # 1..12 strictly increasing
    const = series([7] * 12)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_type string, event_id long, ts timestamp, value double"
    )
    orig = C.tbl
    try:
        C.tbl = lambda _s, _d, _n: mk(inc)
        r_inc = C.w_record_extremes(spark, "x").collect()[0]
        C.tbl = lambda _s, _d, _n: mk(const)
        r_c = C.w_record_extremes(spark, "x").collect()[0]
    finally:
        C.tbl = orig
    assert r_inc.n_records == 12  # every hour breaks the record
    assert r_c.n_records == 1     # only the first
    h12 = sum(1000000 // i for i in range(1, 13))
    assert r_inc.harmonic_micro == h12 == r_c.harmonic_micro
