"""Wave-39 evidence pack: Neyman allocation and Jensen-Shannon divergence."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_neyman_budget_and_variance_preference(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["sample_neyman_allocation"](spark, sf_dir).collect()
    assert sum(r.sample_alloc for r in rows) == 10_000  # Hamilton invariant
    for r in rows:
        assert r.neyman_weight >= 0 and r.sample_alloc >= 0
    # allocation is monotone in the Neyman weight (n * sd)
    by_w = sorted(rows, key=lambda r: r.neyman_weight)
    for a, b in zip(by_w, by_w[1:]):
        if b.neyman_weight > a.neyman_weight:
            assert b.sample_alloc >= a.sample_alloc


def test_neyman_prefers_high_variance_stratum(spark):
    # Two strata, same size: one constant-ish (sd ~ 0), one wide -- the
    # wide stratum must take (almost) the whole budget.
    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES

    rows = []
    for i in range(200):
        rows.append((2 * i, "flat", 5.00))                 # sd = 0
        rows.append((2 * i + 1, "wide", float(1 + (i % 100) * 10)))  # wide
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    orig = C.tbl
    C.tbl = lambda s, sfd, name: ev if name == "events" else orig(s, sfd, name)
    try:
        out = {r.event_type: r for r in QUERIES["sample_neyman_allocation"](spark, "unused").collect()}
    finally:
        C.tbl = orig
    assert out["flat"].neyman_weight == 0  # zero variance -> zero weight
    assert out["flat"].sample_alloc == 0
    assert out["wide"].sample_alloc == 10_000


def test_jsd_matches_pure_python_and_bounds(spark, sf_dir):
    import re

    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    r = QUERIES["text_js_divergence"](spark, sf_dir).collect()[0]
    # bounded by ln 2 (693147 micronats); strictly positive on two
    # genuinely different language slices
    assert 0 < r.jsd_micronats < 693_148
    assert r.jsd_micronats == r.kl_a_micro_half + r.kl_b_micro_half

    # recompute with the same frozen-integer recipe in pure python
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "de")
    ).select("lang", "text").collect()
    ca, cb = {}, {}
    for row in docs:
        d = ca if row.lang == "en" else cb
        for t in re.findall(r"[a-z0-9]+", row.text.lower()):
            d[t] = d.get(t, 0) + 1
    vocab = set(ca) | set(cb)
    na, nb = sum(ca.values()), sum(cb.values())
    ta = tb = 0
    for t in vocab:
        a, b = ca.get(t, 0), cb.get(t, 0)
        pa, pb = a / na, b / nb
        if a > 0:
            ta += (a * 1_000_000 // na) * round(math.log(2.0 * pa / (pa + pb)) * 1_000_000)
        if b > 0:
            tb += (b * 1_000_000 // nb) * round(math.log(2.0 * pb / (pa + pb)) * 1_000_000)
    assert r.n_vocab == len(vocab)
    assert r.kl_a_micro_half == ta // 2_000_000
    assert r.kl_b_micro_half == tb // 2_000_000


def test_jsd_identical_slices_is_zero(spark):
    import kcl_akka_stream_spark.queries.pipeline as P
    from kcl_akka_stream_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [(1, "en", "alpha beta gamma"), (2, "de", "alpha beta gamma")],
        "doc_id long, lang string, text string",
    )
    orig = P.tbl
    P.tbl = lambda s, sfd, name: docs if name == "documents" else orig(s, sfd, name)
    try:
        r = QUERIES["text_js_divergence"](spark, "unused").collect()[0]
    finally:
        P.tbl = orig
    assert r.jsd_micronats == 0
