"""Round-8 wave-14 queries: session attribution, A/B readout, WoW trend,
CMS acceptance contract, kNN classify — invariants beyond the oracle gate."""

from pyspark.sql import functions as F


def test_session_attribution_mass_conserves(spark, sf_dir):
    # Attribution must neither create nor destroy purchase revenue: the
    # matrix's total equals the raw purchase cents total, and session
    # counts equal the sessionize count.
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries.registry import tbl

    rows = QUERIES["w_session_attribution"](spark, sf_dir).collect()
    assert rows
    ev = tbl(spark, sf_dir, "events")
    raw_cents = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")))
        .collect()[0][0]
    )
    assert sum(r.purchase_cents for r in rows) == raw_cents
    n_sessions_total = sum(r.n_sessions for r in rows)
    sess_count = (
        QUERIES["w_sessionize"](spark, sf_dir)
        .agg(F.sum("n_sessions"))
        .collect()[0][0]
    )
    assert n_sessions_total == sess_count
    for r in rows:
        assert 0 <= r.n_converting <= r.n_sessions


def test_ab_test_report_matches_scipy_free_welch(spark, sf_dir):
    # Recompute Welch's t from the report's own sufficient statistics in
    # plain Python: the published t must match the formula bit-for-bit
    # (round 6), proving the statistic is a pure function of the exact
    # integer state.
    from kcl_akka_stream_spark.queries import QUERIES

    r = QUERIES["agg_ab_test_report"](spark, sf_dir).collect()[0]
    va = (r.s2_a - r.s1_a * r.s1_a / r.n_a) / (r.n_a - 1) / r.n_a
    vb = (r.s2_b - r.s1_b * r.s1_b / r.n_b) / (r.n_b - 1) / r.n_b
    t = (r.s1_a / r.n_a - r.s1_b / r.n_b) / (va + vb) ** 0.5
    assert abs(round(t, 6) - r.welch_t) < 1e-9
    assert r.n_a > 0 and r.n_b > 0


def test_wow_change_first_week_null_and_bps_sign(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["w_wow_change"](spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.week_start)
        assert rs[0].prev_cents is None and rs[0].delta_bps is None
        for prev, cur in zip(rs, rs[1:]):
            assert cur.prev_cents == prev.cents
            # sign of the bps delta matches the raw difference
            if cur.cents > cur.prev_cents:
                assert cur.delta_bps >= 0
            elif cur.cents < cur.prev_cents:
                assert cur.delta_bps <= 0


def test_cms_error_report_contract(spark, sf_dir):
    # CMS is one-sided: underestimates are impossible, and beyond-3N/w
    # overcounts mean a broken sketch (min over 4 independent rows).
    from kcl_akka_stream_spark.queries import QUERIES

    r = QUERIES["agg_cms_error_report"](spark, sf_dir).collect()[0]
    assert r.n_underestimates == 0
    assert r.n_within_3w == r.n_keys
    assert 0 <= r.n_exact <= r.n_keys
    assert r.max_overcount >= 0


def test_knn_classify_votes_bounded_and_labels_exist(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries.registry import tbl

    rows = QUERIES["sim_knn_classify"](spark, sf_dir).collect()
    assert len(rows) == 5
    labels = {
        r.label for r in tbl(spark, sf_dir, "embeddings").select("label").distinct().collect()
    }
    for r in rows:
        assert 1 <= r.votes <= 5
        assert r.pred_label in labels
        assert r.correct == int(r.pred_label == r.true_label)
