"""Round-12 ADVICE-r11 degenerate-case pins: single-row strata must
yield NULL (both engines), never inf -> Long.MaxValue divergence."""

from __future__ import annotations

import duckdb


def test_single_row_stratum_agrees_cross_engine(spark):
    # The guarded expression shape shared by agg_welch_ttest /
    # sample_neyman_allocation / agg_simpson_diversity: variance-like
    # divisor nullif(n-1, 0).  With n=1 DuckDB used to error on
    # CAST(inf AS BIGINT) while Spark non-ANSI cast saturated to
    # Long.MaxValue; with the guard BOTH yield NULL.
    expr = (
        "cast(floor(n * sqrt((cast(s2 as double) - cast(s1 as double)"
        " * s1 / n) / nullif(n - 1, 0))) as bigint)"
    )
    df = spark.createDataFrame([(1, 7, 49)], "n long, s1 long, s2 long")
    got_spark = df.selectExpr(f"{expr} as w").collect()[0].w
    got_duck = duckdb.sql(
        f"SELECT {expr.replace('floor', 'floor')} AS w"
        " FROM (SELECT 1::BIGINT n, 7::BIGINT s1, 49::BIGINT s2)"
    ).fetchone()[0]
    assert got_spark is None and got_duck is None
    # and a 2-row stratum still produces the real weight in both
    df2 = spark.createDataFrame([(2, 10, 52)], "n long, s1 long, s2 long")
    w_spark = df2.selectExpr(f"{expr} as w").collect()[0].w
    w_duck = duckdb.sql(
        f"SELECT {expr} AS w"
        " FROM (SELECT 2::BIGINT n, 10::BIGINT s1, 52::BIGINT s2)"
    ).fetchone()[0]
    assert w_spark == w_duck == 2  # sd = sqrt(2/1) ~ 1.414; floor(2*1.414)


def test_scd2_consistency_report_all_zero_on_sound_build(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    r = QUERIES["scd2_consistency_report"](spark, sf_dir).collect()[0]
    assert r.n_keys > 0 and r.n_rows > r.n_keys  # non-vacuous: multi-version keys
    for c in (
        "viol_current_per_key",
        "viol_open_with_end",
        "viol_closed_without_end",
        "viol_contiguity",
        "viol_nonpositive_span",
        "viol_version_numbering",
        "viol_adjacent_same_state",
    ):
        assert getattr(r, c) == 0, c


def test_scd2_consistency_reds_engineered_violations(spark):
    # The acceptance contract must go RED on a broken table by
    # construction: one engineered violation per invariant.
    import datetime

    from kcl_akka_stream_spark.operators.cdc import scd2_consistency

    t = lambda s: datetime.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # key 1: duplicated current + open row carrying valid_to
        (1, "a", 1, t(0), t(10), 1),
        (1, "b", 2, t(10), None, 1),
        # key 2: contiguity violation (gap 10..20 -> 25) + closed w/o end
        (2, "a", 1, t(0), t(10), 0),
        (2, "b", 2, t(10), None, 0),
        (2, "c", 3, t(25), None, 1),
        # key 3: nonpositive span + version gap (2,3) + adjacent same state
        (3, "x", 2, t(0), t(0), 0),
        (3, "x", 3, t(0), None, 1),
    ]
    scd2 = spark.createDataFrame(
        rows,
        "user_id long, state string, version long, valid_from timestamp,"
        " valid_to timestamp, is_current int",
    )
    r = scd2_consistency(scd2).collect()[0]
    assert r.viol_current_per_key == 1  # key 1 carries TWO current rows
    assert r.viol_open_with_end == 1
    assert r.viol_closed_without_end == 1
    assert r.viol_contiguity >= 1
    assert r.viol_nonpositive_span == 1
    assert r.viol_version_numbering == 1
    assert r.viol_adjacent_same_state == 1
