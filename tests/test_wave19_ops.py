"""Round-9 wave-19 operators: HITS hubs/authorities, seasonality profile,
calendar-aware lag features, streaming bootstrap merge law."""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# hits: hand-checked bipartite scores
# ---------------------------------------------------------------------------


def test_hits_hand_checked(spark):
    from kcl_akka_stream_spark.operators.graph import hits

    # c1 -> s1(w2), s2(w1); c2 -> s1(w1)
    edges = spark.createDataFrame(
        [(1, 101, 2), (1, 102, 1), (2, 101, 1)], "src long, dst long, w long"
    )
    hubs, auths = hits(edges, iterations=1)
    a = {r.node: r.auth for r in auths.collect()}
    h = {r.node: r.hub for r in hubs.collect()}
    # a1 = in-weight: s1 = 3, s2 = 1
    assert a == {101: 3, 102: 1}
    # h1 = sum w * a1: c1 = 2*3 + 1*1 = 7, c2 = 1*3 = 3
    assert h == {1: 7, 2: 3}


def test_hits_second_round_amplifies(spark):
    from kcl_akka_stream_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 101, 2), (1, 102, 1), (2, 101, 1)], "src long, dst long, w long"
    )
    hubs, auths = hits(edges, iterations=2)
    a = {r.node: r.auth for r in auths.collect()}
    h = {r.node: r.hub for r in hubs.collect()}
    # a2 = sum w * h1: s1 = 2*7 + 1*3 = 17, s2 = 1*7 = 7
    assert a == {101: 17, 102: 7}
    # h2 = sum w * a2: c1 = 2*17 + 1*7 = 41, c2 = 1*17 = 17
    assert h == {1: 41, 2: 17}


# ---------------------------------------------------------------------------
# w_lag_features: calendar lags vs row lags
# ---------------------------------------------------------------------------


def test_lag_features_calendar_not_row(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["w_lag_features"](spark, sf_dir).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, {})[r.d] = r
    checked_gap = checked_adj = 0
    for days in by_user.values():
        for d, r in days.items():
            prev = days.get(d - 1)
            if prev is None:
                # calendar gap -> NULL lag1 (a row-offset lag would leak
                # the stale previous row here)
                assert r.lag1_cents is None
                checked_gap += 1
            else:
                assert r.lag1_cents == prev.rev_cents
                checked_adj += 1
            # rolling 7d window re-derived in python
            roll = sum(
                days[x].rev_cents for x in range(d - 6, d + 1) if x in days
            )
            assert r.roll7_cents == roll
    assert checked_gap > 0  # the fixture really exercises the gap case


# ---------------------------------------------------------------------------
# seasonality profile: shares sum to ~1e6 per type
# ---------------------------------------------------------------------------


def test_seasonality_shares_sum_to_million(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["w_seasonality_profile"](spark, sf_dir).collect()
    per_type: dict = {}
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hr <= 23
        per_type.setdefault(r.event_type, []).append(r)
    for t, rs in per_type.items():
        total_ppm = sum(r.share_ppm for r in rs)
        # integer div truncation loses at most 1 ppm per cell
        assert 1_000_000 - len(rs) <= total_ppm <= 1_000_000
        n_total = sum(r.n for r in rs)
        for r in rs:
            assert r.share_ppm == r.n * 1_000_000 // n_total


# ---------------------------------------------------------------------------
# streaming bootstrap: split-invariance of the merged replicate states
# ---------------------------------------------------------------------------


def test_bootstrap_states_merge_equals_direct(spark):
    from kcl_akka_stream_spark.operators.sampling import (
        poisson_bootstrap_weights,
    )

    df = spark.createDataFrame(
        [("t", i, 100 + i) for i in range(60)], "g string, id long, cents long"
    )

    def state(d):
        return {
            (r.g, r.b): (r.swc, r.sw)
            for r in poisson_bootstrap_weights(d, "id", b=8)
            .groupBy("g", "b")
            .agg(
                F.sum(F.col("w") * F.col("cents")).alias("swc"),
                F.sum("w").alias("sw"),
            )
            .collect()
        }

    direct = state(df)
    # fold two arbitrary halves, merge by addition
    s1 = state(df.filter(F.col("id") < 25))
    s2 = state(df.filter(F.col("id") >= 25))
    merged = {
        k: (
            s1.get(k, (0, 0))[0] + s2.get(k, (0, 0))[0],
            s1.get(k, (0, 0))[1] + s2.get(k, (0, 0))[1],
        )
        for k in set(s1) | set(s2)
    }
    assert merged == direct
