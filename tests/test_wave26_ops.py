"""Wave-26 evidence pack: Hill tail index, conditional recency window,
sorted-neighborhood blocking, streaming MI twin."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_hill_index_on_exact_pareto_ranks(spark):
    # construct revenues x_i = C * i^(-1/alpha) for ranks i=1..20 with
    # alpha=2: hill_inv = mean(ln(x_i/x_20)) = mean((1/alpha) ln(20/i)).
    from pyspark.sql import Window

    alpha = 2.0
    revs = [
        (i, int(round(1_000_000 * (i ** (-1.0 / alpha)))))
        for i in range(1, 21)
    ]
    expect = round(
        sum(round(math.log(r / revs[19][1]) * 1e6) for _, r in revs[:19]) // 19
    )
    r = spark.createDataFrame(revs, "l_suppkey long, rev long")
    w = Window.orderBy(F.col("rev").desc(), "l_suppkey")
    top = r.select("rev", F.row_number().over(w).alias("rk")).filter(
        F.col("rk") <= 20
    )
    xk = top.filter(F.col("rk") == 20).select(F.col("rev").alias("x20"))
    got = (
        top.crossJoin(F.broadcast(xk))
        .agg(
            F.expr(
                "cast(sum(case when rk < 20 then"
                " cast(round(ln(cast(rev as double) / x20) * 1000000)"
                " as bigint) else 0 end) div 19 as bigint)"
            ).alias("h")
        )
        .collect()[0].h
    )
    assert got == expect
    # and the estimate recovers ~ 1/alpha = 0.5 (integer-rounding slack)
    assert abs(got - 500_000) < 40_000


def test_time_since_event_hand_case(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 7, base, "view"),
        (2, 7, base + dt.timedelta(seconds=10), "click"),
        (3, 7, base + dt.timedelta(seconds=25), "view"),
        (4, 7, base + dt.timedelta(seconds=40), "click"),
        (5, 7, base + dt.timedelta(seconds=41), "error"),
        (6, 8, base + dt.timedelta(seconds=5), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    got = {
        r.event_id: r.s
        for r in ev.select(
            "event_id",
            (F.unix_timestamp("ts") - F.unix_timestamp(last_click))
            .cast("long")
            .alias("s"),
        ).collect()
    }
    # before first click -> NULL; click itself -> 0; then elapsed
    assert got == {1: None, 2: 0, 3: 15, 4: 0, 5: 1, 6: None}


def test_sorted_neighborhood_candidates_shape(spark, sf_dir):
    # every emitted pair must be within w=3 ranks in its language's
    # canonical sort order -- recomputed in python.
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.queries.registry import tbl

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()
    rank = {}
    by_lang: dict = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append((r.text[:24].lower(), r.doc_id))
    for lang, members in by_lang.items():
        for i, (_, d) in enumerate(sorted(members)):
            rank[d] = (lang, i)
    out = QUERIES["dedup_sorted_neighborhood"](spark, sf_dir).collect()
    assert out, "fixture prefixes collide -> expected non-vacuous pairs"
    for r in out:
        la, ra = rank[r.id_a]
        lb, rb = rank[r.id_b]
        assert la == lb and 1 <= abs(ra - rb) <= 3
        assert r.jaccard >= 0.2


def test_mi_twin_shares_state_shape_with_entropy_twin():
    # both twins fold the identical (type, hour) count state -- pin the
    # fold expressions so the families cannot silently diverge.
    import inspect

    from kcl_akka_stream_spark.queries import streaming_q as sq

    mi_src = inspect.getsource(sq.stream_mi_merge)
    ent_src = inspect.getsource(sq.stream_entropy_merge)
    for s in (mi_src, ent_src):
        assert 'F.hour("ts").cast("long").alias("hr")' in s
        assert '.agg(F.count(F.lit(1)).cast("long").alias("c"))' in s


def test_ohlc_bar_hand_case(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        (1, base + dt.timedelta(minutes=1), "t", 5.0),    # open
        (2, base + dt.timedelta(minutes=10), "t", 9.0),   # high
        (3, base + dt.timedelta(minutes=20), "t", 1.0),   # low
        (4, base + dt.timedelta(minutes=50), "t", 7.0),   # close
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    from pyspark.sql import Window

    v = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar"),
        "ts", "event_id",
        F.expr("cast(floor(value * 10 + 0.5) as bigint)").alias("x"),
    )
    wo = Window.partitionBy("event_type", "bar").orderBy("ts", "event_id")
    wc = Window.partitionBy("event_type", "bar").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = v.select(
        "event_type", "bar", "x",
        F.row_number().over(wo).alias("ro"),
        F.row_number().over(wc).alias("rc"),
    ).groupBy("event_type", "bar").agg(
        F.max(F.when(F.col("ro") == 1, F.col("x"))).alias("o"),
        F.max("x").alias("h"),
        F.min("x").alias("l"),
        F.max(F.when(F.col("rc") == 1, F.col("x"))).alias("c"),
    ).collect()[0]
    assert (r.o, r.h, r.l, r.c) == (50, 90, 10, 70)


def test_ols_residuals_zero_on_perfect_line(spark):
    # y = 3 + 2x exactly -> every residual is 0 (integer OLS recovers
    # the line bit-for-bit when it fits exactly in micro units)
    rows = [("t", i, i % 24, 30 + 20 * (i % 24)) for i in range(100)]
    v = spark.createDataFrame(rows, "event_type string, event_id long, x long, y long")
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"), F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    fit = s.select(
        "event_type",
        F.expr("(n * sxy - sx * sy) * 1000000 div (n * sx2 - sx * sx)").alias("b_micro"),
        F.expr(
            "(sy * 1000000 - ((n * sxy - sx * sy) * 1000000"
            " div (n * sx2 - sx * sx)) * sx) div n"
        ).alias("a_micro"),
    )
    resid = v.join(F.broadcast(fit), "event_type").select(
        (F.col("y") * F.lit(1_000_000)
         - (F.col("a_micro") + F.col("b_micro") * F.col("x"))).alias("r")
    )
    vals = {r.r for r in resid.collect()}
    assert vals == {0}


def test_ohlc_lattice_merge_equals_direct_for_any_split(spark):
    # the sixteenth-family contract, proven generatively enough: split a
    # bar's events into EVERY 2-way partition of 5 rows (31 splits);
    # merging the two partial lattice states must equal the direct bar.
    import datetime as dt
    from itertools import combinations

    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=3 * i), "t", float(v))
        for i, v in enumerate([5.0, 9.0, 1.0, 4.0, 7.0], start=1)
    ]

    def state(sub):
        ts = [r[1] for r in sub]
        xs = [int(round(r[3] * 10)) for r in sub]
        keyed = sorted(zip(ts, (r[0] for r in sub), xs))
        return (keyed[0], max(xs), min(xs), keyed[-1], len(sub))

    def merge(a, b):
        return (
            min(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]),
            max(a[3], b[3]), a[4] + b[4],
        )

    direct = state(rows)
    ids = list(range(5))
    for k in range(1, 5):
        for left in combinations(ids, k):
            sa = state([rows[i] for i in left])
            sb = state([rows[i] for i in ids if i not in left])
            assert merge(sa, sb) == direct
    # and the Spark struct-min/max agg implements exactly this lattice
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    x = F.expr("cast(floor(value * 10 + 0.5) as bigint)")
    got = (
        ev.select(
            "event_type",
            F.struct("ts", "event_id", x.alias("x")).alias("okey"),
            x.alias("x"),
        )
        .groupBy("event_type")
        .agg(
            F.min("okey").alias("o"), F.max("x").alias("h"),
            F.min("x").alias("l"), F.max("okey").alias("c"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert (got.o.x, got.h, got.l, got.c.x, got.n) == (
        direct[0][2], direct[1], direct[2], direct[3][2], direct[4]
    )


def test_autocorr_sign_on_constructed_series(spark):
    # strictly alternating series -> strongly negative lag-1 autocorr;
    # monotone ramp -> strongly positive.
    from pyspark.sql import Window

    from kcl_akka_stream_spark.operators.aggregations import pearson_stats

    def r_of(vals):
        v = spark.createDataFrame(
            [("t", i, x) for i, x in enumerate(vals)],
            "event_type string, event_id long, v long",
        )
        w = Window.partitionBy("event_type").orderBy("event_id")
        p = v.select(
            "event_type", F.lag("v").over(w).alias("x"), F.col("v").alias("y")
        ).filter(F.col("x").isNotNull())
        return pearson_stats(p, "event_type", "x", "y").collect()[0].corr_r

    assert r_of([0, 10, 0, 10, 0, 10, 0, 10]) == -1.0
    assert r_of(list(range(0, 100, 7))) == 1.0


def test_pmi_hand_case(spark):
    # corpus where pair (x, y) is exclusive (always together) and (a, b)
    # is frequent but independent-ish: PMI must rank (x, y) above (a, b)
    # even though (a, b) has higher raw count.
    import math

    from pyspark.sql import functions as FF

    from kcl_akka_stream_spark.queries.registry import tbl  # noqa: F401

    docs = []
    for i in range(10):
        docs.append((i, "x y"))                 # exclusive pair, n_ab=10
    for i in range(10, 30):
        docs.append((i, "a b a c b a"))         # frequent mixed a/b
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from kcl_akka_stream_spark.operators.text import tokens

    t = tokens(FF.col("text"))
    pair_struct = FF.zip_with(
        FF.slice(t, 1, FF.greatest(FF.size(t) - 1, FF.lit(0))),
        FF.slice(t, 2, FF.greatest(FF.size(t) - 1, FF.lit(0))),
        lambda a, b: FF.struct(a.alias("a"), b.alias("b")),
    )
    pr = df.select(FF.explode(pair_struct).alias("p")).select(
        FF.col("p.a").alias("a"), FF.col("p.b").alias("b")
    )
    rows = pr.collect()
    n = len(rows)
    from collections import Counter

    pc = Counter((r.a, r.b) for r in rows)
    la = Counter(r.a for r in rows)
    lb = Counter(r.b for r in rows)
    pmi = {
        k: round(math.log(c * n / (la[k[0]] * lb[k[1]])) * 1e6)
        for k, c in pc.items()
        if c >= 5
    }
    assert pmi[("x", "y")] > pmi[("a", "b")]
    # and exclusive-pair PMI equals ln(n / n_ab) since margins == n_ab
    assert pmi[("x", "y")] == round(math.log(n / pc[("x", "y")]) * 1e6)


def test_seasonal_decompose_effects_sum_consistency(spark, sf_dir):
    # weighted dow effects must sum to ~0 (floor-division slack bounded
    # by the number of dow cells) and each row's identity holds exactly.
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["w_seasonal_decompose"](spark, sf_dir).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        assert r.dow_effect_micro == r.dow_mean_micro - r.grand_mean_micro
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        n = sum(r.n_d for r in rs)
        weighted = sum(r.dow_effect_micro * r.n_d for r in rs)
        # exact-sum identity up to per-cell floor slack (< 1 micro each)
        assert abs(weighted) <= n * len(rs)
