"""Round-9 wave-20 operators: mergeable bucket-quantile contract, degree
assortativity, T5 span-corruption plan, streaming Pearson merge law."""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bucket-quantile: contract holds on the fixture, histogram state merges
# ---------------------------------------------------------------------------


def test_bucket_quantile_contract_green_on_fixture(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["agg_bucket_quantile_contract"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the contract IS the invariant: lower bucket edge <= exact value
        # < edge + width, so the flag must be 1 for every group
        assert r.within_width == 1
        assert 0 <= r.p50_exact_cc - r.p50_bucket_cc <= 99
        assert 0 <= r.p90_exact_cc - r.p90_bucket_cc <= 99
        assert r.p50_exact_cc <= r.p90_exact_cc


def test_bucket_histogram_state_merges(spark):
    # the (group, bin) count state is plain-addition mergeable: fold two
    # halves, merge, equals the direct histogram
    df = spark.createDataFrame(
        [("g", i % 700) for i in range(1000)], "g string, cents long"
    )

    def hist(d):
        return {
            (r.g, r.bin): r.n
            for r in d.groupBy("g", F.expr("cents div 100").alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    direct = hist(df)
    h1 = hist(df.limit(400))
    h2 = hist(df.subtract(df.limit(400)))
    # subtract dedups; rebuild halves deterministically instead
    h1 = hist(df.filter(F.col("cents") < 350))
    h2 = hist(df.filter(F.col("cents") >= 350))
    merged: dict = {}
    for h in (h1, h2):
        for k, v in h.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == direct


# ---------------------------------------------------------------------------
# assortativity: hand-checked star graph + fixture sign
# ---------------------------------------------------------------------------


def test_assortativity_negative_on_star(spark):
    from kcl_akka_stream_spark.operators.aggregations import pearson_stats

    # star: hub 0 connected to leaves 1..5, symmetrized.  Every edge pairs
    # degree 5 with degree 1 -> perfectly disassortative (r = -1).
    p = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    e = p.unionByName(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    xy = (
        e.join(deg.select(F.col("node").alias("s"), F.col("d").alias("x")), e.src == F.col("s"))
        .join(deg.select(F.col("node").alias("t"), F.col("d").alias("y")), e.dst == F.col("t"))
        .select(F.lit("g").alias("g"), "x", "y")
    )
    r = pearson_stats(xy, "g", "x", "y").collect()[0]
    assert r.corr_r == -1.0


def test_assortativity_fixture_is_disassortative(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    r = QUERIES["graph_degree_assortativity"](spark, sf_dir).collect()[0]
    # bipartite co-purchase graphs: hubs attach to the other side's
    # leaves by construction
    assert r.assortativity_r is not None and r.assortativity_r < 0


# ---------------------------------------------------------------------------
# span corruption: determinism, island arithmetic, mask-rate envelope
# ---------------------------------------------------------------------------


def test_span_corruption_deterministic_and_consistent(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    a = {r.doc_id: r for r in QUERIES["pipeline_span_corruption"](spark, sf_dir).collect()}
    b = {r.doc_id: r for r in QUERIES["pipeline_span_corruption"](spark, sf_dir).collect()}
    assert {k: (v.n_masked, v.n_spans) for k, v in a.items()} == {
        k: (v.n_masked, v.n_spans) for k, v in b.items()
    }
    for r in a.values():
        assert 1 <= r.n_spans <= r.n_masked <= r.n_tokens
        assert r.mask_ppm == r.n_masked * 1_000_000 // r.n_tokens
    # aggregate mask rate within a loose binomial envelope of 15%
    tot = sum(r.n_tokens for r in a.values())
    masked = sum(r.n_masked for r in a.values())
    assert 0.13 < masked / tot < 0.17


def test_span_islands_merge_consecutive_positions(spark):
    # reproduce the islands trick on a constructed mask: positions
    # {2,3,4, 7, 10,11} -> 3 spans, 6 masked
    from pyspark.sql import Window

    m = spark.createDataFrame(
        [(1, i) for i in (2, 3, 4, 7, 10, 11)], "doc_id long, i long"
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    sp = m.withColumn("island", F.col("i") - F.row_number().over(w))
    agg = sp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_masked"),
        F.countDistinct("island").alias("n_spans"),
    ).collect()[0]
    assert (agg.n_masked, agg.n_spans) == (6, 3)


# ---------------------------------------------------------------------------
# pearson six-tuple state: any-split merge law
# ---------------------------------------------------------------------------


def test_pearson_state_merge_equals_direct(spark):
    from kcl_akka_stream_spark.operators.aggregations import pearson_stats

    df = spark.createDataFrame(
        [("g", i, (i * 7) % 23) for i in range(200)], "g string, x long, y long"
    )
    cols = ["n", "sx", "sy", "sxy", "sx2", "sy2"]

    def state(d):
        r = pearson_stats(d, "g", "x", "y").collect()[0]
        return tuple(getattr(r, c) for c in cols)

    direct = state(df)
    s1 = state(df.filter(F.col("x") < 80))
    s2 = state(df.filter(F.col("x") >= 80))
    merged = tuple(a + b for a, b in zip(s1, s2))
    assert merged == direct
