"""Wave-40 evidence pack: LSH band-config sweep, modularity acceptance,
Simpson diversity."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_band_sweep_monotone_in_rows_per_band(spark, sf_dir):
    # More rows per band sharpens the S-curve: candidate counts must be
    # non-increasing as rows_per_band grows (8x1 >= 4x2 >= 2x4), and
    # the 4x2 config equals the registry's production configuration.
    from kcl_akka_stream_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_lsh_buckets,
    )
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    rows = {r.bands: r for r in QUERIES["dedup_band_config_sweep"](spark, sf_dir).collect()}
    assert set(rows) == {8, 4, 2}
    assert rows[8].rows_per_band == 1 and rows[2].rows_per_band == 4
    assert (
        rows[8].n_candidate_pairs
        >= rows[4].n_candidate_pairs
        >= rows[2].n_candidate_pairs
        >= 0
    )
    docs = load_table(spark, sf_dir, "documents")
    prod = minhash_candidate_pairs(
        minhash_lsh_buckets(docs, num_hashes=8, bands=4, k=3)
    ).count()
    assert rows[4].n_candidate_pairs == prod


def test_modularity_hand_checked_two_cliques(spark):
    # Two DISCONNECTED 3-cliques: LPA labels each clique exactly (no
    # bridge to oscillate on -- synchronous LPA leaves a bridge node as
    # a singleton, which is a property of the algorithm, not a bug),
    # and Newman modularity of the clique partition is EXACTLY 0.5:
    # per community intra2 = 6 of w2 = 12, deg = 6, so
    # Q = 2 * (6/12 - (6/12)^2) = 0.5.
    from kcl_akka_stream_spark.operators.graph import label_propagation

    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)]
    p = spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src long, dst long, w long"
    )
    e = p.unionByName(
        p.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    labels = label_propagation(e, iterations=2)
    ls = labels.select(F.col("node").alias("src"), F.col("label").alias("lsrc"))
    ld = labels.select(F.col("node").alias("dst"), F.col("label").alias("ldst"))
    ej = e.join(ls, "src").join(ld, "dst")
    intra2 = (
        ej.filter(F.col("lsrc") == F.col("ldst"))
        .groupBy("lsrc")
        .agg(F.sum("w").alias("i2"))
        .collect()
    )
    w2 = e.agg(F.sum("w")).collect()[0][0]
    deg = ej.groupBy("lsrc").agg(F.sum("w").alias("d")).collect()
    q = sum(
        (next((r.i2 for r in intra2 if r.lsrc == d.lsrc), 0) * w2 - d.d * d.d)
        / (w2 * w2)
        for d in deg
    )
    assert abs(q - 0.5) < 1e-12  # exact hand value for two clean cliques
    assert {r.lsrc for r in intra2} == {1, 4}  # one label per clique


def test_modularity_report_bounds(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    r = QUERIES["graph_modularity_report"](spark, sf_dir).collect()[0]
    assert r.n_communities >= 1 and r.total_weight > 0
    # Q is bounded in [-0.5, 1] -> micro in [-500000, 1000000]
    assert -500_000 <= r.q_modularity_micro <= 1_000_000


def test_simpson_hand_checked_and_vs_entropy_direction(spark):
    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES

    # concentrated: one user owns 4 of 5 events -> simpson high;
    # spread: 5 users, one event each -> simpson == 0 (no same-user pair)
    rows = (
        [(i, "conc", 1 if i < 4 else 2) for i in range(5)]
        + [(10 + i, "spread", 100 + i) for i in range(5)]
    )
    ev = spark.createDataFrame(
        [(eid, et, float(1), u) for eid, et, u in rows],
        "event_id long, event_type string, value double, user_id long",
    )
    orig = C.tbl
    C.tbl = lambda s, sfd, name: ev if name == "events" else orig(s, sfd, name)
    try:
        out = {r.event_type: r for r in QUERIES["agg_simpson_diversity"](spark, "unused").collect()}
    finally:
        C.tbl = orig
    # conc: pairs same-user = C(4,2)*2 = 12 of n(n-1) = 20 -> 600000 ppm
    assert out["conc"].simpson_ppm == 600_000
    assert out["spread"].simpson_ppm == 0
    assert out["spread"].diversity_ppm == 1_000_000
    for r in out.values():
        assert r.simpson_ppm + r.diversity_ppm == 1_000_000
