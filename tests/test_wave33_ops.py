"""Wave-33 evidence pack: PSI drift, largest-remainder apportionment,
and the 17th mergeable streaming family (top-k order-statistic lattice)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_topk_lattice_merge_equals_direct_for_any_split():
    # The family contract: top_k(A ∪ B) == top_k(top_k(A) ∪ top_k(B))
    # over SET union, proven over EVERY 2-way partition of 7 elements
    # (126 splits) with the (cents DESC, event_id) tiebreak.  The
    # identity dedup in the union is LOAD-BEARING: writing this test
    # with bare list concat exposed that a multiset merge would rank a
    # replayed element twice -- which is why the twin distinct()s its
    # state before re-ranking.
    from itertools import combinations

    rows = [(1, 50), (2, 90), (3, 90), (4, 10), (5, 70), (6, 70), (7, 30)]
    k = 4

    def topk(sub):
        return sorted(set(sub), key=lambda r: (-r[1], r[0]))[:k]

    direct = topk(rows)
    ids = list(range(len(rows)))
    for i in range(1, len(rows)):
        for left in combinations(ids, i):
            sa = topk([rows[j] for j in left])
            sb = topk([rows[j] for j in ids if j not in left])
            assert topk(sa + sb) == direct
    # idempotence: re-offering an already-absorbed batch changes nothing
    assert topk(direct + topk(rows[:3])) == direct
    # and the multiset (no-dedup) merge is NOT idempotent -- the bug the
    # twin's distinct() exists to prevent
    multiset = sorted(direct + topk(rows[:3]), key=lambda r: (-r[1], r[0]))[:k]
    assert multiset != direct


def test_stream_topk_merge_matches_batch_topk(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table
    from pyspark.sql import Window

    got = {
        (r.event_type, r.rk): (r.event_id, r.cents)
        for r in QUERIES["stream_topk_merge"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    wk = Window.partitionBy("event_type").orderBy(F.col("cents").desc(), "event_id")
    exp = {
        (r.event_type, r.rk): (r.event_id, r.cents)
        for r in ev.select(
            "event_type",
            "event_id",
            F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
        )
        .withColumn("rk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rk") <= 8)
        .collect()
    }
    assert got == exp and len(got) > 0


def test_psi_identical_halves_is_zero(spark):
    # When both halves carry the SAME distribution, every decile cell
    # has p == q and PSI == 0 exactly (smoothing adds +1 to both sides
    # symmetrically, preserving the zero).
    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES

    rows = []
    eid = 0
    for v in range(1, 101):
        for half in (0, 1):  # identical value in both halves
            rows.append((eid * 2 + half, "t", float(v)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    orig = C.tbl
    C.tbl = lambda s, sfd, name: ev if name == "events" else orig(s, sfd, name)
    try:
        r = QUERIES["agg_psi_drift"](spark, "unused").collect()[0]
    finally:
        C.tbl = orig
    assert r.psi_micro == 0


def test_psi_shifted_halves_is_large(spark):
    # A hard location shift (half 0 ~ 1..100, half 1 ~ 201..300) must
    # trip PSI far above the classic 0.25 action threshold (250000
    # micro-units).
    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES

    rows = []
    for i in range(1, 101):
        rows.append((2 * i, "t", float(i)))          # half 0
        rows.append((2 * i + 1, "t", float(i + 200)))  # half 1
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    orig = C.tbl
    C.tbl = lambda s, sfd, name: ev if name == "events" else orig(s, sfd, name)
    try:
        r = QUERIES["agg_psi_drift"](spark, "unused").collect()[0]
    finally:
        C.tbl = orig
    assert r.psi_micro > 250_000


def test_apportionment_sums_to_budget_exactly(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["pipeline_token_apportionment"](spark, sf_dir).collect()
    assert sum(r.final_alloc for r in rows) == 1_000_000  # the Hamilton invariant
    for r in rows:
        assert r.extra in (0, 1)
        assert r.final_alloc == r.base_alloc + r.extra
    # allocation is monotone in weight: a strictly larger weight never
    # receives a smaller final allocation (Hamilton preserves order)
    by_w = sorted(rows, key=lambda r: r.w_micro)
    for a, b in zip(by_w, by_w[1:]):
        if b.w_micro > a.w_micro:
            assert b.final_alloc >= a.final_alloc
