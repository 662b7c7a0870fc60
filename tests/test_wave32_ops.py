"""Wave-32 evidence pack: filter-rule attribution, magic-byte sniff,
exact trimmed mean, gaps-and-islands streaks."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_filter_attribution_accounting(spark, sf_dir):
    # unique kills <= gross kills per rule; pass_all + union-of-fails
    # == n_docs; and the report's pass count equals gopher_pass.
    from kcl_akka_stream_spark.operators.quality import gopher_quality_flags
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    rows = QUERIES["pipeline_filter_attribution"](spark, sf_dir).collect()
    assert {r.rule for r in rows} == {
        "word_count", "mean_word_len", "alpha_frac", "top_bigram", "dup_trigram"
    }
    n_docs = rows[0].n_docs
    n_pass = rows[0].n_pass_all
    for r in rows:
        assert 0 <= r.n_unique_kill <= r.n_fail <= n_docs
        assert (r.n_docs, r.n_pass_all) == (n_docs, n_pass)
    flags = gopher_quality_flags(load_table(spark, sf_dir, "documents"))
    assert n_pass == flags.filter(F.col("gopher_pass") == 1).count()
    # sum of unique kills can never exceed total failing docs
    assert sum(r.n_unique_kill for r in rows) <= n_docs - n_pass


def test_magic_sniff_fixture_is_consistent(spark, sf_dir):
    # The synthesized payloads carry real magic bytes, so claimed ==
    # sniffed for every row: the mismatch channel exists but is empty
    # on a healthy corpus (and the synthetic corruption case below
    # proves it fires).
    from kcl_akka_stream_spark.queries import QUERIES

    rows = QUERIES["multimodal_magic_sniff"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.claimed == r.sniffed and r.n_mismatch == 0
        assert r.total_bytes > r.n  # payloads are non-empty


def test_magic_sniff_detects_corruption(spark):
    # A payload claiming image without the PNG signature lands in the
    # (image, text) mismatch cell.
    media = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNGreal")), (2, "image", bytearray(b"notpng"))],
        "media_id long, claimed string, payload binary",
    )
    out = media.select(
        "claimed",
        F.expr("octet_length(payload)").alias("n_bytes"),
        F.expr(
            "CASE WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'image'"
            " WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'audio'"
            " ELSE 'text' END"
        ).alias("sniffed"),
    ).groupBy("claimed", "sniffed").count().collect()
    cells = {(r.claimed, r.sniffed): r["count"] for r in out}
    assert cells == {("image", "image"): 1, ("image", "text"): 1}


def test_trimmed_mean_hand_checked(spark):
    # values 1..10 cents, trim n/10 = 1 from each end -> mean of 2..9
    # = 5.5 cents; untrimmed mean 5.5 too (symmetric), so use a skewed
    # set: [1..9, 1000]: n=10, trim 1 -> keep 2..9 + nothing of 1000,
    # trimmed mean = 5.5, raw mean = 104.5.
    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES

    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
    ev = spark.createDataFrame(
        [(i, "t", v / 100.0) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    orig = C.tbl
    C.tbl = lambda s, sfd, name: ev if name == "events" else orig(s, sfd, name)
    try:
        r = QUERIES["agg_trimmed_mean"](spark, "unused").collect()[0]
    finally:
        C.tbl = orig
    assert (r.n, r.n_trimmed_each_end) == (10, 1)
    assert r.mean_micro == 104_500_000  # 104.5 cents in micro-units
    assert r.trimmed_mean_micro == 5_500_000  # 5.5 cents


def test_streaks_hand_checked_and_conserving(spark, sf_dir):
    import kcl_akka_stream_spark.queries.core as C
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    # user 1: A A A B A  -> streaks A:3, B:1, A:1; user 2: B B -> B:2
    import datetime

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    seq = [(1, "A"), (1, "A"), (1, "A"), (1, "B"), (1, "A"), (2, "B"), (2, "B")]
    for i, (u, et) in enumerate(seq):
        rows.append((i, u, et, t0 + datetime.timedelta(seconds=i)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    orig = C.tbl
    C.tbl = lambda s, sfd, name: ev if name == "events" else orig(s, sfd, name)
    try:
        out = {r.event_type: r for r in QUERIES["w_streaks"](spark, "unused").collect()}
    finally:
        C.tbl = orig
    assert (out["A"].n_streaks, out["A"].max_len, out["A"].n_streaks_ge3) == (2, 3, 1)
    assert (out["B"].n_streaks, out["B"].max_len) == (2, 2)
    assert out["A"].n_events == 4 and out["B"].n_events == 3

    # conservation on the fixture: per-type streak event totals == raw counts
    got = {r.event_type: r.n_events for r in QUERIES["w_streaks"](spark, sf_dir).collect()}
    raw = {
        r.event_type: r["count"]
        for r in load_table(spark, sf_dir, "events").groupBy("event_type").count().collect()
    }
    assert got == raw
