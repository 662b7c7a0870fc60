"""Wave-35 evidence pack: dedup cascade accounting, embedding dimension
QA, per-user frequency capping."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_cascade_stage_accounting_is_conserving(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    rows = {r.stage: r for r in QUERIES["pipeline_dedup_cascade_report"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert rows[1].n_in == n_docs
    for s in (1, 2, 3):
        r = rows[s]
        assert r.n_out == r.n_in - r.n_removed and r.n_removed >= 0
    # stages chain: each stage consumes the prior stage's output
    assert rows[2].n_in == rows[1].n_out
    assert rows[3].n_in == rows[2].n_out
    # stage 1 equals the independent exact-dedup keeper count
    from kcl_akka_stream_spark.operators.dedup import exact_dedup

    n_keepers = exact_dedup(load_table(spark, sf_dir, "documents")).count()
    assert rows[1].n_out == n_keepers


def test_cascade_synthetic_known_kills(spark):
    # 6 docs: 2 exact copies (one dies in stage 1), 2 sharing a 16-char
    # prefix with different tails (one dies in stage 2), 2 near-dups
    # with high shingle overlap but different heads (one dies in
    # stage 3), all others unrelated.
    import kcl_akka_stream_spark.queries.pipeline as P
    from kcl_akka_stream_spark.queries import QUERIES

    body = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, "totally unique first document about alpha beta gamma"),
            (2, "exact copy here " + body),
            (3, "exact copy here " + body),  # exact dup of 2 -> stage 1
            (4, "shared prefix 16c AAAA different tail content one"),
            (5, "shared prefix 16c BBBB other tail content two"),  # stage 2
            (6, body + " extra suffix token"),  # near-dup of 2's body
        ],
        "doc_id long, text string",
    )
    orig = P.tbl
    P.tbl = lambda s, sfd, name: docs if name == "documents" else orig(s, sfd, name)
    try:
        rows = {r.stage: r for r in QUERIES["pipeline_dedup_cascade_report"](spark, "unused").collect()}
    finally:
        P.tbl = orig
    assert rows[1].n_removed == 1  # doc 3
    assert rows[2].n_removed == 1  # doc 5 (16-char prefix block)
    assert rows[3].n_in == 4


def test_emb_dim_stats_shape_and_bounds(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    rows = QUERIES["emb_dim_stats"](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    n_dims = len(emb.select("embedding").first().embedding)
    assert len(rows) == n_dims
    for r in rows:
        assert r.n == n_vecs  # every vector contributes every dim
        assert r.min_micro <= r.max_micro
        assert r.n * r.min_micro <= r.sum_micro <= r.n * r.max_micro
        assert 0 <= r.n_zero <= r.n


def test_user_cap_is_deterministic_and_capped(spark, sf_dir):
    from pyspark.sql import Window

    from kcl_akka_stream_spark.queries import QUERIES
    from kcl_akka_stream_spark.sources.batch import load_table

    a = {r.event_type: r for r in QUERIES["sample_user_cap"](spark, sf_dir).collect()}
    b = {r.event_type: r for r in QUERIES["sample_user_cap"](spark, sf_dir).collect()}
    for k in a:  # reproducible
        assert (a[k].n_kept, a[k].n_dropped) == (b[k].n_kept, b[k].n_dropped)
        assert a[k].n_kept + a[k].n_dropped == a[k].n_events
    # the cap binds: no user keeps more than 20 events, and every user
    # with <= 20 events keeps all of them
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy(
        F.md5(F.concat(F.lit("cap:"), F.col("event_id"))), "event_id"
    )
    kept_per_user = (
        ev.select("user_id", F.row_number().over(wu).alias("rk"))
        .groupBy("user_id")
        .agg(
            F.sum((F.col("rk") <= 20).cast("int")).alias("kept"),
            F.count(F.lit(1)).alias("total"),
        )
    )
    bad = kept_per_user.filter(
        (F.col("kept") > 20)
        | ((F.col("total") <= 20) & (F.col("kept") != F.col("total")))
    ).count()
    assert bad == 0
    assert sum(r.n_dropped for r in a.values()) > 0  # fixture has power users
