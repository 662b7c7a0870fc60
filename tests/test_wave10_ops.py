"""Round-8 wave-10 operators: multi-source BFS, vocab stats, quality funnel."""

import pytest
from pyspark.sql import functions as F


def test_bfs_distance_multi_source_min_hops(spark):
    from kcl_akka_stream_spark.operators.graph import bfs_distance

    # path 1-2-3-4-5 plus seed 10 attached to 4: distances are the MIN
    # over both sources
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    out = {r.node: r.dist for r in bfs_distance(edges, [1, 10], 3).collect()}
    assert out == {1: 0, 10: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_distance_rounds_bound_reach(spark):
    from kcl_akka_stream_spark.operators.graph import bfs_distance

    und = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    out = {r.node: r.dist for r in bfs_distance(edges, [1], 2).collect()}
    # node 4 is 3 hops away -> absent at rounds=2
    assert out == {1: 0, 2: 1, 3: 2}
    with pytest.raises(ValueError):
        bfs_distance(edges, [], 2)


def test_vocab_stats_counts_hapax_and_head_mass(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = {r.lang: r for r in QUERIES["text_vocab_stats"](spark, sf_dir).collect()}
    for lang, r in rows.items():
        assert 0 < r.n_vocab <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_vocab
        assert 0 < r.top100_mass_micro <= 1_000_000


def test_quality_funnel_is_monotone(spark, sf_dir):
    from kcl_akka_stream_spark.queries import QUERIES

    rows = sorted(
        QUERIES["pipeline_quality_funnel"](spark, sf_dir).collect(),
        key=lambda r: r.stage,
    )
    assert [r.stage_name for r in rows] == [
        "ingest",
        "length",
        "gopher",
        "exact_dedup",
    ]
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs <= a.n_docs
        assert b.n_tokens <= a.n_tokens
    assert rows[0].n_docs > 0
